package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketches — the distinct-count/overlap sketch
  * family HLL can't serve: two KMV sketches INTERSECT (Beyer et al.
  * 2007, "On synopses for distinct-value estimation under multiset
  * operations"), so corpus-pair vocabulary overlap — the dedup-planning
  * question [[Drift.vocabularyOverlap]] answers exactly with a
  * token-keyed self-join — gets a bounded-sketch scale path with
  * measurable error.
  *
  * Hashing follows the repo's md5-60-bit convention (first 15 hex chars
  * → long in [0, 2^60)), NOT xxhash64 — so every sketch, threshold and
  * estimate replays bit-for-bit in a SQL oracle; nothing here is
  * rows-only.
  *
  * Scale shape: everything reduces to the DISTINCT (group, hash) layer
  * in one map-combined aggregation; the k-smallest selection is a
  * group-partitioned rank window over that layer; all pairwise work
  * runs on k-row-per-group sketch tables (k·|groups| rows total,
  * data-size-independent).
  */
object Kmv {

  val HashSpace: Double = math.pow(2.0, 60)

  /** 60-bit md5 hash of a key under a seed — [0, 2^60), oracle
    * spelling `CAST(('0x' || substr(md5(seed || ':' || key), 1, 15)) AS BIGINT)`.
    */
  def hash60(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Per-group distinct-count estimate from the k smallest hashes:
    * est = (k−1) / (h_(k) / 2^60), exact when the group has fewer than
    * k distinct values. Returns
    * `(groups..., n_distinct, k_used, kth_hash, est, rel_err)` —
    * n_distinct (the exact answer) and rel_err ride along because they
    * fall out of the same distinct layer; at corpus scale the caller
    * drops them and keeps the sketch columns.
    */
  def kmvDistinct(df: DataFrame, groupBy: Seq[String], key: Column,
                  k: Int = 256, seed: String = "kmv"): DataFrame = {
    require(groupBy.nonEmpty, "kmvDistinct needs group keys")
    require(k >= 16, s"k too small for a stable estimate: $k")
    val gCols = groupBy.map(col)
    val d = df.select(gCols :+ hash60(key, seed).as("__h"): _*)
      .filter(col("__h").isNotNull).distinct()
    val W = Window.partitionBy(gCols: _*)
    val ranked = d.select(gCols :+ col("__h")
      :+ row_number().over(W.orderBy(col("__h"))).as("__r")
      :+ count(lit(1)).over(W).as("__n"): _*)
    val kth = ranked.filter(col("__r") === least(lit(k.toLong), col("__n")))
    val est = when(col("__n") < k, col("__n").cast("double"))
      .otherwise(lit((k - 1).toDouble) / (col("__h").cast("double") / lit(HashSpace)))
    kth.select(gCols ++ Seq(
      col("__n").as("n_distinct"),
      least(lit(k.toLong), col("__n")).as("k_used"),
      col("__h").as("kth_hash"),
      round(est, 6).as("est"),
      round(abs(est - col("__n").cast("double")) / col("__n").cast("double"), 6)
        .as("rel_err")): _*)
  }

  /** Pairwise Jaccard estimate from per-group KMV sketches: for groups
    * a < b, merge the two k-min sketches, take the k smallest of the
    * union as threshold θ = h_(k) (or the max when the union is
    * smaller), and estimate J = |{h ≤ θ in BOTH sketches}| / |{h ≤ θ}|.
    * Returns `(group_a, group_b, n_theta, n_both, jaccard_est)`.
    *
    * The pair stage touches ONLY sketch rows (≤ k per group) — the
    * corpus-sized token self-join of the exact operator never happens.
    */
  def kmvJaccard(df: DataFrame, groupCol: String, key: Column,
                 k: Int = 256, seed: String = "kmv"): DataFrame = {
    require(k >= 16, s"k too small for a stable estimate: $k")
    val d = df.select(col(groupCol).as("__g"), hash60(key, seed).as("__h"))
      .filter(col("__h").isNotNull && col("__g").isNotNull).distinct()
    val Wg = Window.partitionBy(col("__g"))
    // groups×k-bounded by construction and read three times (both join
    // sides + the pair spine): materialize once so the corpus-sized
    // distinct+rank underneath never replays per reference
    val sketch = d
      .withColumn("__r", row_number().over(Wg.orderBy(col("__h"))))
      .filter(col("__r") <= k)
      .select(col("__g"), col("__h"))
      .localCheckpoint()
    val a = sketch.toDF("__ga", "__h")
    val b = sketch.toDF("__gb", "__h")
    // (a, b) pair spine WITHOUT a cross join: the group list collects in
    // ONE grand aggregate (group-count-bounded, the k-means-centers
    // boundedness class) and explodes twice — generator fanout, so the
    // registry guard sees no nested-loop join anywhere
    val pairs = sketch.select(col("__g")).distinct()
      .agg(collect_set(col("__g")).as("__gs"))
      .select(explode(col("__gs")).as("__ga"), col("__gs"))
      .select(col("__ga"), explode(col("__gs")).as("__gb"))
      .filter(col("__ga") < col("__gb"))
    // per pair, every hash present in either sketch with a membership
    // count (2 = in both) — the k-smallest of this union sets θ
    val u = pairs.join(a, Seq("__ga")).select(col("__ga"), col("__gb"), col("__h"))
      .unionByName(pairs.join(b, Seq("__gb")).select(col("__ga"), col("__gb"), col("__h")))
      .groupBy(col("__ga"), col("__gb"), col("__h"))
      .agg(count(lit(1)).as("__cnt"))
    val Wp = Window.partitionBy(col("__ga"), col("__gb"))
    val rankedU = u
      .withColumn("__r", row_number().over(Wp.orderBy(col("__h"))))
      .withColumn("__nu", count(lit(1)).over(Wp))
      .filter(col("__r") <= least(lit(k.toLong), col("__nu")))
    rankedU.groupBy(col("__ga"), col("__gb"))
      .agg(count(lit(1)).as("n_theta"),
        sum(when(col("__cnt") === 2, 1L).otherwise(0L)).as("n_both"))
      .select(col("__ga").as("group_a"), col("__gb").as("group_b"),
        col("n_theta"), col("n_both"),
        round(col("n_both").cast("double") / col("n_theta").cast("double"), 6)
          .as("jaccard_est"))
  }
}
