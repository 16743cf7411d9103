package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) is the
  * first line of defense and needs no code. These helpers cover the cases
  * AQE does not: aggregation skew (one group key holding a large fraction
  * of all rows lands on one task) and broadcast-incompatible skewed joins.
  *
  * Salting trades one extra (cheap, well-distributed) shuffle stage for
  * bounded per-task input — the standard answer once a single key's rows
  * exceed what one executor core should hold. At 100 TB, run the partial
  * phase at `saltBuckets ≈ clusterCores / distinctHeavyKeys`.
  */
object Skew {

  /** Attach a uniform salt in [0, saltBuckets). Deterministic given the
    * row's partition layout (hash of a per-row id), which is all salting
    * needs — the salt only routes rows, it never reaches results.
    */
  def withSalt(df: DataFrame, saltBuckets: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), final
    * combine on keys. `partial` aggregates must be algebraic (sum, count,
    * min, max, or any merge-able partial) and `combine` reduces the partial
    * columns by name.
    *
    * Example — skew-proof sum+count:
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 16,
    *   partial = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
    *   combine = Seq(sum("ps").as("sum_v"), sum("pc").as("n")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    withSalt(df, saltBuckets)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)

  /** Skewed join: salt the big (skewed) side, replicate the small side
    * across all salt values, join on keys + salt. Works for inner/left
    * joins where the small side fits `saltBuckets`-fold replication —
    * the explicit alternative when the small side is too big to broadcast
    * but the key histogram is too skewed for a plain shuffle join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = withSalt(big, saltBuckets)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-skew diagnosis: ONE row summarizing whether a planned
    * groupBy/join key needs mitigation — run this BEFORE choosing
    * between a plain shuffle, AQE, and the salted forms above.
    *
    * Returns `(n_rows, n_keys, max_key_rows, top_key, skew_ratio,
    * recommended_salt)` where `skew_ratio = max_key_rows / mean` (1.0 =
    * perfectly uniform) and `recommended_salt` sizes
    * [[saltedAggregate]]'s buckets so the heaviest key splits to roughly
    * the mean (0 = no salting needed below the `threshold` ratio).
    *
    * Cost: the same single map-combined count shuffle the real
    * aggregation would pay, then a key-count-sized rollup — cheap
    * enough to run as a planning probe on a sample or the full data.
    */
  def keySkewReport(df: DataFrame, keys: Seq[String], threshold: Double = 4.0): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(threshold >= 1.0, s"threshold is a ratio >= 1: $threshold")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__kn"))
    counts.agg(
        sum(col("__kn")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__kn")).as("max_key_rows"),
        // tiebreak on the key string itself: max_by on the count alone
        // is run-dependent when two keys tie for max (bit-determinism
        // doctrine — every op here breaks ties explicitly). struct
        // ordering compares __kn first, then key lexicographically, so
        // the winner is the lexicographically-last key among max-count.
        max_by(concat_ws("|", keys.map(col(_).cast("string")): _*),
          struct(col("__kn"),
            concat_ws("|", keys.map(col(_).cast("string")): _*))).as("top_key"),
      )
      .withColumn("skew_ratio",
        col("max_key_rows").cast("double") / (col("n_rows").cast("double") / col("n_keys")))
      .withColumn("recommended_salt",
        when(col("skew_ratio") > threshold, ceil(col("skew_ratio")).cast("int"))
          .otherwise(lit(0)))
  }
}
