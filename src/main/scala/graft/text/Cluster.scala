package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Guards

/** Integer-exact k-means clustering.
  *
  * [[graft.text.Similarity.ivfBuild]] already trains float k-means (via
  * Spark ML) for ANN cells, where bit-reproducibility doesn't matter —
  * any decent partition of the space works. This operator is the
  * AUDITABLE complement: Lloyd's algorithm over integer-component
  * vectors (e.g. globally quantized embeddings) with centroids kept ON
  * the integer lattice — each round's center is the per-dimension FLOOR
  * of the mean — so every assignment, every distance, and every center
  * is exact integer arithmetic that an independent engine can replay
  * bit-for-bit. That is what makes cluster-based curation decisions
  * (cluster-balanced sampling, semantic-dedup cells, mixture design)
  * reproducible across reruns, Spark versions, and engines — the same
  * determinism doctrine as the integer PageRank (ops/Graph.scala) and
  * the rational TF-IDF (text/Rank.scala).
  *
  * Scale shape: centers are k·d integers — driver-sized BY DEFINITION
  * (k is thousands at most) — so they are collected once per round and
  * re-broadcast as LITERALS: the assignment stage is a narrow
  * codegen-able map (no join, no shuffle, k lexicographic struct-min
  * comparisons per row). The center update is one posexplode +
  * (cluster, dim) aggregation with map-side partials — shuffle volume
  * is k·d per task, never corpus-sized. `iters` driver round-trips of
  * k·d integers each: the same bounded-driver contract as BPE training
  * (one winner row per round, text/Bpe.scala) and IVF (k centers).
  */
object Cluster {

  /** Run `iters` Lloyd rounds with k centers over `vecCol`
    * (`array` of integral type, all rows same length) and return
    * `(idCol, cluster int, dist long)` — the final assignment and its
    * squared distance to the assigned center.
    *
    * Deterministic contract (mirrored by the SQL oracle): initial
    * centers are the vectors of the k smallest ids (cluster = rank
    * order); assignment ties break toward the smaller cluster id;
    * centroid means floor toward -∞ (exactly: `(s - pmod(s, n)) div n`
    * — the subtraction makes the quotient exact, where truncating and
    * flooring division agree); a cluster that receives no points keeps
    * its previous center.
    */
  def kmeansInt(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): DataFrame =
    kmeansIntWithCenters(df, idCol, vecCol, k, iters)._1

  /** [[kmeansInt]] plus the final centers (exposed for tests and for
    * center-reusing callers like cluster-balanced samplers).
    */
  private[graft] def kmeansIntWithCenters(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, IndexedSeq[Seq[Long]]) = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 0, "iters must be >= 0")
    Guards.requireNoReservedNames(df, Seq("cluster", "dist"), "kmeansInt")

    // Freeze the (id, vector) projection once: it is re-read every round
    // plus once for the final assignment. localCheckpoint at bench scale;
    // a 100 TB run persists to executor storage instead — same contract
    // (stable input, no lineage re-execution).
    val base = df
      .select(col(idCol).as("__km_id"), col(vecCol).cast("array<long>").as("__km_v"))
      .filter(col("__km_v").isNotNull)
      .localCheckpoint(true)

    val init = base.orderBy(col("__km_id")).limit(k).collect()
    require(init.length == k, s"kmeansInt needs at least k=$k non-null vectors, got ${init.length}")
    var centers: IndexedSeq[Seq[Long]] = init.map(_.getSeq[Long](1)).toIndexedSeq

    // Squared distance to a literal center, then lexicographic struct-min
    // over (dist, cluster): exact integers, ties to the smaller cluster.
    def distTo(c: Seq[Long]): Column =
      aggregate(
        zip_with(col("__km_v"), typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    def best: Column =
      centers.zipWithIndex.map { case (c, i) =>
        struct(distTo(c).as("d"), lit(i).as("c"))
      }.reduce(least(_, _))

    var round = 0
    while (round < iters) {
      val updated = base
        .withColumn("__km_c", best.getField("c"))
        .select(col("__km_c"), posexplode(col("__km_v")).as(Seq("__km_p", "__km_x")))
        .groupBy(col("__km_c"), col("__km_p"))
        .agg(sum(col("__km_x")).as("s"), count(lit(1)).as("n"))
        // exact floor division on the lattice: s - pmod(s, n) is
        // divisible by n, so `div` is exact and equals floor(s/n) even
        // for negative sums (DuckDB's `//` floors, `div` truncates —
        // they agree on exact quotients)
        .withColumn("m", expr("(s - pmod(s, n)) div n"))
        .groupBy(col("__km_c"))
        .agg(transform(
          array_sort(collect_list(struct(col("__km_p").as("p"), col("m").as("m")))),
          s => s.getField("m")).as("c"))
        .collect()
      val byCluster = updated.map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      centers = (0 until k).map(i => byCluster.getOrElse(i, centers(i)))
      round += 1
    }

    val out = base.select(
      col("__km_id").as(idCol),
      best.getField("c").as("cluster"),
      best.getField("d").as("dist"))
    (out, centers)
  }

  /** Davies-Bouldin index over a trained [[kmeansInt]] clustering — the
    * internal "are these clusters compact and well separated?" score
    * (lower is better): per cluster the mean point-to-center distance
    * s_i, per pair the center distance d_ij, and
    *
    *   DB = (1/k) Σ_i max_{j≠i} (s_i + s_j) / d_ij
    *
    * Clusters that received no points (or whose every partner sits at
    * d_ij = 0) drop from the average; k reports the clusters actually
    * scored.
    *
    * Determinism: per-point √dist² nano-quantizes before the cluster
    * mean (exact integer sums); d_ij comes from the SAME integer
    * lattice centers the oracle retrains, so each ratio is a fixed IEEE
    * tree; the final k-term average quantizes each max to nanos first.
    *
    * Scale shape: the [[kmeansInt]] training chain plus ONE
    * cluster-keyed aggregation over the assignment; the k×k pair table
    * is driver literals (k·d ints — driver-sized by definition).
    *
    * @return 1 row (k, db_index)
    */
  def daviesBouldin(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int): DataFrame = {
    val (assign, centers) = kmeansIntWithCenters(df, idCol, vecCol, k, iters)
    val spark = df.sparkSession
    import spark.implicits._
    val si = assign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(round(sqrt(col("dist").cast("double")) * lit(1e9), 0).cast("long"))
          .as("sd"))
    val pairs = for {
      i <- 0 until k
      j <- 0 until k
      if i != j
    } yield {
      val d2 = centers(i).zip(centers(j)).map { case (a, b) =>
        val d = a - b; d * d
      }.sum
      (i, j, math.sqrt(d2.toDouble))
    }
    val pdf = pairs.toDF("i", "j", "dij").filter(col("dij") > 0.0)
    val sMean = (p: String) =>
      col(s"sd_$p").cast("double") / col(s"n_$p").cast("double") / lit(1e9)
    val r = pdf
      .join(si.select(col("cluster").as("i"), col("n").as("n_i"), col("sd").as("sd_i")), Seq("i"))
      .join(si.select(col("cluster").as("j"), col("n").as("n_j"), col("sd").as("sd_j")), Seq("j"))
      .groupBy(col("i"))
      .agg(max((sMean("i") + sMean("j")) / col("dij")).as("ri"))
    r.agg(count(lit(1)).as("k"),
        sum(round(col("ri") * lit(1e9), 0).cast("long")).as("__s"))
      .select(col("k"),
        round(col("__s").cast("double") / col("k").cast("double") / lit(1e9), 6)
          .as("db_index"))
  }

  /** Centroid silhouette over a trained [[kmeansInt]] clustering — the
    * per-point "am I closer to my own center than to the next one?"
    * summary (the classic silhouette's pairwise a/b replaced by
    * center distances — the scalable variant, stated):
    *
    *   s(x) = (b − a) / max(a, b),   a = ‖x − c_own‖, b = min_{j≠own} ‖x − c_j‖
    *
    * Returned per cluster: `(cluster, n, mean_silhouette)` plus the
    * point count; points with max(a,b) = 0 (degenerate duplicate
    * centers) score 0.
    *
    * Determinism: a and b come from the same integer lattice distances
    * the assignment used (b via a second lexicographic struct-min with
    * the own cluster excluded); per-point s nano-quantizes before the
    * cluster mean.
    *
    * Scale shape: the [[kmeansInt]] chain plus one narrow per-row
    * projection against literal centers and one cluster-keyed
    * aggregation — silhouette at 100 TB rides the assignment scan.
    */
  def centroidSilhouette(df: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int): DataFrame = {
    require(k >= 2, "silhouette needs at least two clusters")
    val (_, centers) = kmeansIntWithCenters(df, idCol, vecCol, k, iters)
    val base = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<long>").as("__v"))
      .filter(col("__v").isNotNull)
    def distTo(c: Seq[Long]): Column =
      aggregate(
        zip_with(col("__v"), typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    val best: Column =
      centers.zipWithIndex.map { case (c, i) =>
        struct(distTo(c).as("d"), lit(i).as("c"))
      }.reduce(least(_, _))
    val assigned = base
      .withColumn("__own", best.getField("c"))
      .withColumn("__a2", best.getField("d"))
    val second: Column =
      centers.zipWithIndex.map { case (c, i) =>
        when(col("__own") =!= i, struct(distTo(c).as("d"), lit(i).as("c")))
      }.reduce((x, y) => least(x, y)) // nulls lose in least
    val withB = assigned.withColumn("__b2", second.getField("d"))
    val a = sqrt(col("__a2").cast("double"))
    val b = sqrt(col("__b2").cast("double"))
    val s = when(greatest(a, b) > 0.0, (b - a) / greatest(a, b)).otherwise(lit(0.0))
    withB
      .withColumn("__sq", round(s * lit(1e9), 0).cast("long"))
      .groupBy(col("__own").as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("__sq")).as("__ss"))
      .select(col("cluster"), col("n"),
        round(col("__ss").cast("double") / col("n").cast("double") / lit(1e9), 6)
          .as("mean_silhouette"))
  }
}
