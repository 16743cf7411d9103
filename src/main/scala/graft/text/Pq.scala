package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") over integer-lattice embeddings: split each
  * d-dim vector into `m` contiguous subvectors, train an integer k-means
  * codebook per subspace ([[Cluster.kmeansIntWithCenters]] — the
  * auditable Lloyd variant), and represent every vector by its `m`
  * nearest-code ids. Approximate distances are computed asymmetrically
  * (ADC): the query keeps its exact subvectors, each scored against the
  * codebook once, and a corpus vector's distance is the sum of `m`
  * table lookups.
  *
  * This completes the ANN family (brute / LSH-bucketed / IVF): PQ is the
  * MEMORY scale path — a 64-dim float vector becomes `m` small ints, a
  * 32× compression at m=2/k=8, and the ADC scan never touches the
  * original vectors. Because codebooks live on the integer lattice and
  * every distance is exact integer arithmetic, the whole index — training
  * rounds, code assignments, ADC scores, the final top-k — replays
  * bit-for-bit in an independent engine: a lossy index with a lossless
  * audit trail.
  *
  * Scale shape: training touches only subvector slices (m bounded driver
  * round-trips of k·(d/m) integers, the [[Cluster]] contract); encoding
  * is ONE narrow codegen'd projection (codebooks are literals — no join);
  * the ADC scan is a hint-free equi-join of exploded codes against the
  * queries×m×k LUT (AQE broadcasts the bounded LUT side), one
  * map-combined (query, neighbor) aggregation, and a per-query
  * WindowGroupLimit top-k. At IVF-style corpus sizes, restrict the scan
  * with [[Similarity]] cells first — PQ composes as the residual scorer.
  */
object Pq {

  /** Squared L2 distance from an integer-array column to a literal
    * center — exact long arithmetic, codegen'd.
    */
  private def d2(v: Column, c: Seq[Long]): Column =
    aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Train `m` per-subspace codebooks of `k` codes each over `vecCol`
    * (array of integral type, fixed length `d`, `d % m == 0`). Returns
    * `codebooks(s)(code) = center` with `d/m` components each.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, d: Int,
            m: Int, k: Int, iters: Int): IndexedSeq[IndexedSeq[Seq[Long]]] = {
    require(m >= 1 && d % m == 0, s"vector dim $d must split evenly into $m subspaces")
    val sub = d / m
    (0 until m).map { s =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol).cast("array<long>"), s * sub + 1, sub).as("__pq_v"))
      Cluster.kmeansIntWithCenters(sliced, idCol, "__pq_v", k, iters)._2
    }.toIndexedSeq
  }

  /** The `m` code ids for one vector as an `array<int>` — a single
    * narrow projection against literal codebooks (no join, no shuffle).
    * Assignment ties break toward the smaller code id, the
    * [[Cluster.kmeansInt]] rule.
    */
  def encodeCodes(vec: Column, codebooks: IndexedSeq[IndexedSeq[Seq[Long]]]): Column = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    array((0 until m).map { s =>
      ArrayMath.bound(slice(vec.cast("array<long>"), s * sub + 1, sub)) { sv =>
        codebooks(s).zipWithIndex
          .map { case (c, i) => struct(d2(sv, c).as("d"), lit(i).as("c")) }
          .reduce(least(_, _))
          .getField("c")
      }
    }: _*)
  }

  /** ADC top-k: for every query row, the `topK` corpus ids with the
    * smallest summed code-to-query subspace distances (ties to the
    * smaller neighbor id). `(query_id, neighbor_id, approx_d2, rank)`.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, codebooks: IndexedSeq[IndexedSeq[Seq[Long]]],
              topK: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      posexplode(encodeCodes(col(vecCol), codebooks)).as(Seq("__s", "__code")))
    // LUT: queries × m × k exact subspace distances — bounded by
    // construction, so AQE broadcasts it under the hint-free doctrine
    val lut = queries
      .select(col(idCol).as("query_id"),
        posexplode(array((0 until m).map { s =>
          ArrayMath.bound(slice(col(vecCol).cast("array<long>"), s * sub + 1, sub)) { sv =>
            array(codebooks(s).map(c => d2(sv, c)): _*)
          }
        }: _*)).as(Seq("__s", "__d2s")))
      .select(col("query_id"), col("__s"),
        posexplode(col("__d2s")).as(Seq("__code", "__d2")))
    val scored = codes.join(lut, Seq("__s", "__code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__d2")).as("approx_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }
}
