package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by the bit-interleaving of several key columns makes
  * every file/row-group cover a small hyper-rectangle of the key space,
  * so parquet min/max statistics prune scans on ANY of the interleaved
  * columns — the standard layout answer when a 100 TB fact table is
  * filtered sometimes by one key, sometimes by another, and a single
  * sort column would only serve the first predicate.
  *
  * Not in the reference; engine extension (SURVEY §2.11). The curve
  * value is a static chain of shift/mask/or terms — whole-stage-codegen
  * integer arithmetic, no UDF — and the write is one range repartition
  * (the same shuffle a plain global sort would pay).
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of each column —
    * column k's bit i lands at output position `i * n + k`. Inputs must
    * be non-negative and < 2^bits (see [[gridCoord]]); `bits * n` must
    * fit a long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * columns must fit a long, got $bits × ${cols.size}")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Quantize a numeric column onto the `[0, 2^bits)` grid over
    * `[lo, hi]`, clamping outliers — the front door for z-ordering
    * continuous keys.
    */
  def gridCoord(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val cells = (1L << bits).toDouble
    least(greatest(floor((c.cast("double") - lo) / (hi - lo) * cells), lit(0.0)),
      lit(cells - 1.0)).cast("long")
  }

  /** Write `df` as parquet clustered on the z-curve of `cols`: one range
    * repartition on the curve value plus an in-partition sort, so each
    * output file covers a contiguous z-range — a bounded rectangle in
    * every interleaved dimension. `numFiles` sizes the layout (match
    * target file size at the data's scale).
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 16, numFiles: Int = 0): Unit = {
    val z = zValue(cols.map(col), bits)
    val wide = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) wide.repartitionByRange(numFiles, col("__z"))
      else wide.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
