package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline observability: attach named aggregate metrics to a
  * DataFrame that are computed DURING the next action on it — no second
  * scan, no `.count()` side queries. At 100 TB a separate validation
  * pass doubles the I/O bill; `CollectMetrics` rides the existing job.
  *
  * Wraps Spark's `Observation` API (engine extension, SURVEY §2.11); the
  * reference's validation surface (`config/validation.py`) runs eager
  * separate queries instead — correct on pandas, unaffordable at scale.
  */
object Observe {

  /** Attach `metrics` (aggregate expressions) under `name`; read them
    * from the returned [[Observation]] AFTER the frame's next action
    * completes (`observation.get` blocks until then).
    */
  def observed(df: DataFrame, name: String, metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one metric expression")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Standard data-quality bundle for a set of columns: row count plus
    * per-column null counts — the checks a load job should always ship.
    */
  def qualityMetrics(df: DataFrame, cols: Seq[String],
                     name: String = "quality"): (DataFrame, Observation) =
    observed(df, name,
      count(lit(1)).as("n_rows") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")))

  /** Order-independent content checksum of `cols` — the migration /
    * replication audit primitive: two copies of a dataset produce the
    * SAME (n_rows, xor60, sum60) triple regardless of row order, file
    * layout, partition count, or engine, so "did the copy lose or
    * mangle rows" is one aggregate pass per side and a 3-value compare
    * (never a sorted row-by-row diff).
    *
    * Per row: columns canonicalize to strings (null → a \u0002 sentinel
    * so (null, "a") ≠ ("a", null) ≠ ("\u0002a")), join on \u0001, md5,
    * keep 60 bits. The triple combines XOR (order-free, catches value
    * changes; blind to duplicate-pair swaps) with a modular SUM and the
    * row count (which catch duplication/loss XOR misses). The sum
    * accumulates as exact DECIMAL(38,0) then emits `sum mod 2^62` as
    * BIGINT — still order-independent, and a lost/duplicated row shifts
    * the residue exactly as it shifts the full sum; the residue is what
    * hashes stably across engines (raw wide-decimal output columns do
    * not). One narrow map + one map-combined aggregate — no shuffle
    * beyond the 1-row final combine.
    *
    * Contract: `cols` must be integer/string/date-typed — float→string
    * rendering is engine-specific, so pre-quantize doubles (e.g.
    * `round(x·100)::long`, the q_corr convention).
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val canon = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val h = conv(substring(md5(canon.cast("binary")), 1, 15), 16, 10).cast("long")
    df.select(h.as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor60"),
        // __h ≥ 0 (60-bit), so the decimal sum is non-negative and % ≡ pmod
        (sum(col("__h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          % lit(4611686018427387904L)).cast("long").as("sum60"))
  }
}
