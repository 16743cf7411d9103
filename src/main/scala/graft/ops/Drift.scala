package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two dataset slices — the
  * monitoring step that catches a feature or corpus-statistic shift
  * between a reference snapshot (training corpus, last week's crawl) and
  * a current one before the shift poisons downstream training.
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  *
  * Scale design: each side collapses to per-bin counts with one
  * map-side-combined aggregation over EXPLICIT cutpoints (no
  * distributed quantile job hiding inside a metric — pair with
  * [[Binning.cutpoints]] or [[Profile]] sketches to derive cuts once,
  * offline). The join/window after aggregation touches `bins + 1` rows,
  * so the single-partition window there is bounded by the bin count,
  * never by data size.
  */
object Drift {

  /** Bin index for a value against ascending cutpoints: number of cuts
    * `<=` the value, i.e. 0 for v < cuts(0), `cuts.size` for
    * v >= cuts.last. Null values get bin null (excluded by [[psi]]).
    */
  def binIndex(value: Column, cutpoints: Seq[Double]): Column = {
    require(cutpoints.nonEmpty && cutpoints == cutpoints.sorted,
      "cutpoints must be non-empty and ascending")
    // Codegen-friendly HOF over a literal array — no UDF, no shuffle.
    // The isNotNull guard delivers the documented null bin: the HOF's
    // null-predicate elements would otherwise silently land in bin 0.
    when(value.isNotNull, size(filter(array(cutpoints.map(lit): _*), c => value >= c)))
  }

  /** Population Stability Index between `ref` and `cur` on `valueCol`.
    *
    * Returns one row per bin: raw counts, Laplace-smoothed proportions
    * (`(n + eps) / (total + eps * nBins)` — empty bins never divide by
    * zero), and the bin's PSI term `(cur_p - ref_p) * ln(cur_p / ref_p)`.
    * Total PSI = sum of `psi_term` (rule of thumb: < 0.1 stable,
    * > 0.25 drifted). Null values are excluded from both sides.
    *
    * Every bin in [0, cutpoints.size] is present in the output even if
    * empty on both sides, so reports align across runs.
    */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      cutpoints: Seq[Double],
      eps: Double = 0.5,
  ): DataFrame = {
    require(eps > 0, "eps must be positive (it guards the log)")
    val nBins = cutpoints.size + 1
    def sideCounts(df: DataFrame, alias: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(binIndex(col(valueCol), cutpoints).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(alias))
    val spark = ref.sparkSession
    val allBins = spark.range(nBins).select(col("id").cast("int").as("bin"))
    val joined = allBins
      .join(sideCounts(ref, "ref_n"), Seq("bin"), "left")
      .join(sideCounts(cur, "cur_n"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    // Post-aggregation: at most nBins rows — the whole-frame window here
    // is bounded by the bin count, not the data.
    val w = Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val refP = (col("ref_n") + eps) / (sum(col("ref_n")).over(w) + eps * nBins)
    val curP = (col("cur_n") + eps) / (sum(col("cur_n")).over(w) + eps * nBins)
    joined
      .withColumn("ref_p", refP)
      .withColumn("cur_p", curP)
      .withColumn("psi_term", (col("cur_p") - col("ref_p")) * log(col("cur_p") / col("ref_p")))
      .orderBy("bin")
  }
}
