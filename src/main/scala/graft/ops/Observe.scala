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
}
