package graft.ops

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** Named-stage pipeline composition with timing — the engine-side analog
  * of the reference's pipeline conventions (ons_utils is a library FOR
  * cprices ETL pipelines; config/config.py:225-304 LoggingConfig carries
  * the run-id/log plumbing).
  *
  * Stages are `DataFrame => DataFrame`, composed lazily exactly like
  * `Dataset.transform` (P5): by default nothing executes until the caller
  * acts on the result — stage "timings" then measure plan construction
  * only. `materializeEach = true` forces an action (count) per stage for
  * debugging/row-accounting runs; never leave it on in production paths
  * (each count re-executes the lineage unless stages cache).
  */
object Pipeline {

  private val log = LoggerFactory.getLogger(getClass)

  final case class StageReport(name: String, seconds: Double, rows: Option[Long])

  def run(input: DataFrame, stages: Seq[(String, DataFrame => DataFrame)],
          materializeEach: Boolean = false): (DataFrame, Seq[StageReport]) = {
    val reports = Seq.newBuilder[StageReport]
    val out = stages.foldLeft(input) { case (df, (name, f)) =>
      val t0 = System.nanoTime()
      val next = f(df)
      val rows = if (materializeEach) Some(next.count()) else None
      val secs = (System.nanoTime() - t0) / 1e9
      log.info(f"pipeline stage '$name' ${if (materializeEach) "ran" else "composed"} in $secs%.3fs" +
        rows.fold("")(r => s", $r rows"))
      reports += StageReport(name, secs, rows)
      next
    }
    (out, reports.result())
  }
}
