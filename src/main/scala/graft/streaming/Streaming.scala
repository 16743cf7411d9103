package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time windowing helpers, usable identically on batch DataFrames and
  * Structured Streaming inputs (the expressions are the same logical plan
  * nodes; streaming adds watermark-driven state eviction).
  *
  * The reference library is batch-only (SURVEY §2.9) — this module is part
  * of the engine's forward surface: `readStream → transform → writeStream`
  * with these helpers in the transform seat. See StreamingSpec for the
  * MemoryStream-driven streaming execution of the same aggregations.
  *
  * Scale notes: windowed aggregations shuffle on (window, keys); watermarks
  * bound state size — always set one on unbounded streams. Sliding windows
  * multiply input by windows-per-event (duration/slide); prefer tumbling +
  * rollup downstream when the ratio is large.
  */
object Streaming {

  /** Tumbling event-time window aggregation. */
  def tumblingAgg(df: DataFrame, tsCol: String, duration: String,
                  keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window aggregation (each event lands in
    * duration/slide windows).
    */
  def slidingAgg(df: DataFrame, tsCol: String, duration: String, slide: String,
                 keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-based session window aggregation (native session_window: windows
    * merge while consecutive events are closer than `gap`).
    */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Watermarked streaming variant: bounds aggregation state to windows
    * newer than max(event time) - delay. No-op semantics change on batch.
    */
  def watermarked(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Custom-state example: per-key running counts kept in `GroupState`
    * across micro-batches (`mapGroupsWithState`). The state store shuffles
    * once on the key and persists per-partition — the pattern to extend
    * for custom sessionization, dedup-with-TTL, or CDC upserts.
    */
  def runningCounts(df: DataFrame, keyCol: String): Dataset[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[String], state: GroupState[Long]) =>
          val newCount = state.getOption.getOrElse(0L) + values.size
          state.update(newCount)
          (key, newCount)
      }
  }
}
