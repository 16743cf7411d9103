package graft.ops

import org.apache.spark.sql.SparkSession

/** Size-probed broadcast decisions for operators that would otherwise
  * hard-code a `broadcast()` hint. A hint that is right at test scale
  * and wrong at 100× is a scale bug: broadcasting node-sized or
  * survivor-sized state OOMs the driver once the state outgrows memory.
  * These helpers make the decision from a row-count probe against the
  * session's `spark.sql.autoBroadcastJoinThreshold`, so the same call
  * degrades to a co-partitioned shuffle join automatically — the
  * operator's semantics never change, only its physical join side.
  *
  * PREFER HINT-FREE JOINS where a single query's AQE can decide: inside
  * one query, AQE already measures the real shuffle size and converts to
  * broadcast with no probe job and no estimate (see cooccurrenceLift,
  * Outliers, repeatedSpans, encodeTokenCounts — all moved off this
  * helper). A probe earns its extra job only for STRUCTURAL choices AQE
  * cannot make — e.g. [[Graph.pageRank]] decides ONCE, before its loop,
  * between per-iteration broadcast and pre-partitioning the frozen edge
  * list, a layout decision spanning five separate queries.
  */
object Hints {

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = disabled). */
  def broadcastThresholdBytes(spark: SparkSession): Long =
    spark.sessionState.conf.autoBroadcastJoinThreshold

  /** Whether `rows` rows at ~`rowBytes` estimated bytes each fit under
    * the session's broadcast threshold. Disabled threshold (<= 0) means
    * never broadcast — the caller's shuffle path must stand on its own.
    */
  def fitsBroadcast(spark: SparkSession, rows: Long, rowBytes: Long): Boolean = {
    require(rowBytes > 0, s"rowBytes must be positive: $rowBytes")
    val thr = broadcastThresholdBytes(spark)
    thr > 0 && rows >= 0 && rows <= thr / rowBytes
  }
}
