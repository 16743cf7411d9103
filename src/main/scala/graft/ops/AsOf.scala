package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the single right row nearest in
  * event time, per key — backward (≤ left ts), forward (≥ left ts), or
  * nearest (either side, ties to backward).
  *
  * Spark has no native as-of join; the preference ladder (§7.3) says
  * compose built-ins before writing plan nodes, and the union+window trick
  * does exactly that:
  *
  *   1. tag both sides and union them (schema-harmonized, right payload
  *      null on left rows and vice versa);
  *   2. one window pass per key ordered by (ts, side) —
  *      `last(rightPayload, ignoreNulls)` over unbounded-preceding rows
  *      forwards the latest right payload onto every subsequent left row
  *      (right sorts before left on timestamp ties, so "at or before"
  *      includes equal timestamps). The forward direction runs the same
  *      pass over the REVERSED ordering; nearest runs both and picks the
  *      smaller time distance;
  *   3. keep left rows; optionally null out matches beyond `tolerance`.
  *
  * Cost: ONE shuffle on the key (same as any join) + a partition-local
  * sort per direction (nearest pays two sorts, still one shuffle) —
  * strictly better than the naive inequality join, which Spark plans as a
  * broadcast-nested-loop or cross product. Scales to arbitrary key
  * cardinality; within-key data only needs to fit a sort spill, not
  * memory.
  */
object AsOf {

  /** Backward as-of: greatest right ts ≤ left ts. See [[asofJoin]]. */
  def asofJoinBackward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None,
      rightTieBreak: Seq[String] = Nil,
  ): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, rightPayload,
      toleranceUs, rightTieBreak, "backward")

  /** Forward as-of: smallest right ts ≥ left ts. See [[asofJoin]]. */
  def asofJoinForward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None,
      rightTieBreak: Seq[String] = Nil,
  ): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, rightPayload,
      toleranceUs, rightTieBreak, "forward")

  /** Nearest as-of: whichever of backward/forward match is closer in
    * time; exact distance ties resolve to the backward match. See
    * [[asofJoin]].
    */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None,
      rightTieBreak: Seq[String] = Nil,
  ): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, rightPayload,
      toleranceUs, rightTieBreak, "nearest")

  /** @param leftTs/rightTs  event-time columns (same type both sides)
    * @param rightPayload    right columns to attach (null when no match)
    * @param toleranceUs     max allowed time distance in microseconds
    *                        (direction-appropriate sign; absolute for
    *                        nearest); matches beyond it are nulled out
    * @param rightTieBreak   right columns appended to the window ordering:
    *                        when several right rows share (key, rightTs),
    *                        the one greatest under this ordering wins (in
    *                        every direction). Without it the pick among
    *                        exact ties is plan-dependent — pass a unique
    *                        id for full determinism (the repo convention).
    * @param direction       "backward" | "forward" | "nearest"
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long],
      rightTieBreak: Seq[String],
      direction: String,
  ): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    val leftCols = left.columns.toSeq
    val reserved = Seq("__ts", "__side", "__r", "__mb", "__mf", "__m") ++
      rightTieBreak.indices.map(i => s"__tb$i")
    val outNames = (rightTs +: rightPayload).map("asof_" + _)
    require(!leftCols.exists(c => reserved.contains(c) || outNames.contains(c)),
      s"left columns collide with reserved/output names " +
        s"(${(reserved ++ outNames).mkString(", ")}): ${leftCols.mkString(", ")}")

    // The whole right row rides in ONE struct (its event time + payloads),
    // so last(ignoreNulls) — needed only to skip interleaved left rows,
    // whose struct is null — always forwards the MATCHED row atomically:
    // its own null payload fields stay null, and multiple payload columns
    // can never mix values from different right rows.
    require(!rightPayload.contains("__rts"), "rightPayload may not use the reserved name __rts")
    val rStructFields = struct(
      col(rightTs).as("__rts") +: rightPayload.map(c => col(c).as(c)): _*)
    val rStructType = right.select(rStructFields).schema.head.dataType

    // Tiebreak columns exist only on right rows (null on left — harmless:
    // __side already orders left after every same-ts right row).
    val tbTypes = rightTieBreak.map(c => right.schema(c).dataType)
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
      .select(Seq(col("__ts"), col("__side"), col("__r")) ++
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"__tb$i") } ++
        keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rTagged = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", rStructFields)
      .select(Seq(col("__ts"), col("__side"), col("__r")) ++
        rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tb$i") } ++
        keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val tbAsc = rightTieBreak.indices.map(i => col(s"__tb$i"))
    // backward scan: time ascending; right rows precede left on ties, so
    // "at or before" includes equal timestamps; last tie wins (greatest tb)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +: tbAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward scan: the SAME pass over time descending — right rows still
    // precede left within a tie (side asc), so "at or after" includes
    // equal timestamps, and the last row scanned is the closest ≥ ts;
    // tb asc keeps "greatest tiebreak wins" in this direction too
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc +: col("__side").asc +: tbAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val union = lTagged.unionByName(rTagged)
    val withMatches = direction match {
      case "backward" => union.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward"  => union.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wF))
      case "nearest" =>
        val db = unix_micros(col("__ts")) - unix_micros(col("__mb.__rts"))
        val df_ = unix_micros(col("__mf.__rts")) - unix_micros(col("__ts"))
        union
          .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
          .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wF))
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(db <= df_, col("__mb"))
              .otherwise(col("__mf")))
          .drop("__mb", "__mf")
    }

    val dist: Column = direction match {
      case "backward" => unix_micros(col("__ts")) - unix_micros(col("__m.__rts"))
      case "forward"  => unix_micros(col("__m.__rts")) - unix_micros(col("__ts"))
      case "nearest"  => abs(unix_micros(col("__m.__rts")) - unix_micros(col("__ts")))
    }
    val inTolerance: Column = toleranceUs match {
      case Some(t) => col("__m").isNotNull && dist <= t
      case None => col("__m").isNotNull
    }

    withMatches.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        Seq(when(inTolerance, col("__m.__rts")).otherwise(lit(null)).as(s"asof_$rightTs")) ++
        rightPayload.map(c => when(inTolerance, col(s"__m.$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
