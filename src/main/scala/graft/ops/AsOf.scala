package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single right row
  * with the greatest timestamp ≤ the left timestamp, per key.
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
  *      includes equal timestamps);
  *   3. keep left rows; optionally null out matches older than `tolerance`.
  *
  * Cost: ONE shuffle on the key (same as any join) + a partition-local
  * sort — strictly better than the naive inequality join, which Spark
  * plans as a broadcast-nested-loop or cross product. Scales to arbitrary
  * key cardinality; within-key data only needs to fit a sort spill, not
  * memory.
  */
object AsOf {

  /** @param leftTs/rightTs  event-time columns (same type both sides)
    * @param rightPayload    right columns to attach (null when no match)
    * @param toleranceUs     max allowed (leftTs - rightTs) in microseconds;
    *                        matches older than this are nulled out
    * @param rightTieBreak   right columns appended to the window ordering:
    *                        when several right rows share (key, rightTs),
    *                        the one greatest under this ordering wins.
    *                        Without it the pick among exact ties is
    *                        plan-dependent — pass a unique id for full
    *                        determinism (the repo convention).
    */
  def asofJoinBackward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None,
      rightTieBreak: Seq[String] = Nil,
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__ts", "__side", "__r", "__m") ++
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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts") +: col("__side") +:
        rightTieBreak.indices.map(i => col(s"__tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val inTolerance: Column = toleranceUs match {
      case Some(t) => col("__m").isNotNull &&
        (unix_micros(col("__ts")) - unix_micros(col("__m.__rts"))) <= t
      case None => col("__m").isNotNull
    }

    filled.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        Seq(when(inTolerance, col("__m.__rts")).otherwise(lit(null)).as(s"asof_$rightTs")) ++
        rightPayload.map(c => when(inTolerance, col(s"__m.$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
