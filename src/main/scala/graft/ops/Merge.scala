package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot merge (upsert): apply a batch of updates/inserts to a base
  * snapshot with last-wins semantics — the incremental-ingest primitive a
  * training-data pipeline needs to fold daily crawl deltas into a corpus
  * without rewriting history row-by-row.
  *
  * Not in the reference (whose concat, SURVEY §2.6, is append-only);
  * engine extension (SURVEY §2.11).
  *
  * Scale design: one hash shuffle on the merge keys (union is
  * partition-local; the window and the dedup ride the same exchange).
  * For a corpus stored bucketed on the merge keys
  * ([[graft.sources.Sources.writeBucketed]]) even that shuffle is only
  * over the (small) delta side. No driver-side state.
  */
object Merge {

  /** Last-wins upsert of `updates` into `base`.
    *
    * Both frames must share a schema that includes `keys` and
    * `versionCol`. For each key tuple the row with the highest version
    * survives; on version ties the update side wins (so replaying a delta
    * is idempotent). Keys present only in `updates` are inserts; keys
    * present only in `base` pass through.
    *
    * @param tieBreak columns appended (descending) to the survivor
    *   ordering for rows that tie on (key, version) WITHIN one side.
    *   Without it such duplicates pick a scan-order-dependent survivor —
    *   fine when each side holds at most one row per (key, version)
    *   (the usual CDC contract), but pass a unique column here whenever
    *   a batch can carry same-version duplicates, or replay idempotence
    *   is lost.
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String,
      tieBreak: Seq[String] = Nil,
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    val src = "__upsert_src"
    val rn = "__upsert_rn"
    for (df <- Seq(base, updates))
      Guards.requireNoReservedNames(df, Seq(src, rn), "upsert")
    val all = base.withColumn(src, lit(0)).unionByName(updates.withColumn(src, lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: col(src).desc +: tieBreak.map(col(_).desc): _*)
    all.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(src, rn)
  }

  /** Golden-record consolidation: collapse each key's row GROUP into one
    * survivor row whose every value column independently takes the most
    * recent NON-NULL value — the record-linkage "merge" step after
    * matching (e.g. [[graft.text.Fuzzy.fuzzyDedupe]] clusters), and the
    * column-level upgrade of [[upsert]]'s row-level last-wins: a fresher
    * row with a null field no longer erases an older row's known value.
    *
    * One hash shuffle on the keys; the per-column "latest non-null" is a
    * running `last(ignoreNulls)` over the (version, tieBreak) order and
    * the survivor is the partition's last row — both ride the same
    * window exchange, no self-join. Ties on (key, version) without a
    * `tieBreak` are nondeterministic, same contract as [[upsert]].
    */
  def consolidate(
      df: DataFrame,
      keys: Seq[String],
      versionCol: String,
      valueCols: Seq[String],
      tieBreak: Seq[String] = Nil,
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one consolidation key")
    require(valueCols.nonEmpty, "need at least one value column")
    val rn = "__gold_rn"
    Guards.requireNoReservedNames(df, Seq(rn), "consolidate")
    val order = (col(versionCol) +: tieBreak.map(col)).map(_.asc)
    val run = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(versionCol) +: tieBreak.map(col)).map(_.desc): _*)
    valueCols.foldLeft(df)((d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(run)))
      .withColumn(rn, row_number().over(pick))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
