package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: type-2 history construction from a change
  * log, and snapshot-to-snapshot diff extraction.
  *
  * Not in the reference (whose concat, SURVEY §2.6, is append-only);
  * engine extension (SURVEY §2.11). Together with [[Merge.upsert]]
  * (fold deltas forward) and [[Merge.consolidate]] (collapse to golden
  * records) this completes the ingest lineage toolkit: `diffSnapshots`
  * turns two corpus versions into a delta, `upsert` replays it, `scd2`
  * keeps the full validity-interval history.
  *
  * Scale design: both operators are one hash shuffle on the entity keys
  * — the window functions in [[scd2]] ride a single exchange, and
  * [[diffSnapshots]] is a single full-outer hash join (bucket both
  * snapshots on the keys, [[graft.sources.Sources.writeBucketed]], and
  * even that exchange disappears). No driver-side state, no collect.
  */
object Cdc {

  /** Build a type-2 slowly-changing-dimension history from a change log.
    *
    * Input: one row per observed change `(keys, tsCol, valueCols...)`.
    * Output: one row per validity interval with `effective_from`,
    * `effective_to` (null = still current) and `is_current`, where
    * consecutive rows whose `valueCols` are all unchanged (null-safe)
    * are collapsed into one interval — re-asserting the same value
    * never splits history.
    *
    * Plan shape: partition by `keys`, order by (`tsCol`, tieBreak); the
    * change-compression lag and the interval lead ride the SAME window
    * exchange (one shuffle total). Rows that tie on (keys, tsCol)
    * without a `tieBreak` pick a nondeterministic order — pass a unique
    * column (same contract as [[Merge.upsert]]).
    */
  def scd2(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieBreak: Seq[String] = Nil,
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one entity key")
    require(valueCols.nonEmpty, "need at least one tracked value column")
    val chg = "__scd2_changed"
    Guards.requireNoReservedNames(df, Seq(chg, "effective_from", "effective_to", "is_current"), "scd2")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // A row opens a new interval iff any tracked value differs (null-safe)
    // from the previous observation, or it is the first observation.
    // First-row detection uses row_number, NOT lag(ts).isNull — a null
    // timestamp in the log would otherwise mark its successor "changed"
    // and split an unchanged run.
    val changed = valueCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val compressed = df.withColumn(chg, changed).filter(col(chg)).drop(chg)
    // Same partitioning and ordering → Catalyst reuses one exchange for
    // both window passes; the filter between them is narrow.
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    compressed
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Diff two snapshots of a keyed table into change rows.
    *
    * Output: one row per key present in either side with
    * `change_type` ∈ insert | delete | update | unchanged (unchanged
    * kept only when `keepUnchanged`), carrying the surviving values —
    * new-side values for insert/update/unchanged, old-side values for
    * delete. Value comparison is null-safe per column.
    *
    * This is the inverse of [[Merge.upsert]]: `upsert(old, diff)` with
    * deletes applied reproduces `new`. One full-outer hash join on the
    * keys; neither side is assumed small (at 100 TB both snapshots
    * shuffle — or neither does, if stored bucketed on the keys).
    */
  def diffSnapshots(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      keepUnchanged: Boolean = false,
  ): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    // Presence markers instead of key-null probing: a snapshot key may
    // itself be null (the join is null-safe), so side membership must be
    // carried explicitly.
    val mOld = "__diff_in_old"
    val mNew = "__diff_in_new"
    for (df <- Seq(oldDf, newDf))
      Guards.requireNoReservedNames(df, Seq("change_type", mOld, mNew), "diffSnapshots")
    val o = oldDf.select((keys ++ compareCols).map(col) :+ lit(true).as(mOld): _*).alias("o")
    val n = newDf.select((keys ++ compareCols).map(col) :+ lit(true).as(mNew): _*).alias("n")
    val cond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val inOld = col(s"o.$mOld").isNotNull
    val inNew = col(s"n.$mNew").isNotNull
    val valuesEqual = compareCols.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val changeType = when(!inOld, lit("insert"))
      .when(!inNew, lit("delete"))
      .when(valuesEqual, lit("unchanged"))
      .otherwise(lit("update"))
    val keyOut = keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k))
    val valueOut = compareCols.map(c =>
      when(inNew, col(s"n.$c")).otherwise(col(s"o.$c")).as(c))
    val out = o.join(n, cond, "full_outer")
      .select((keyOut ++ valueOut :+ changeType.as("change_type")): _*)
    if (keepUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }
}
