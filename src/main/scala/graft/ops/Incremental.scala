package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregation over mergeable state: keep a per-key state
  * table of partial aggregates, fold each new delta into it, and never
  * rescan history. At 100 TB the difference between `agg(full corpus)`
  * and `merge(state, agg(delta))` is the whole job.
  *
  * Not in the reference; engine extension (SURVEY §2.11). Only
  * merge-closed aggregates are offered (sum / count / min / max — the
  * same set parquet footers and data sketches rely on); sums accumulate
  * in exact decimals so merge order can never change a bit. Averages
  * derive from (sum, count) at read time; distinct counts belong to the
  * HLL sketch path (q_hll), not here.
  */
object Incremental {

  /** One aggregate spec: `fn` ∈ sum | count | min | max applied to `c`.
    * The state column is named `"${fn}_${c}"`.
    */
  final case class MAgg(c: String, fn: String) {
    val name = s"${fn}_$c"
  }

  private def firstPass(a: MAgg, sumScale: Int): Column = a.fn match {
    case "sum"   => sum(col(a.c).cast(DecimalType(18, sumScale))).as(a.name)
    case "count" => count(col(a.c)).as(a.name)
    case "min"   => min(col(a.c)).as(a.name)
    case "max"   => max(col(a.c)).as(a.name)
    case other   => throw new IllegalArgumentException(s"non-mergeable aggregate: $other")
  }

  /** Merge step for an existing state column: sums and counts add,
    * extrema re-extremize. Exactly the partial/final split Spark's own
    * HashAggregate uses — state tables are first-class partials.
    */
  private def mergePass(a: MAgg): Column = (a.fn match {
    case "sum" | "count" => sum(col(a.name))
    case "min"           => min(col(a.name))
    case "max"           => max(col(a.name))
    case other           => throw new IllegalArgumentException(s"non-mergeable aggregate: $other")
  }).as(a.name)

  /** Aggregate a batch into per-key state. */
  def aggState(df: DataFrame, keys: Seq[String], aggs: Seq[MAgg],
               sumScale: Int = 2): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "need keys and aggregates")
    val exprs = aggs.map(firstPass(_, sumScale))
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Fold a new delta batch into existing state: aggregate the delta,
    * union, re-merge. One shuffle over (state ∪ delta-partials) — the
    * full history is never read again.
    */
  def mergeState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                 aggs: Seq[MAgg], sumScale: Int = 2): DataFrame = {
    val exprs = aggs.map(mergePass)
    state.unionByName(aggState(delta, keys, aggs, sumScale))
      .groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Distinct counts as mergeable state: a per-key Datasketches HLL
    * sketch (binary column `"hll_$valueCol"`). Sums/counts merge exactly
    * ([[aggState]]); distinct needs a sketch — this is the scale answer
    * to "daily distinct users, updated incrementally, never rescanning
    * history". lgConfigK=12 ≈ 2.5 KB/key and ~1.6% standard error.
    */
  def hllState(df: DataFrame, keys: Seq[String], valueCol: String,
               lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as(s"hll_$valueCol"))

  /** Merge sketch states (old state ∪ new delta partials) — same
    * union+re-aggregate shape as [[mergeState]], sketch union instead of
    * sum. Estimates come out via [[hllCount]].
    */
  def hllMergeState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    valueCol: String, lgConfigK: Int = 12): DataFrame =
    state.unionByName(hllState(delta, keys, valueCol, lgConfigK))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(s"hll_$valueCol")).as(s"hll_$valueCol"))

  /** Read a distinct-count estimate out of a sketch state column. */
  def hllCount(sketch: Column): Column = hll_sketch_estimate(sketch)
}
