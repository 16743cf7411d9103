package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-id assignment — contiguous 0..n-1 ids in a caller-defined
  * order, the "give every document a stable number" step before packing,
  * sharding, or matrix-style training exports.
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  */
object Ids {

  /** Assign dense ids `0..n-1` following the total order of `orderCols`
    * WITHOUT the classic trap (`row_number()` over an empty window spec
    * sorts every row into ONE task — the reference's documented
    * single-partition hazard, general.py:173-179).
    *
    * Shape: range-repartition on the order columns (distributed sort),
    * then `monotonically_increasing_id` exposes each row's partition
    * ordinal ((id >> 33) = partition, low bits = position within it);
    * per-partition counts (one tiny aggregation — partition-count rows)
    * turn into starting offsets via a cumulative sum over that BOUNDED
    * table, broadcast back, and the dense id is offset + local position.
    * The result depends only on the total order, not on where the range
    * boundaries fell.
    *
    * `orderCols` must be a total order (ties would make ids
    * run-dependent — same contract as every window op here).
    */
  def withDenseId(df: DataFrame, orderCols: Seq[String], idCol: String = "row_id",
                  numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    Guards.requireNoReservedNames(df, Seq(idCol, "__mid", "__pid", "__offset"), "withDenseId")
    val order = orderCols.map(col(_).asc)
    val ranged = numPartitions
      .map(n => df.repartitionByRange(n, order: _*))
      .getOrElse(df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      // projected attributes, not raw expressions: a nondeterministic
      // expression may not appear in a join condition. shiftright, not
      // `/`: Spark's / on longs is IEEE double division, exact only
      // while __mid < 2^53 — past ~1M partitions a rounded quotient
      // would silently misassign rows to the wrong offset.
      .withColumn("__pid", shiftright(col("__mid"), 33))
      // materialization barrier, not an optimization: the offsets branch
      // and the row branch below must see the SAME sampled range
      // boundaries and the SAME ordinals — without the barrier that is
      // only true while exchange reuse happens to deduplicate the two
      // nondeterministic subtrees (exchange-reuse config-dependent)
      .localCheckpoint(true)
    // partition-count-sized table: the window below is bounded by the
    // partition count, never by the data
    val offsets = ranged
      .groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol, col("__offset") + (col("__mid") % lit(1L << 33)))
      .drop("__mid", "__pid", "__offset")
  }

  /** Distributed GLOBAL running totals (inclusive prefix sums of
    * `sumCols` in `orderCols` order) — the scale-safe replacement for
    * `sum(...).over(Window.orderBy(...))`, which collapses every row
    * into one task (the reference's documented single-partition hazard).
    *
    * Same two-level shape as [[withDenseId]]: range repartition
    * (distributed sort) pins rows to ordered partitions behind a
    * materialization barrier; per-partition subtotals (a
    * partition-count-sized table) cumulate into exclusive offsets and
    * broadcast back; each row's prefix = its partition's offset + a
    * partition-LOCAL running sum. Every window in the plan is bounded —
    * by the partition count or by partition contents.
    *
    * `orderCols` must be a total order across rows (same contract as
    * [[withDenseId]]); `sumCols` must be numeric (longs/decimals for
    * exactness — double prefix sums inherit float association).
    */
  def withRunningTotals(df: DataFrame, orderCols: Seq[String],
                        sumCols: Seq[String], suffix: String = "_cum",
                        numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    require(sumCols.nonEmpty, "need at least one sum column")
    val outCols = sumCols.map(_ + suffix)
    Guards.requireNoReservedNames(df,
      Seq("__mid", "__pid") ++ outCols.flatMap(c => Seq(c, s"__off_$c")),
      "withRunningTotals")
    val order = orderCols.map(col(_).asc)
    val ranged = numPartitions
      .map(n => df.repartitionByRange(n, order: _*))
      .getOrElse(df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      // same barrier rationale as withDenseId: both branches must see
      // one set of sampled range boundaries
      .localCheckpoint(true)
    val offsets = {
      val base = ranged.groupBy(col("__pid"))
        .agg(sum(col(sumCols.head)).as(s"__n_${sumCols.head}"),
          sumCols.tail.map(c => sum(col(c)).as(s"__n_$c")): _*)
      val w = Window.orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      sumCols.foldLeft(base) { (d, c) =>
        d.withColumn(s"__off_$c", coalesce(sum(col(s"__n_$c")).over(w), lit(0L)))
      }.select(col("__pid") +: sumCols.map(c => col(s"__off_$c")): _*)
    }
    val localW = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = ranged.join(broadcast(offsets), Seq("__pid"))
    sumCols.zip(outCols).foldLeft(withLocal) { case (d, (c, out)) =>
        d.withColumn(out, col(s"__off_$c") + sum(col(c)).over(localW))
      }
      .drop("__mid" +: "__pid" +: sumCols.map(c => s"__off_$c"): _*)
  }
}
