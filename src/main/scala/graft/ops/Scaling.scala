package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group feature scaling — the normalization step between raw
  * metrics and anything distance- or gradient-based (the numeric
  * sibling of [[graft.text.TextStats.normalizeText]]).
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  *
  * Execution shape (all three scalers): ONE aggregation computes every
  * column's statistics for the group in the same pass (map-side
  * combined), the per-group stats row broadcasts back, and the scaled
  * value is a narrow projection — rows shuffle once for the stats and
  * never again. With no group columns the stats side is a single row
  * (still broadcast — no single-partition window anywhere).
  *
  * Determinism: means ride exact decimal sums (associative) with one
  * final double cast; std/minmax arithmetic is IEEE-exact (div/sub/
  * sqrt) — so scaled values are bit-stable across partitionings and
  * engines. Null values scale to null; zero-spread groups (std or
  * range 0) scale to null rather than dividing by zero — callers that
  * want 0 there can coalesce.
  */
object Scaling {

  private val dec = DecimalType(28, 10)

  private def stats(df: DataFrame, parts: Seq[String], cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).cast(dec)).cast("double").as(s"__s1_$c"),
        sum((col(c) * col(c)).cast(dec)).cast("double").as(s"__s2_$c"),
        count(col(c)).as(s"__n_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"),
      )
    }
    if (parts.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(parts.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def withStats(df: DataFrame, parts: Seq[String], cols: Seq[String])(
      scaled: String => Column): DataFrame = {
    require(cols.nonEmpty, "need at least one column to scale")
    val statNames = cols.flatMap(c =>
      Seq(s"__s1_$c", s"__s2_$c", s"__n_$c", s"__min_$c", s"__max_$c"))
    Guards.requireNoReservedNames(df, statNames, "scaling")
    // Global case: provably one row — force broadcast. Grouped case: the
    // stats table is GROUP-cardinality-sized (per-entity scaling can make
    // it huge), so no hint — Spark broadcasts when it fits and falls back
    // to a shuffle join when it doesn't.
    val st = stats(df, parts, cols)
    val joined = if (parts.isEmpty) df.crossJoin(broadcast(st)) else df.join(st, parts)
    cols.foldLeft(joined)((d, c) => d.withColumn(c, scaled(c)))
      .drop(statNames: _*)
  }

  /** Z-score standardization: `(x - mean) / std` per group (population
    * std). Zero-variance groups yield null.
    */
  def standardize(df: DataFrame, parts: Seq[String], cols: Seq[String]): DataFrame =
    withStats(df, parts, cols) { c =>
      val mean = col(s"__s1_$c") / col(s"__n_$c")
      val variance = greatest(
        (col(s"__s2_$c") - col(s"__s1_$c") * col(s"__s1_$c") / col(s"__n_$c")) / col(s"__n_$c"),
        lit(0.0))
      val std = sqrt(variance)
      when(std > 0, (col(c) - mean) / std)
    }

  /** Min-max scaling onto [0, 1] per group. Zero-range groups yield
    * null.
    */
  def minMaxScale(df: DataFrame, parts: Seq[String], cols: Seq[String]): DataFrame =
    withStats(df, parts, cols) { c =>
      val range = col(s"__max_$c") - col(s"__min_$c")
      when(range > 0, (col(c) - col(s"__min_$c")) / range)
    }

  /** Robust scaling: `(x - median) / IQR` per group — order statistics
    * a few extreme values cannot drag (same contract as [[Outliers]];
    * exact `percentile` here, `approx_percentile` at 100 TB). Zero-IQR
    * groups yield null.
    */
  def robustScale(df: DataFrame, parts: Seq[String], cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to scale")
    val statNames = cols.flatMap(c => Seq(s"__med_$c", s"__q1_$c", s"__q3_$c"))
    Guards.requireNoReservedNames(df, statNames, "robustScale")
    val aggs = cols.flatMap { c =>
      Seq(
        percentile(col(c), lit(0.5)).as(s"__med_$c"),
        percentile(col(c), lit(0.25)).as(s"__q1_$c"),
        percentile(col(c), lit(0.75)).as(s"__q3_$c"),
      )
    }
    val st =
      if (parts.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(parts.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // same hint policy as withStats: only the provably-1-row side forces it
    val joined = if (parts.isEmpty) df.crossJoin(broadcast(st)) else df.join(st, parts)
    cols.foldLeft(joined) { (d, c) =>
      val iqr = col(s"__q3_$c") - col(s"__q1_$c")
      d.withColumn(c, when(iqr > 0, (col(c) - col(s"__med_$c")) / iqr))
    }.drop(statNames: _*)
  }
}
