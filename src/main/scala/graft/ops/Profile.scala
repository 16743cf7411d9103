package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling: null counts, exact distinct counts, min/max
  * — the pre-flight data-quality summary for pipeline inputs.
  *
  * All statistics for all columns come from ONE aggregation over the data
  * (a single scan; Spark plans the multi-distinct via Expand), then the
  * wide row is stacked to long form. For 100 TB profiling swap
  * `countDistinct` for `approx_count_distinct` — same shape, sketch
  * merge instead of exact distinct expansion.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n_rows")) ++ cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Column names reach a SQL string: backtick-quote identifiers and
    // escape quotes in the label literal so arbitrary names survive.
    def bt(name: String): String = "`" + name.replace("`", "``") + "`"
    def str(name: String): String = "'" + name.replace("'", "''") + "'"
    val stackArgs = cols.map(c =>
      s"${str(c)}, __n_rows, ${bt(s"__nulls_$c")}, ${bt(s"__distinct_$c")}, " +
        s"${bt(s"__min_$c")}, ${bt(s"__max_$c")}").mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
  }

  /** Approximate quantiles for numeric columns, one sketch pass
    * (approx_percentile sketch, mergeable across partitions — the scale
    * path where exact percentiles would need a full sort).
    * Returns one row per column with the requested quantile values.
    */
  def quantiles(df: DataFrame, cols: Seq[String],
                qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                accuracy: Int = 10000): DataFrame = {
    val qArr = array(qs.map(lit): _*)
    val aggs = cols.map(c =>
      percentile_approx(col(c), qArr, lit(accuracy)).as(s"__q_$c"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def bt(name: String): String = "`" + name.replace("`", "``") + "`"
    def str(name: String): String = "'" + name.replace("'", "''") + "'"
    val stackArgs = cols.map(c => s"${str(c)}, ${bt(s"__q_$c")}").mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, quantiles)"))
  }
}
