package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group missing-value imputation — the distributed spelling of the
  * reference's grouped `fillna` patterns (the grouped-map seat its
  * `convert_to_pandas_udf` was built for, reference pyspark/general.py:42;
  * see also the shifted-year apply family in [[Timeseries]]).
  *
  * Scale design: `mean` is pure window arithmetic over one hash exchange
  * on the group keys — the group statistic never leaves the executors, no
  * collect, no second scan. `mode` needs a (group, value) count first:
  * two exchanges, both partial-aggregated. Fills are deterministic:
  * means go through an exact decimal sum (order-insensitive) with one
  * final double division; mode ties break to the smallest value.
  */
object Impute {

  /** Fill nulls in `valueCol` with a per-`parts` statistic, into
    * `outCol` (the original column is kept).
    *
    * Methods: `"mean"` (exact decimal-sum mean of the present values),
    * `"mode"` (most frequent present value, ties → smallest). Groups
    * whose values are ALL null keep null (nothing to impute from).
    *
    * @param sumScale decimal scale for the mean's exact accumulator —
    *   match the data's true decimal places (2 for currency).
    */
  def imputePerGroup(df: DataFrame, parts: Seq[String], valueCol: String,
                     method: String, outCol: String = "", sumScale: Int = 2): DataFrame = {
    require(parts.nonEmpty, "need at least one grouping column")
    val reserved = Seq("__mv", "__mn", "__mr", "__fill")
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved names (${reserved.mkString(", ")})")
    val out = if (outCol.isEmpty) s"${valueCol}_imputed" else outCol
    val v = col(valueCol)
    method match {
      case "mean" =>
        val w = Window.partitionBy(parts.map(col): _*)
        val fill = (sum(v.cast(DecimalType(18, sumScale))).over(w).cast("double")
          / count(v).over(w))
        df.withColumn(out, coalesce(v, fill))
      case "mode" =>
        val cnt = df.filter(v.isNotNull)
          .groupBy((parts.map(col) :+ v.as("__mv")): _*)
          .agg(count(lit(1)).as("__mn"))
        val pick = Window.partitionBy(parts.map(col): _*)
          .orderBy(col("__mn").desc, col("__mv").asc)
        val modes = cnt.withColumn("__mr", row_number().over(pick))
          .filter(col("__mr") === 1)
          .select((parts.map(col) :+ col("__mv").as("__fill")): _*)
        df.join(modes, parts, "left")
          .withColumn(out, coalesce(v, col("__fill")))
          .drop("__fill")
      case other =>
        throw new IllegalArgumentException(s"unknown impute method: $other")
    }
  }
}
