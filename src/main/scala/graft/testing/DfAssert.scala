package graft.testing

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Test scaffolding: tuple-grid DataFrame builder + DataFrame equality
  * assertion (the reference uses chispa's `assert_df_equality` with
  * `ignore_nullable` / `ignore_row_order`; reference testing.py:14-16 and
  * tests/conftest.py:44-49 for the tuple-literal builder).
  */
object DfAssert {

  /** Build a DataFrame from a header row + data rows (reference
    * `create_dataframe`, testing.py:14-16): schema inferred by Spark.
    */
  def createDf(spark: SparkSession, header: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    require(rows.nonEmpty, "createDf needs at least one row to infer a schema")
    val inferred = inferSchema(header, rows)
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq), numSlices = 2)
    spark.createDataFrame(rdd, inferred)
  }

  /** Build a DataFrame with an explicit DDL schema. */
  def createDf(spark: SparkSession, ddl: String, rows: Seq[Seq[Any]]): DataFrame = {
    val schema = StructType.fromDDL(ddl)
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq), numSlices = 2)
    spark.createDataFrame(rdd, schema)
  }

  /** Date-literal helper for fixtures (reference `to_date`,
    * testing.py:9-11): ISO `yyyy-MM-dd` string → `java.sql.Date`.
    */
  def toDate(s: String): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.parse(s))

  /** Timestamp-literal sibling of [[toDate]] (`yyyy-MM-dd[ HH:mm:ss]`). */
  def toTs(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(if (s.contains(" ") || s.contains("T")) s.replace('T', ' ')
      else s + " 00:00:00")

  /** Flat-column analog of the reference's MultiIndex-column builder
    * (`create_multi_column_df`, testing.py:19-22): the first
    * `columnLevels` rows of `data` are per-level column labels, joined
    * with `sep` into level-prefixed flat names (Spark has no column
    * MultiIndex; `a_b` is the flat spelling of `(a, b)` — the same
    * convention [[graft.ops.Reshape.unstack]] uses for pivoted columns).
    */
  def createMultiColumnDf(spark: SparkSession, data: Seq[Seq[Any]],
                          columnLevels: Int, sep: String = "_"): DataFrame = {
    require(data.length > columnLevels,
      s"need $columnLevels header rows plus at least one data row")
    val headers = data.take(columnLevels).map(_.map(String.valueOf))
    require(headers.map(_.length).distinct.size == 1,
      "all column-level header rows must have the same length")
    val names = headers.transpose.map(_.mkString(sep))
    createDf(spark, names, data.drop(columnLevels))
  }

  /** Flat analog of `create_df_with_multi_indices` (testing.py:25-87):
    * the first `columnLabels.length` rows label the value columns (joined
    * with `sep`); each data row leads with one value per `indexLabels`
    * entry, which become ordinary leading columns (Spark's spelling of a
    * row MultiIndex). The doctest shape from the reference maps 1:1.
    */
  def createDfWithMultiIndices(spark: SparkSession, data: Seq[Seq[Any]],
                               columnLabels: Seq[String], indexLabels: Seq[String],
                               sep: String = "_"): DataFrame = {
    val nLevels = columnLabels.length
    require(data.length > nLevels, s"need $nLevels header rows plus data rows")
    val headers = data.take(nLevels).map(_.map(String.valueOf))
    val dataRows = data.drop(nLevels)
    require(headers.head.length + indexLabels.length == dataRows.head.length,
      "data rows must be index values + one value per labeled column")
    val names = indexLabels ++ headers.transpose.map(_.mkString(sep))
    createDf(spark, names, dataRows)
  }

  private def inferSchema(header: Seq[String], rows: Seq[Seq[Any]]): StructType = {
    import org.apache.spark.sql.types._
    val fields = header.zipWithIndex.map { case (name, i) =>
      val sample = rows.iterator.map(_(i)).find(_ != null)
      val dt: DataType = sample match {
        case Some(_: Int)                  => IntegerType
        case Some(_: Long)                 => LongType
        case Some(_: Double)               => DoubleType
        case Some(_: Float)                => FloatType
        case Some(_: Short)                => ShortType
        case Some(_: Byte)                 => ByteType
        case Some(_: Boolean)              => BooleanType
        case Some(_: java.math.BigDecimal) => DecimalType(10, 0)
        case Some(_: BigDecimal)           => DecimalType(10, 0)
        case Some(_: java.sql.Timestamp)   => TimestampType
        case Some(_: java.sql.Date)        => DateType
        case Some(s: Seq[_])               => ArrayType(s.headOption match {
          case Some(_: Float)  => FloatType
          case Some(_: Double) => DoubleType
          case Some(_: Int)    => IntegerType
          case Some(_: Long)   => LongType
          case _               => StringType
        })
        case _                             => StringType
      }
      StructField(name, dt, nullable = true)
    }
    StructType(fields)
  }

  /** chispa-equivalent DataFrame equality: schema compare (optionally
    * modulo nullability) + collected row compare (optionally ignoring
    * row order). Throws AssertionError with a readable diff.
    */
  def assertDfEquality(
      actual: DataFrame,
      expected: DataFrame,
      ignoreNullable: Boolean = true,
      ignoreRowOrder: Boolean = true,
  ): Unit = {
    def norm(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.simpleString + (if (ignoreNullable) "" else s":${f.nullable}")))
    val (sa, se) = (norm(actual.schema), norm(expected.schema))
    assert(sa == se, s"schemas differ:\n  actual:   $sa\n  expected: $se")

    def rows(df: DataFrame): Seq[Seq[Any]] = {
      val collected = df.collect().toSeq.map(_.toSeq.map {
        case d: java.math.BigDecimal => d.stripTrailingZeros
        case x                       => x
      })
      if (ignoreRowOrder) collected.sortBy(_.mkString("\u0000")) else collected
    }
    val (ra, re) = (rows(actual), rows(expected))
    assert(ra == re,
      s"rows differ (${ra.length} vs ${re.length}):\n  actual:   ${ra.take(10)}\n  expected: ${re.take(10)}")
  }
}
