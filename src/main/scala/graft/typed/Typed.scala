package graft.typed

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Typed `Dataset[T]` surface over the harness tables: case-class
  * encoders give compile-time field access and read-time schema
  * validation (`.as[T]` fails fast on a drifted table instead of
  * producing nulls three joins later).
  *
  * Scale tradeoff, stated plainly: typed lambdas (`filter(_.x > k)`,
  * `groupByKey(_.k)`) deserialize each row to the case class, which
  * Catalyst cannot push into the parquet scan or fuse as tightly as
  * column expressions. Use the typed surface where business logic
  * density makes compile-time safety worth a deserialization pass —
  * and keep hot-scan predicates as `Column`s (both styles compose on
  * the same Dataset). The typed aggregation below still runs as a real
  * partial/final HashAggregate — `KeyValueGroupedDataset.agg` with
  * `TypedColumn`s keeps Catalyst aggregation, it does NOT fall back to
  * `mapGroups` (TypedSpec pins this).
  */
object Typed {

  final case class Order(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderpriority: String)

  final case class Document(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long)

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    graft.sources.Sources.readTable(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .as[Order]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    graft.sources.Sources.readTable(spark, dir, "documents").as[Document]
  }

  /** Typed pipeline example: compile-time-checked filter + typed group
    * key + Catalyst-aggregated typed columns (exact decimal sum).
    */
  def prioritySummary(ds: Dataset[Order], minTotal: Double): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.o_totalprice > minTotal)
      .groupByKey(_.o_orderpriority)
      .agg(
        count(lit(1)).as[Long],
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as[Double])
      .toDF("o_orderpriority", "n", "sum_total")
  }
}
