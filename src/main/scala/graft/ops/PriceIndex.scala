package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bilateral price-index numbers (Laspeyres / Paasche / Fisher) over a
  * transaction table — the reference library's home domain (ONS consumer
  * prices: ons_utils feeds CPI-style index pipelines), re-expressed as
  * one Spark aggregation chain.
  *
  * Matched-sample design: an item enters period t's index only if it
  * also trades in the base period (the inner join against the base
  * basket), the standard bilateral treatment of churn. Unit values
  * (Σ expenditure / Σ quantity per item-period) stand in for price
  * quotes, the usual scanner-data convention.
  *
  * Determinism (the repo's playbook, applied end-to-end): expenditure
  * and quantity sum as DECIMAL(18,2) (double addition is
  * partial-order-dependent); each unit value is ONE correctly-rounded
  * double division of exact decimals; every per-item index term
  * (p·q products) quantizes to integer micro-units BEFORE the per-period
  * sum, so the numerators/denominators are exact BIGINTs at any
  * parallelism; the emitted ratios round to 6 dp; Fisher's sqrt is
  * IEEE-exact on identical operands.
  *
  * Scale shape: one (item, period) aggregation (map-side combined) over
  * the transaction scan; the base basket is item-bounded and joins
  * hint-free (AQE broadcasts it when it fits); the per-period reduction
  * moves four longs per item-period. A 100 TB transaction history costs
  * one shuffle keyed (item, period) — index math never sees row-level
  * data again.
  */
object PriceIndex {

  /** Per-period matched-sample indexes vs `basePeriod`:
    * `(period, n_items, laspeyres, paasche, fisher)`, base period
    * included (its indexes are 1.0 by construction).
    */
  def bilateralIndexes(df: DataFrame, itemCol: String, periodCol: Column,
                       expCol: String, qtyCol: String,
                       basePeriod: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__pd"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"),
        col("__Q").cast("double").as("__q"))
    val base = uv.filter(col("__pd") === basePeriod)
      .select(col("__it"), col("__p").as("__p0"), col("__q").as("__q0"))
    def micro(x: Column): Column = round(x * lit(1e6), 0).cast("long")
    val ratio = (num: String, den: String) =>
      col(num).cast("double") / col(den).cast("double")
    uv.join(base, Seq("__it"))
      .groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(micro(col("__p") * col("__q0"))).as("__numL"),
        sum(micro(col("__p0") * col("__q0"))).as("__denL"),
        sum(micro(col("__p") * col("__q"))).as("__numP"),
        sum(micro(col("__p0") * col("__q"))).as("__denP"))
      .select(col("__pd").as("period"), col("n_items"),
        round(ratio("__numL", "__denL"), 6).as("laspeyres"),
        round(ratio("__numP", "__denP"), 6).as("paasche"),
        round(sqrt(ratio("__numL", "__denL") * ratio("__numP", "__denP")), 6)
          .as("fisher"))
  }
}
