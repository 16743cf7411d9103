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

  /** Elementary (unweighted) index formulas vs `basePeriod` — the layer
    * BELOW [[bilateralIndexes]] in a CPI build, where quantities are
    * unavailable and the formula choice (Carli vs Dutot vs Jevons) is a
    * methodological decision: `(period, n_items, carli, dutot, jevons)`.
    *
    * Carli = mean of price relatives; Dutot = ratio of mean prices;
    * Jevons = geometric mean of relatives. Per-item terms quantize to
    * integer nano/micro-units before the per-period sums (exact at any
    * parallelism); Jevons' per-item `ln` quantizes the same way, and the
    * single final `exp` lands on identical arguments in every engine, so
    * the 6-dp emitted value agrees despite libm ulp drift (the q_outliers
    * round-both-sides rule).
    */
  def elementaryIndexes(df: DataFrame, itemCol: String, periodCol: Column,
                        expCol: String, qtyCol: String,
                        basePeriod: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__pd"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"))
    val base = uv.filter(col("__pd") === basePeriod)
      .select(col("__it"), col("__p").as("__p0"))
    val rel = col("__p") / col("__p0")
    val nD = col("n_items").cast("double")
    uv.join(base, Seq("__it"))
      .groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(rel * lit(1e9), 0).cast("long")).as("__sr"),
        sum(round(col("__p") * lit(1e6), 0).cast("long")).as("__sp"),
        sum(round(col("__p0") * lit(1e6), 0).cast("long")).as("__sp0"),
        sum(round(log(rel) * lit(1e9), 0).cast("long")).as("__slr"))
      .select(col("__pd").as("period"), col("n_items"),
        round(col("__sr").cast("double") / nD / lit(1e9), 6).as("carli"),
        round(col("__sp").cast("double") / col("__sp0").cast("double"), 6).as("dutot"),
        round(exp(col("__slr").cast("double") / nD / lit(1e9)), 6).as("jevons"))
  }

  /** Chain-linked Laspeyres: a month-on-month link from each CONSECUTIVE
    * matched sample (items trading in both t-1 and t — chaining's whole
    * point is that the basket refreshes every period, so churn costs one
    * month of history, not the whole series), composed into a running
    * index by cumulative product. `(period date, n_items, link, chained)`.
    *
    * Determinism: links are built exactly like [[bilateralIndexes]]
    * (micro-quantized terms, integer sums); the chain composes as
    * `exp(Σ round(ln(link)·1e9) / 1e9)` — quantized log-links prefix-sum
    * EXACTLY in a window, one final `exp`, 6-dp emitted — because a
    * sequential double product would depend on fold order while integer
    * prefix sums cannot. The links table is period-bounded, so the
    * whole-frame window is bounded by construction (the q_drift rule).
    */
  def chainedIndex(df: DataFrame, itemCol: String, periodCol: Column,
                   expCol: String, qtyCol: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__pd"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"),
        col("__Q").cast("double").as("__q"))
    val prev = uv.select(col("__it"), add_months(col("__pd"), 1).as("__pd"),
      col("__p").as("__pp"), col("__q").as("__pq"))
    def micro(x: Column): Column = round(x * lit(1e6), 0).cast("long")
    val links = uv.join(prev, Seq("__it", "__pd"))
      .groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(micro(col("__p") * col("__pq"))).as("__num"),
        sum(micro(col("__pp") * col("__pq"))).as("__den"))
      .select(col("__pd"), col("n_items"),
        (col("__num").cast("double") / col("__den").cast("double")).as("__link"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("__pd")).rowsBetween(W.unboundedPreceding, W.currentRow)
    links
      .withColumn("__cln", sum(round(log(col("__link")) * lit(1e9), 0).cast("long")).over(w))
      .select(col("__pd").as("period"), col("n_items"),
        round(col("__link"), 6).as("link"),
        round(exp(col("__cln").cast("double") / lit(1e9)), 6).as("chained"))
  }

  /** Tukey-cleansed Jevons — the ONS-style validation step between price
    * collection and index compilation: per period, price relatives
    * outside their Tukey fences ([[Outliers.flagIqrOutliers]], exact
    * percentiles) are dropped before the geometric mean. Returns
    * `(period, n_items, n_kept, jevons, jevons_cleansed)` — both the raw
    * and the cleansed index, so the cleansing's effect is itself a
    * queryable number. Fence COMPARISONS run on raw doubles (identical in
    * both engines; the playbook's straddle rule), emitted indexes on the
    * quantized-ln path round to 6 dp.
    */
  def cleansedJevons(df: DataFrame, itemCol: String, periodCol: Column,
                     expCol: String, qtyCol: String, basePeriod: String,
                     k: Double = 1.5): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__pd"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"))
    val base = uv.filter(col("__pd") === basePeriod)
      .select(col("__it"), col("__p").as("__p0"))
    val rel = uv.join(base, Seq("__it"))
      .select(col("__pd"), (col("__p") / col("__p0")).as("__rel"))
    val flagged = Outliers.flagIqrOutliers(rel, Seq("__pd"), "__rel", k)
    val lnMicro = round(log(col("__rel")) * lit(1e9), 0).cast("long")
    flagged.groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(!col("is_outlier"), 1L).otherwise(0L)).as("n_kept"),
        sum(lnMicro).as("__slr_all"),
        sum(when(!col("is_outlier"), lnMicro).otherwise(0L)).as("__slr_kept"))
      .select(col("__pd").as("period"), col("n_items"), col("n_kept"),
        round(exp(col("__slr_all").cast("double")
          / col("n_items").cast("double") / lit(1e9)), 6).as("jevons"),
        round(exp(col("__slr_kept").cast("double")
          / col("n_kept").cast("double") / lit(1e9)), 6).as("jevons_cleansed"))
  }

  /** Carry-forward-imputed Laspeyres — CPI's answer to uncollected
    * prices: the BASE basket is held fixed, and an item missing in
    * period t keeps its last observed unit value ([[Timeseries.ffill]]'s
    * frame over an item×period spine), so the index never loses basket
    * coverage to collection gaps (unlike [[bilateralIndexes]]' matched
    * sample, which shrinks). Returns
    * `(period, n_items, n_imputed, laspeyres)` — the imputation COUNT
    * emits alongside the index, making data-quality drift queryable.
    *
    * Scale shape: the spine is base-basket × period-count (bounded, built
    * from two bounded sides); the fill is one item-keyed window; the
    * index reduction moves two micro-quantized longs per item-period.
    */
  def imputedIndex(df: DataFrame, itemCol: String, periodCol: Column,
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
    // periods before the base have no fill source — the index starts at base
    val periods = uv.select(col("__pd")).distinct()
      .filter(col("__pd") >= lit(basePeriod))
    val spine = base.crossJoin(periods)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("__it")).orderBy(col("__pd"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    def micro(x: Column): Column = round(x * lit(1e6), 0).cast("long")
    spine
      .join(uv.select(col("__it"), col("__pd"), col("__p").as("__p_obs")),
        Seq("__it", "__pd"), "left")
      .withColumn("__p_fill", last(col("__p_obs"), ignoreNulls = true).over(w))
      .groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__p_obs").isNull, 1L).otherwise(0L)).as("n_imputed"),
        sum(micro(col("__p_fill") * col("__q0"))).as("__numL"),
        sum(micro(col("__p0") * col("__q0"))).as("__denL"))
      .select(col("__pd").as("period"), col("n_items"), col("n_imputed"),
        round(col("__numL").cast("double") / col("__denL").cast("double"), 6)
          .as("laspeyres"))
  }

  /** Superlative indexes vs `basePeriod` — the formulas that treat both
    * periods' quantity information symmetrically (Fisher in
    * [[bilateralIndexes]] is one; these are the other two textbook
    * members): Törnqvist `exp(Σ s̄ᵢ·ln(pₜ/p₀))` with s̄ = the average of
    * the two periods' expenditure shares, and Walsh
    * `Σ √(q₀qₜ)·pₜ / Σ √(q₀qₜ)·p₀`. Returns
    * `(period, n_items, tornqvist, walsh)`.
    *
    * Determinism: shares are ratios of micro-quantized expenditure sums
    * (identical doubles); Törnqvist's per-item `s̄·ln(r)` terms and
    * Walsh's `√(q₀qₜ)·p` terms quantize to integer nano/micro-units
    * before their per-period sums; `√` is IEEE-exact on identical
    * operands; one final `exp` for Törnqvist; both emit at 6 dp.
    */
  def superlativeIndexes(df: DataFrame, itemCol: String, periodCol: Column,
                         expCol: String, qtyCol: String,
                         basePeriod: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__pd"), col("__S").cast("double").as("__e"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"),
        col("__Q").cast("double").as("__q"))
    val base = uv.filter(col("__pd") === basePeriod)
      .select(col("__it"), col("__e").as("__e0"), col("__p").as("__p0"),
        col("__q").as("__q0"))
    val j = uv.join(base, Seq("__it"))
    val W = org.apache.spark.sql.expressions.Window.partitionBy(col("__pd"))
    def nano(x: Column): Column = round(x * lit(1e9), 0).cast("long")
    def micro(x: Column): Column = round(x * lit(1e6), 0).cast("long")
    // per-period expenditure totals for the shares: micro-quantized LONG
    // window sums (a raw double window sum would be order-dependent);
    // period-keyed — the same single exchange as the final aggregation
    val e0m = micro(col("__e0"))
    val etm = micro(col("__e"))
    val s0 = e0m.cast("double") / sum(e0m).over(W).cast("double")
    val st = etm.cast("double") / sum(etm).over(W).cast("double")
    val sBar = (s0 + st) / lit(2.0)
    val lnR = log(col("__p") / col("__p0"))
    val wq = sqrt(col("__q0") * col("__q"))
    j.select(col("__pd"), nano(sBar * lnR).as("__tn"),
        micro(wq * col("__p")).as("__wn"), micro(wq * col("__p0")).as("__wd"))
      .groupBy(col("__pd"))
      .agg(count(lit(1)).as("n_items"), sum(col("__tn")).as("__t"),
        sum(col("__wn")).as("__n"), sum(col("__wd")).as("__d"))
      .select(col("__pd").as("period"), col("n_items"),
        round(exp(col("__t").cast("double") / lit(1e9)), 6).as("tornqvist"),
        round(col("__n").cast("double") / col("__d").cast("double"), 6).as("walsh"))
  }

  /** Per-GROUP bilateral Laspeyres — the two-level CPI build: sub-indexes
    * per class/division with their base-expenditure weights riding along,
    * so the published aggregate is the weighted mean of sub-indexes.
    * Returns `(groupCol, period, n_items, weight_micro, laspeyres)`;
    * `weight_micro` is the group's micro-quantized base expenditure
    * `Σ round(p₀q₀·1e6)` — EXACTLY the sub-index's denominator, so
    * `Σ_g w_g·L_g / Σ_g w_g` reproduces the all-items Laspeyres to the
    * emitted rounding (the Laspeyres decomposition, spec-pinned).
    */
  def groupedLaspeyres(df: DataFrame, itemCol: String, groupCol: String,
                       periodCol: Column, expCol: String, qtyCol: String,
                       basePeriod: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val uv = df
      .groupBy(col(itemCol).as("__it"), col(groupCol).as("__g"), periodCol.as("__pd"))
      .agg(sum(col(expCol).cast(dec)).as("__S"), sum(col(qtyCol).cast(dec)).as("__Q"))
      .select(col("__it"), col("__g"), col("__pd"),
        (col("__S").cast("double") / col("__Q").cast("double")).as("__p"),
        col("__Q").cast("double").as("__q"))
    // Base keeps the group key: an item trading under two groups must
    // contribute its base basket to each group separately, not
    // cross-duplicate (the item→group dependency is NOT assumed).
    val base = uv.filter(col("__pd") === basePeriod)
      .select(col("__it"), col("__g"), col("__p").as("__p0"), col("__q").as("__q0"))
    def micro(x: Column): Column = round(x * lit(1e6), 0).cast("long")
    uv.join(base, Seq("__it", "__g"))
      .groupBy(col("__g"), col("__pd"))
      .agg(count(lit(1)).as("n_items"),
        sum(micro(col("__p") * col("__q0"))).as("__numL"),
        sum(micro(col("__p0") * col("__q0"))).as("weight_micro"))
      .select(col("__g").as(groupCol), col("__pd").as("period"),
        col("n_items"), col("weight_micro"),
        round(col("__numL").cast("double") / col("weight_micro").cast("double"), 6)
          .as("laspeyres"))
  }

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
