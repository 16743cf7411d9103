package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group ordinary least squares — closed-form trend estimation
  * (`y = intercept + slope·x` per group) as one aggregation over the
  * scan, the way a 100 TB metrics store fits a trendline per series
  * without ever materializing per-group arrays.
  *
  * The reference library's pipelines hand per-group curve fitting to
  * driver-side pandas via the grouped-map machinery
  * (reference: ons_utils/pyspark/general.py:42-106 — an arbitrary
  * `pd.DataFrame -> pd.DataFrame` per group); this is the same
  * capability expressed as sufficient statistics: OLS needs only the
  * five moment sums (Σx, Σy, Σx², Σxy, Σy²), which aggregate
  * map-side-combined in a single shuffle keyed on the group columns —
  * no per-group iteration, no Arrow hop, no skew sensitivity beyond
  * the aggregation itself.
  *
  * Determinism (the repo's playbook): x and y quantize to integer
  * micro-units per row, the five moments accumulate as DECIMAL(38,0)
  * (exact integers at any parallelism or fold order — second moments
  * of micro-quantized values overflow BIGINT at ~10⁵ rows/group, so
  * the accumulator is decimal on the Spark side and HUGEINT in the
  * DuckDB oracle), and each emitted statistic is a fixed sequence of
  * IEEE double operations on those exact integers:
  *
  *   slope     = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)          (micro scales cancel)
  *   intercept = ((Sy·Sxx − Sx·Sxy) / (n·Sxx − Sx²)) / 10⁶
  *   r         = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)·(n·Syy − Sy²))
  *
  * Numerators/denominators are exact decimal combinations cast to
  * double ONCE (round-to-nearest is identical in every engine), then
  * one division (plus one sqrt for r²) — so 6-dp-rounded outputs agree
  * bit-for-bit with any engine replaying the same integer moments.
  *
  * Degenerate groups get explicit semantics: a group whose x variance
  * is zero (all points share one x) has no defined line — slope,
  * intercept and r2 emit NULL rather than ±Infinity; a group with zero
  * y variance on positive x variance is a perfect horizontal fit:
  * slope 0, intercept = mean(y), r2 NULL (r is 0/0 there).
  */
object Regression {

  /** Fit `y = intercept + slope·x` per group. Returns the group columns
    * plus `(n, slope, intercept, r2)`, rounded to 6 dp.
    *
    * `x` and `y` are micro-quantized per row (`round(v·10⁶)`) before
    * the moment sums — callers supplying already-integer x (epoch days,
    * a version counter) lose nothing; callers with fractional x/y get
    * the library-wide micro precision.
    */
  def groupOls(df: DataFrame, groupBy: Seq[String], x: Column, y: Column): DataFrame = {
    require(groupBy.nonEmpty, "groupOls needs at least one group column")
    val dec = DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast(dec)
    val g = df
      .select(groupBy.map(col) :+ q(x).as("__x") :+ q(y).as("__y"): _*)
      .groupBy(groupBy.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
    // exact decimal combinations, cast to double once, then IEEE math
    val covN = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val varX = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val varY = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val interN = (col("__sy") * col("__sxx") - col("__sx") * col("__sxy")).cast("double")
    val r = covN / sqrt(varX * varY)
    g.select(
      groupBy.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        when(varX =!= 0.0, round(covN / varX, 6)).as("slope"),
        when(varX =!= 0.0, round(interN / varX / lit(1e6), 6)).as("intercept"),
        when(varX =!= 0.0 && varY =!= 0.0, round(r * r, 6)).as("r2")): _*)
  }

  /** Log-log OLS per group — `ln y = intercept + slope·ln x`, the
    * elasticity regression (slope = %Δy per %Δx; demand elasticity,
    * scaling exponents, power laws). Only rows with x > 0 AND y > 0
    * participate (logs), stated in the contract.
    *
    * Determinism: ln x / ln y nano-quantize PER ROW (libm ln agrees
    * across engines; a raw double Σ of them would not be
    * order-invariant), then the [[groupOls]] exact-decimal moment
    * algebra — slope and r² are scale-free in the nano unit, intercept
    * unscales by 1e9 once.
    *
    * Scale shape: ONE group-keyed map-combined aggregation; 1 row per
    * group.
    */
  def groupOlsLogLog(df: DataFrame, groupBy: Seq[String], x: Column,
                     y: Column): DataFrame = {
    require(groupBy.nonEmpty, "groupOlsLogLog needs at least one group column")
    val dec = DecimalType(38, 0)
    def ql(c: Column): Column = round(log(c) * lit(1e9), 0).cast("long").cast(dec)
    val g = df
      .filter(y > 0 && x > 0)
      .select(groupBy.map(col) :+ ql(x).as("__x") :+ ql(y).as("__y"): _*)
      .groupBy(groupBy.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
    val covN = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val varX = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val varY = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    // intercept via the slope in DOUBLE — the decimal Sy·Sxx − Sx·Sxy
    // form overflows DECIMAL(38) in nano² units at corpus scale
    val slope = covN / varX
    val inter = (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
      col("__n").cast("double") / lit(1e9)
    val r = covN / sqrt(varX * varY)
    g.select(
      groupBy.map(col) ++ Seq(
        col("__n").cast("long").as("n"),
        when(varX =!= 0.0, round(slope, 6)).as("elasticity"),
        when(varX =!= 0.0, round(inter, 6)).as("intercept"),
        when(varX =!= 0.0 && varY =!= 0.0, round(r * r, 6)).as("r2")): _*)
  }

  /** Top-k influence points by Cook's distance under the per-group
    * simple OLS — "which days bent the trend line?":
    *
    *   h_i = 1/n + (x_i − x̄)²/S_xx,   D_i = e_i²·h_i / (p·s²·(1−h_i)²)
    *
    * with p = 2 and s² = RSS/(n−2). Returns the k most influential rows
    * per group `(groups..., x, resid, leverage, cooks_d)`.
    *
    * Determinism: the fit and every per-row quantity are fixed IEEE
    * trees over [[groupOls]]'s exact micro moments (broadcast to the
    * rows); ranking orders by the 9-dp-rounded D with the x tiebreak so
    * equal-tree engines agree on the kept set.
    *
    * Scale shape: one group-keyed moment pass, a k-row broadcast back,
    * one narrow scoring projection, one group-partitioned top-k window.
    */
  def cooksTopK(df: DataFrame, groupBy: Seq[String], x: Column, y: Column,
                k: Int): DataFrame = {
    require(groupBy.nonEmpty, "cooksTopK needs group columns")
    require(k >= 1, s"k must be positive: $k")
    val dec = DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast(dec)
    val base = df
      .select(groupBy.map(col) :+ q(x).as("__x") :+ q(y).as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val g = base.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy"))
    val mxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val mxy = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val myy = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val nD = col("__n").cast("double")
    val coef = g
      .filter(col("__n") >= 4 && mxx > 0.0)
      .select(groupBy.map(col) ++ Seq(
        (mxy / mxx).as("__b"),
        ((col("__sy").cast("double") - mxy / mxx * col("__sx").cast("double")) / nD)
          .as("__a"),
        (col("__sx").cast("double") / nD).as("__xbar"),
        (mxx / nD).as("__sxxc"),
        nD.as("__nD"),
        (((myy - mxy * mxy / mxx) / nD) / (nD - lit(2.0))).as("__s2")): _*)
    val xd = col("__x").cast("double")
    val e = col("__y").cast("double") - (col("__a") + col("__b") * xd)
    val h = lit(1.0) / col("__nD") + (xd - col("__xbar")) * (xd - col("__xbar")) /
      col("__sxxc")
    val d = e * e * h / (lit(2.0) * col("__s2") * (lit(1.0) - h) * (lit(1.0) - h))
    val scored = base.join(broadcast(coef), groupBy)
      .filter(col("__s2") > 0.0)
      .withColumn("__d9", round(d, 9))
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(groupBy.map(col): _*)
      .orderBy(col("__d9").desc, col("__x"))
    scored.withColumn("__rk", row_number().over(W))
      .filter(col("__rk") <= k)
      .select(groupBy.map(col) ++ Seq(
        (col("__x").cast("double") / lit(1e6)).as("x"),
        round(e / lit(1e6), 6).as("resid"),
        round(h, 6).as("leverage"),
        round(d, 6).as("cooks_d")): _*)
  }
}