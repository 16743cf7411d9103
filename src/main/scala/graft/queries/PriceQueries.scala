package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.multimodal.Multimodal
import graft.ops.{AsOf, Columns, Concat, Grouped, Merge, Pack, Profile, RangeJoin, Reshape, Sampling, Skew, Timeseries}
import graft.streaming.Streaming
import graft.text.{Boilerplate, Cluster, Dedup, Dsir, LangModel, Pq, Rank, Similarity, TextStats}

import graft.queries.Qh.{t, dsum}

/** Price-index family: the reference's CPI domain (bilateral, elementary, chained, cleansed, imputed, superlative, grouped).
  *
  * Query defs + their DuckDB oracle SQL, split out of the former
  * monolithic SparkEntry (registry semantics unchanged — the maps merge
  * in [[graft.SparkEntry]]).
  */
object PriceQueries {

  /** GEKS-Törnqvist multilateral index ([[graft.ops.PriceIndex
    * .geksIndex]]): rolling 13-month window with mean splice over
    * 1995-1996 part prices — the multilateral method the reference's
    * web-scraped/scanner price pipelines feed
    * (reference ons_utils/config/validation.py:106-205 names these
    * pipelines). All pairwise Törnqvist terms quantize to integer nanos;
    * the window means and splice recurrence are integer HALF_UP
    * arithmetic the oracle replays with a recursive CTE carrying the
    * published log-series as a list.
    */
  private def qGeksIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.geksIndex(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")).isin(1995, 1996)),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", window = 13)
      .orderBy(col("period"))

  /** GEKS with MOVEMENT splice ([[graft.ops.PriceIndex.geksIndex]]
    * `spliceMethod = "movement"`): the published series extends through
    * the newest overlap period only — one exact integer add per new
    * period, the revision-free splice ONS methodology papers contrast
    * with the mean splice (q_geks_index). Same pairwise layer, same
    * windows; the recursion carries a single log-level instead of the
    * mean splice's published list.
    */
  private def qGeksMovement(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.geksIndex(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")).isin(1995, 1996)),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", window = 13, spliceMethod = "movement")
      .orderBy(col("period"))

  /** GEKS with HALF-WINDOW splice ([[graft.ops.PriceIndex.geksIndex]]
    * `spliceMethod = "half"`): the published series extends through the
    * overlap period half a window back (z = T - ⌊w/2⌋) — the
    * ONS/Eurostat compromise between q_geks_movement's newest-link
    * splice (short-term tracking, edge-revision exposed) and the
    * oldest-link window splice (drift-resistant, replaces w-1 links).
    * Same memoized pairwise layer; one exact integer add per period,
    * which the oracle's recursion replays against its carried history
    * list.
    */
  private def qGeksHalf(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.geksIndex(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")).isin(1995, 1996)),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", window = 13, spliceMethod = "half")
      .orderBy(col("period"))

  /** CPI weight audit over the two-level build ([[qGroupedIndex]]'s
    * weights): per period — group count, exact total micro-weight,
    * nano-quantized share sum (must print 1.0: the shares are ratios of
    * the SAME integer total, so the audit proves the decomposition's
    * weights are self-consistent), and max per-group share drift vs the
    * base period (basket-composition drift, the number a CPI
    * re-weighting decision watches).
    */
  private def qWeightAudit(s: SparkSession, dir: String): DataFrame = {
    val g = qGroupedIndex(s, dir)
    val Wp = Window.partitionBy(col("period"))
    val withShare = g.withColumn("share",
      col("weight_micro").cast("double") /
        sum(col("weight_micro")).over(Wp).cast("double"))
    val base = withShare.filter(col("period") === "1995-01")
      .select(col("p_brand"), col("share").as("__share0"))
    withShare.join(broadcast(base), Seq("p_brand"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("weight_micro")).as("total_weight_micro"),
        round(sum(round(col("share") * lit(1e9), 0).cast("long"))
          .cast("double") / lit(1e9), 6).as("share_sum"),
        round(max(abs(col("share") - col("__share0"))), 6).as("max_share_drift"))
      .orderBy(col("period"))
  }

  /** Geary-Khamis multilateral index ([[graft.ops.PriceIndex
    * .gearyKhamis]]): the international-prices fixed point for the 1995
    * matched panel, solved to the CONVERGED fixed point (max |ΔP| <
    * 1e-6, publication precision for the 6-dp index) with a 12-sweep
    * cap — the sweep count is data-dependent and emitted as
    * `iters_run`, so cost is bounded by the data, never the worst case.
    * With q_geks_index, the two standard multilateral methods side by
    * side. Every per-(item,period) term micro-quantizes before its sum;
    * the oracle unrolls the rounds CTE-for-CTE including the
    * convergence carry.
    */
  private def qGkIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.gearyKhamis(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", iters = 12, tol = 1e-6)
      .orderBy(col("period"))

  /** Unrolled-CTE replay of [[graft.ops.PriceIndex.gearyKhamis]]'s
    * fixed-point sweeps INCLUDING the convergence early-exit (the
    * k-means oracle discipline): round r derives international prices πᵢ
    * from level vector P(r-1), then P(r) from π — all micro-quantized
    * integer sums, double ratios in the same operation order as the
    * operator, so the level vectors are bit-identical and the
    * `max |ΔP| < tol` test evaluates the same here as on the driver.
    * Once a round's `st` flag is set, later rounds CARRY the vector
    * forward (exactly the operator's "stop sweeping"), and `iters_run`
    * is the first converged round (else `iters`).
    */
  private def gkOracleSql(iters: Int, tol: Double): String = {
    val head =
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q0
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS MATERIALIZED (
        |  SELECT it, pd,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q0) AS DOUBLE) AS p,
        |    CAST(SUM(q0) AS DOUBLE) AS q,
        |    CAST(round(CAST(SUM(q0) AS DOUBLE) * 1000000.0) AS BIGINT) AS qm,
        |    CAST(round((CAST(SUM(e) AS DOUBLE) / CAST(SUM(q0) AS DOUBLE))
        |      * CAST(SUM(q0) AS DOUBLE) * 1000000.0) AS BIGINT) AS pqm
        |  FROM li GROUP BY 1, 2),
        |lv0 AS (SELECT DISTINCT pd, CAST(1.0 AS DOUBLE) AS plev FROM uv)""".stripMargin
    def piSql(r: Int) =
      s"""pi$r AS MATERIALIZED (
         |  SELECT it,
         |    CAST(CAST(SUM(CAST(round(((p / plev) * q) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(SUM(qm) AS BIGINT) AS DOUBLE) AS piv
         |  FROM uv JOIN lv${r - 1} USING (pd) GROUP BY it)""".stripMargin
    def sweepSql(r: Int, into: String) =
      s"""$into AS MATERIALIZED (
         |  SELECT pd,
         |    CAST(CAST(SUM(pqm) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(SUM(CAST(round((piv * q) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) AS plev
         |  FROM uv JOIN pi$r USING (it) GROUP BY pd)""".stripMargin
    def stSql(r: Int) = {
      val prevDone = if (r == 1) "FALSE" else s"(SELECT done FROM st${r - 1})"
      s"""st$r AS MATERIALIZED (
         |  SELECT ($prevDone OR (SELECT MAX(ABS(a.plev - b.plev))
         |    FROM lv$r a JOIN lv${r - 1} b USING (pd)) < $tol) AS done)""".stripMargin
    }
    val rounds = (1 to iters).map { r =>
      val body =
        if (r == 1) piSql(1) + ",\n" + sweepSql(1, "lv1") // round 1 never carries
        else
          piSql(r) + ",\n" + sweepSql(r, s"lvc$r") + ",\n" +
            s"""lv$r AS MATERIALIZED (
               |  SELECT p.pd,
               |    CASE WHEN (SELECT done FROM st${r - 1}) THEN p.plev ELSE c.plev END AS plev
               |  FROM lv${r - 1} p JOIN lvc$r c USING (pd))""".stripMargin
      body + ",\n" + stSql(r)
    }
    val irRows = (1 to iters)
      .map(r => s"($r, (SELECT done FROM st$r))").mkString(", ")
    val tail =
      s""",
         |cnt AS (SELECT pd, COUNT(*) AS n_items FROM uv GROUP BY pd),
         |b AS (SELECT plev AS basep FROM lv$iters ORDER BY pd LIMIT 1),
         |ir AS (SELECT CAST(COALESCE(MIN(r), $iters) AS BIGINT) AS iters_run
         |       FROM (VALUES $irRows) AS t(r, d) WHERE d)
         |SELECT lv$iters.pd AS period, cnt.n_items, round(lv$iters.plev / b.basep, 6) AS gk,
         |  (SELECT iters_run FROM ir) AS iters_run
         |FROM lv$iters JOIN cnt USING (pd), b ORDER BY period""".stripMargin
    head + ",\n" + rounds.mkString(",\n") + tail
  }

  /** Time-Product-Dummy multilateral index ([[graft.ops.PriceIndex
    * .timeProductDummy]]): the fixed-effects regression member of the
    * multilateral family — Gauss-Seidel sweeps of the share-weighted
    * normal equations over the 1995 panel, run to convergence
    * (max |Δδ| < 1000 nanos = 1e-6 in log space, publication precision)
    * under a 12-sweep cap, the data-dependent count emitted as
    * `iters_run`. With q_geks_index and q_gk_index, the full
    * multilateral toolkit (GEKS, GK, TPD). The oracle unrolls the
    * sweeps CTE-for-CTE including the convergence carry.
    */
  private def qTpdIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.timeProductDummy(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", iters = 12, tolNanos = 1000L)
      .orderBy(col("period"))

  /** Unrolled-CTE replay of [[graft.ops.PriceIndex.timeProductDummy]]'s
    * Gauss-Seidel sweeps INCLUDING the convergence early-exit: round r's
    * period effects from round r-1's item effects (round 1 from zero),
    * nano-quantized terms, exact BIGINT sums throughout — so the
    * `max |Δδ| < tolNanos` test is pure integer arithmetic that
    * evaluates identically here and on the driver. From round 3 on, a
    * set `st` flag makes the round CARRY δ forward (the operator's
    * "stop sweeping"); `iters_run` is the first converged round (else
    * `iters`). The movement check starts at round 2 (round 1 has no
    * previous δ vector), exactly like the operator.
    */
  private def tpdOracleSql(iters: Int, tolNanos: Long): String = {
    val head =
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q0
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv0 AS (
        |  SELECT it, pd,
        |    ln(CAST(SUM(e) AS DOUBLE) / CAST(SUM(q0) AS DOUBLE)) AS lnp,
        |    CAST(round(CAST(SUM(e) AS DOUBLE) * 1000000.0) AS BIGINT) AS em
        |  FROM li GROUP BY 1, 2),
        |tot AS (SELECT pd, CAST(SUM(em) AS BIGINT) AS tot FROM uv0 GROUP BY pd),
        |uv AS MATERIALIZED (
        |  SELECT it, pd, lnp,
        |    CAST(em AS DOUBLE) / CAST(tot AS DOUBLE) AS s,
        |    CAST(round((CAST(em AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000000.0) AS BIGINT) AS sn
        |  FROM uv0 JOIN tot USING (pd))""".stripMargin
    def dCompute(r: Int, into: String) =
      if (r == 1)
        s"""$into AS MATERIALIZED (
           |  SELECT pd,
           |    CAST(SUM(CAST(round((s * (lnp - 0.0)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS dn
           |  FROM uv GROUP BY pd)""".stripMargin
      else
        s"""$into AS MATERIALIZED (
           |  SELECT pd,
           |    CAST(SUM(CAST(round((s * (lnp - g)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS dn
           |  FROM uv JOIN g${r - 1} USING (it) GROUP BY pd)""".stripMargin
    def gSql(r: Int) =
      s"""g$r AS MATERIALIZED (
         |  SELECT it,
         |    CAST(CAST(SUM(CAST(round((s * (lnp
         |        - CAST(dn AS DOUBLE) / 1000000000.0)) * 1000000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |      / CAST(CAST(SUM(sn) AS BIGINT) AS DOUBLE) AS g
         |  FROM uv JOIN d$r USING (pd) GROUP BY it)""".stripMargin
    def stSql(r: Int) = {
      val prevDone = if (r == 2) "FALSE" else s"(SELECT done FROM st${r - 1})"
      s"""st$r AS MATERIALIZED (
         |  SELECT ($prevDone OR (SELECT MAX(ABS(a.dn - b.dn))
         |    FROM d$r a JOIN d${r - 1} b USING (pd)) < $tolNanos) AS done)""".stripMargin
    }
    val rounds = (1 to iters).map { r =>
      val dExpr =
        if (r <= 2) dCompute(r, s"d$r") // rounds 1-2 always compute (check starts at 2)
        else
          dCompute(r, s"dc$r") + ",\n" +
            s"""d$r AS MATERIALIZED (
               |  SELECT p.pd,
               |    CASE WHEN (SELECT done FROM st${r - 1}) THEN p.dn ELSE c.dn END AS dn
               |  FROM d${r - 1} p JOIN dc$r c USING (pd))""".stripMargin
      val withSt = if (r >= 2) dExpr + ",\n" + stSql(r) else dExpr
      if (r == iters) withSt else withSt + ",\n" + gSql(r)
    }
    val irRows = (2 to iters)
      .map(r => s"($r, (SELECT done FROM st$r))").mkString(", ")
    val irCte =
      if (iters >= 2)
        s"""ir AS (SELECT CAST(COALESCE(MIN(r), $iters) AS BIGINT) AS iters_run
           |       FROM (VALUES $irRows) AS t(r, d) WHERE d),""".stripMargin
      else s"ir AS (SELECT CAST(1 AS BIGINT) AS iters_run),"
    val tail =
      s""",
         |cnt AS (SELECT pd, COUNT(*) AS n_items FROM uv GROUP BY pd),
         |$irCte
         |b AS (SELECT dn AS dbase FROM d$iters ORDER BY pd LIMIT 1)
         |SELECT d$iters.pd AS period, cnt.n_items,
         |  round(exp(CAST(d$iters.dn - b.dbase AS DOUBLE) / 1000000000.0), 6) AS tpd,
         |  (SELECT iters_run FROM ir) AS iters_run
         |FROM d$iters JOIN cnt USING (pd), b ORDER BY period""".stripMargin
    head + ",\n" + rounds.mkString(",\n") + tail
  }

  /** Bilateral price indexes ([[graft.ops.PriceIndex.bilateralIndexes]]):
    * monthly Laspeyres/Paasche/Fisher for 1995 part prices vs the
    * 1995-01 base basket — the reference's consumer-prices domain as one
    * decimal-exact aggregation chain (unit values from decimal sums,
    * micro-quantized index terms, 6-dp emitted ratios).
    */
  private def qPriceIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.bilateralIndexes(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Bortkiewicz gap decomposition
    * ([[graft.ops.PriceIndex.bortkiewicz]]) on q_price_index's 1995
    * monthly panel: WHY Paasche trails Laspeyres — the gap equals the
    * weighted covariance of price and quantity relatives, so the
    * substitution story (consumers fleeing price rises) becomes one
    * auditable correlation per period. Same unit-value machinery, six
    * micro-quantized weighted sums, one period reduction.
    */
  private def qBortkiewicz(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.bortkiewicz(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Lowe and Young indexes ([[graft.ops.PriceIndex.loweYoung]]): price
    * reference 1995-01, weight reference 1995-02 — the CPI's
    * price/weight-period split (a Laspeyres is the degenerate case
    * where they coincide). Triple-matched basket, micro-quantized
    * terms, 6-dp ratios.
    */
  private def qLoweYoung(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.loweYoung(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity",
        basePeriod = "1995-01", weightPeriod = "1995-02")
      .orderBy(col("period"))

  /** Laspeyres contribution decomposition
    * ([[graft.ops.PriceIndex.laspeyresContributions]]): per-item index
    * points vs the 1995-01 base, the "what drove the rate" table. Kept
    * to the items that moved (|contrib| >= 0.001 pts — the filter is in
    * the oracle too); PriceIndexSpec pins the exact-additivity law
    * Σ contrib = 100·(L−1) on the unfiltered frame.
    */
  private def qIndexContrib(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.laspeyresContributions(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .filter(abs(col("contrib_pts")) >= 0.001)
      .orderBy(col("period"), col("item"))

  /** Elementary index formulas ([[graft.ops.PriceIndex.elementaryIndexes]]):
    * the unweighted Carli/Dutot/Jevons layer below q_price_index, same
    * matched 1995 sample. Jevons' geometric mean goes through per-item
    * quantized `ln` sums and ONE final `exp`, 6-dp emitted.
    */
  private def qElementaryIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.elementaryIndexes(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Chain-linked Laspeyres ([[graft.ops.PriceIndex.chainedIndex]]):
    * month-on-month links from consecutive matched samples over 1995-1996,
    * chained by exact prefix sums of quantized log-links (one final exp).
    */
  private def qChainedIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.chainedIndex(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")).isin(1995, 1996)),
        "l_partkey", to_date(date_trunc("MM", col("l_shipdate"))),
        "l_extendedprice", "l_quantity")
      .orderBy(col("period"))

  /** Tukey-cleansed Jevons ([[graft.ops.PriceIndex.cleansedJevons]]): the
    * ONS-style validation gate between collection and compilation —
    * price relatives outside their per-period Tukey fences drop before
    * the geometric mean; both raw and cleansed indexes emit.
    */
  private def qCleansedIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.cleansedJevons(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Carry-forward-imputed Laspeyres ([[graft.ops.PriceIndex
    * .imputedIndex]]): the fixed 1995-01 basket with uncollected prices
    * filled forward — n_items stays the full basket every month and the
    * imputation count emits alongside the index.
    */
  private def qImputedIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.imputedIndex(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Superlative indexes ([[graft.ops.PriceIndex.superlativeIndexes]]):
    * Törnqvist and Walsh for the 1995 matched sample — with Fisher from
    * q_price_index, the full textbook superlative set; the three should
    * (and do) track each other closely, a built-in cross-check.
    */
  private def qSuperlativeIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.superlativeIndexes(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Formula-sensitivity sweep ([[graft.ops.PriceIndex
    * .extendedBilateral]]): Marshall-Edgeworth, Palgrave, geometric and
    * harmonic Laspeyres for the 1995 matched sample — with
    * q_price_index's Laspeyres/Paasche/Fisher and q_superlative_index's
    * Törnqvist/Walsh, the COMPLETE textbook bilateral set; the
    * HL ≤ GL ≤ L ≤ Palgrave ordering under substitution is the
    * methodological spread a formula decision reads.
    */
  private def qMeIndex(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.extendedBilateral(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Sato-Vartia ideal log-change index ([[graft.ops.PriceIndex
    * .satoVartia]]): logarithmic-mean share weights over the same 1995
    * matched sample — the CES-exact cross-check beside q_superlative's
    * Törnqvist, with the weight-sum normalization emitted (≤ 1 by
    * concavity of the log-mean).
    */
  private def qSatoVartia(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.satoVartia(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("period"))

  /** Lloyd-Moulton CES index ([[graft.ops.PriceIndex.lloydMoulton]])
    * at σ = 0.5: the real-time substitution-bias correction (needs only
    * base shares — no current quantities) that published CPIs tune so
    * P_LM tracks the retrospective superlative; σ = 0.5 sits halfway
    * between Laspeyres (σ=0) and geometric Laspeyres (σ→1).
    */
  private def qLloydMoulton(s: SparkSession, dir: String): DataFrame =
    graft.ops.PriceIndex.lloydMoulton(
        t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995),
        "l_partkey", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01",
        sigma = 0.5)
      .orderBy(col("period"))

  /** Two-level CPI build ([[graft.ops.PriceIndex.groupedLaspeyres]]):
    * per-brand sub-indexes with base-expenditure weights — the
    * published-aggregate structure; the weighted mean of these rows
    * reproduces q_price_index's all-items Laspeyres (decomposition law,
    * PriceIndexSpec). The part dimension broadcasts.
    */
  private def qGroupedIndex(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995)
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    graft.ops.PriceIndex.groupedLaspeyres(
        li.join(broadcast(p), li("l_partkey") === p("p_partkey")),
        "l_partkey", "p_brand", date_format(col("l_shipdate"), "yyyy-MM"),
        "l_extendedprice", "l_quantity", basePeriod = "1995-01")
      .orderBy(col("p_brand"), col("period"))
  }

  /** Hedonic quality-adjusted index ([[graft.ops.PriceIndex
    * .hedonicIndex]]): 1995 unit prices regressed on p_size within
    * p_brand fixed effects (Frisch-Waugh demeaning, no solver), then
    * the monthly index of quality-ADJUSTED log prices — the "did the
    * product change or the price?" decomposition ONS web-scraped
    * pipelines need when specifications churn. The part dimension
    * broadcasts; everything else is windows + aggregations.
    */
  private def qHedonicIndex(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1995)
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_size"))
    graft.ops.PriceIndex.hedonicIndex(
        li.join(broadcast(p), li("l_partkey") === p("p_partkey")),
        date_format(col("l_shipdate"), "yyyy-MM"), col("p_brand"),
        col("p_size"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("period"))
  }

  /** This family's slice of [[graft.SparkEntry.queries]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hedonic_index" -> (qHedonicIndex _),
    "q_geks_index" -> (qGeksIndex _),
    "q_geks_half" -> (qGeksHalf _),
    "q_gk_index" -> (qGkIndex _),
    "q_geks_movement" -> (qGeksMovement _),
    "q_tpd_index" -> (qTpdIndex _),
    "q_weight_audit" -> (qWeightAudit _),
    "q_price_index" -> (qPriceIndex _),
    "q_bortkiewicz" -> (qBortkiewicz _),
    "q_lowe_young" -> (qLoweYoung _),
    "q_index_contrib" -> (qIndexContrib _),
    "q_elementary_index" -> (qElementaryIndex _),
    "q_chained_index" -> (qChainedIndex _),
    "q_cleansed_index" -> (qCleansedIndex _),
    "q_imputed_index" -> (qImputedIndex _),
    "q_superlative_index" -> (qSuperlativeIndex _),
    "q_me_index" -> (qMeIndex _),
    "q_sato_vartia" -> (qSatoVartia _),
    "q_lloyd_moulton" -> (qLloydMoulton _),
    "q_grouped_index" -> (qGroupedIndex _),
  )

  /** This family's slice of [[graft.SparkEntry.oracleSql]]. */
  def oracleSql: Map[String, String] = Map(
    "q_hedonic_index" ->
      """WITH li AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS pd, p_brand AS fe,
        |    CAST(round(p_size * 1000000.0) AS HUGEINT) AS s,
        |    CAST(round(l_extendedprice * 1000000.0) AS HUGEINT) AS pm,
        |    CAST(round(l_quantity * 1000000.0) AS HUGEINT) AS qm
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1995),
        |b AS (
        |  SELECT pd, fe, s,
        |    CAST(round((ln(CAST(pm AS DOUBLE)) - ln(CAST(qm AS DOUBLE)))
        |      * 1000000000.0) AS HUGEINT) AS y
        |  FROM li
        |  WHERE pd IS NOT NULL AND fe IS NOT NULL AND s IS NOT NULL
        |    AND pm > 0 AND qm > 0),
        |w AS (
        |  SELECT pd, s, y,
        |    CAST(COUNT(*) OVER (PARTITION BY fe) AS HUGEINT) AS n,
        |    SUM(y) OVER (PARTITION BY fe) AS sy,
        |    SUM(s) OVER (PARTITION BY fe) AS ss
        |  FROM b),
        |dm AS (
        |  SELECT pd, y, s,
        |    CAST(round(CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS HUGEINT) AS yd,
        |    CAST(round(CAST(s AS DOUBLE) - CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) AS HUGEINT) AS sd
        |  FROM w),
        |bt AS (SELECT SUM(yd * sd) AS num, SUM(sd * sd) AS den FROM dm),
        |adj AS (
        |  SELECT pd,
        |    CAST(round(CAST(y AS DOUBLE)
        |      - (CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |              ELSE 0.0 END) * CAST(s AS DOUBLE)) AS HUGEINT) AS a,
        |    CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |         ELSE 0.0 END AS braw
        |  FROM dm CROSS JOIN bt),
        |pp AS (
        |  SELECT pd, COUNT(*) AS n, SUM(a) AS sa, ANY_VALUE(braw) AS braw
        |  FROM adj GROUP BY 1),
        |pmn AS (SELECT pd, n, braw, CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS am FROM pp),
        |b0 AS (SELECT am AS am0 FROM pmn ORDER BY pd LIMIT 1)
        |SELECT pd AS period, CAST(n AS BIGINT) AS n,
        |  round(braw / 1000.0, 6) AS beta,
        |  round(exp((am - am0) / 1000000000.0), 6) AS "index"
        |FROM pmn CROSS JOIN b0 ORDER BY pd""".stripMargin,
    "q_gk_index" -> gkOracleSql(iters = 12, tol = 1e-6),
    "q_geks_movement" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p
        |  FROM li GROUP BY 1, 2),
        |months AS (
        |  SELECT pd, CAST(row_number() OVER (ORDER BY pd) AS BIGINT) - 1 AS m
        |  FROM (SELECT DISTINCT pd FROM uv)),
        |nm AS (SELECT MAX(m) AS maxm, LEAST(CAST(13 AS BIGINT), MAX(m) + 1) AS w FROM months),
        |uvm AS (SELECT uv.*, months.m FROM uv JOIN months USING (pd)),
        |pr AS (
        |  SELECT a.m AS ma, b.m AS mb,
        |    CAST(round(a.ed * 1000000.0) AS BIGINT) AS eam,
        |    CAST(round(b.ed * 1000000.0) AS BIGINT) AS ebm,
        |    a.p AS pa, b.p AS pb
        |  FROM uvm a JOIN uvm b ON a.it = b.it AND b.m > a.m AND b.m <= a.m + 12),
        |terms AS (
        |  SELECT ma, mb,
        |    CAST(round(((CAST(eam AS DOUBLE) / CAST(SUM(eam) OVER (PARTITION BY ma, mb) AS DOUBLE)
        |      + CAST(ebm AS DOUBLE) / CAST(SUM(ebm) OVER (PARTITION BY ma, mb) AS DOUBLE)) / 2.0
        |      * ln(pb / pa)) * 1000000000.0) AS BIGINT) AS tn
        |  FROM pr),
        |lnt0 AS (SELECT ma, mb, SUM(tn) AS lnt FROM terms GROUP BY 1, 2),
        |lnt AS (
        |  SELECT ma, mb, lnt FROM lnt0
        |  UNION ALL SELECT mb, ma, -lnt FROM lnt0
        |  UNION ALL SELECT m, m, CAST(0 AS BIGINT) FROM months),
        |g0 AS (
        |  SELECT b.mb AS t,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lnp
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE a.ma = 0 AND a.mb < (SELECT w FROM nm) AND b.mb < (SELECT w FROM nm)
        |  GROUP BY 1),
        |gw AS (
        |  SELECT a.ma AS z, b.mb AS tgt,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lng
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE b.mb >= (SELECT w FROM nm)
        |    AND a.mb BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb
        |    AND a.ma BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb - 1
        |  GROUP BY 1, 2),
        |mov AS (
        |  SELECT (SELECT w FROM nm) - 1 AS tt,
        |         (SELECT lnp FROM g0 WHERE t = (SELECT w FROM nm) - 1) AS lnp
        |  UNION ALL
        |  SELECT s.tt + 1,
        |    s.lnp + (SELECT g.lng FROM gw g WHERE g.tgt = s.tt + 1 AND g.z = s.tt)
        |  FROM mov s WHERE s.tt < (SELECT maxm FROM nm)),
        |pub AS (
        |  SELECT t AS m, lnp FROM g0 WHERE t < (SELECT w FROM nm) - 1
        |  UNION ALL SELECT tt, lnp FROM mov)
        |SELECT months.pd AS period,
        |  round(exp(CAST(pub.lnp AS DOUBLE) / 1000000000.0), 6) AS geks
        |FROM months JOIN pub ON months.m = pub.m
        |ORDER BY period""".stripMargin,
    "q_tpd_index" -> tpdOracleSql(iters = 12, tolNanos = 1000L),
    // half splice: the recursion carries the published list (like the
    // mean splice) but appends ONE exact integer add from the overlap
    // period half a window back (z = T - w//2)
    "q_geks_half" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p
        |  FROM li GROUP BY 1, 2),
        |months AS (
        |  SELECT pd, CAST(row_number() OVER (ORDER BY pd) AS BIGINT) - 1 AS m
        |  FROM (SELECT DISTINCT pd FROM uv)),
        |nm AS (SELECT MAX(m) AS maxm, LEAST(CAST(13 AS BIGINT), MAX(m) + 1) AS w FROM months),
        |uvm AS (SELECT uv.*, months.m FROM uv JOIN months USING (pd)),
        |pr AS (
        |  SELECT a.m AS ma, b.m AS mb,
        |    CAST(round(a.ed * 1000000.0) AS BIGINT) AS eam,
        |    CAST(round(b.ed * 1000000.0) AS BIGINT) AS ebm,
        |    a.p AS pa, b.p AS pb
        |  FROM uvm a JOIN uvm b ON a.it = b.it AND b.m > a.m AND b.m <= a.m + 12),
        |terms AS (
        |  SELECT ma, mb,
        |    CAST(round(((CAST(eam AS DOUBLE) / CAST(SUM(eam) OVER (PARTITION BY ma, mb) AS DOUBLE)
        |      + CAST(ebm AS DOUBLE) / CAST(SUM(ebm) OVER (PARTITION BY ma, mb) AS DOUBLE)) / 2.0
        |      * ln(pb / pa)) * 1000000000.0) AS BIGINT) AS tn
        |  FROM pr),
        |lnt0 AS (SELECT ma, mb, SUM(tn) AS lnt FROM terms GROUP BY 1, 2),
        |lnt AS (
        |  SELECT ma, mb, lnt FROM lnt0
        |  UNION ALL SELECT mb, ma, -lnt FROM lnt0
        |  UNION ALL SELECT m, m, CAST(0 AS BIGINT) FROM months),
        |g0 AS (
        |  SELECT b.mb AS t,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lnp
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE a.ma = 0 AND a.mb < (SELECT w FROM nm) AND b.mb < (SELECT w FROM nm)
        |  GROUP BY 1),
        |gw AS (
        |  SELECT a.ma AS z, b.mb AS tgt,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lng
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE b.mb >= (SELECT w FROM nm)
        |    AND a.mb BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb
        |    AND a.ma BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb - 1
        |  GROUP BY 1, 2),
        |spl AS (
        |  SELECT (SELECT w FROM nm) - 1 AS tt,
        |         (SELECT list(lnp ORDER BY t) FROM g0) AS hist
        |  UNION ALL
        |  SELECT s.tt + 1,
        |    list_append(s.hist, (
        |      SELECT s.hist[CAST(g.z AS INT) + 1] + g.lng
        |      FROM gw g WHERE g.tgt = s.tt + 1
        |        AND g.z = s.tt + 1 - (SELECT w FROM nm) // 2))
        |  FROM spl s WHERE s.tt < (SELECT maxm FROM nm)),
        |fin AS (SELECT hist FROM spl WHERE tt = (SELECT maxm FROM nm))
        |SELECT months.pd AS period,
        |  round(exp(CAST(f.hist[CAST(months.m AS INT) + 1] AS DOUBLE) / 1000000000.0), 6) AS geks
        |FROM months, fin f
        |ORDER BY period""".stripMargin,
    // GEKS: pairwise quantized Törnqvist log-terms, window means and the
    // mean-splice recurrence in integer HALF_UP arithmetic; the recursive
    // CTE carries the published log-series as a growing list
    "q_geks_index" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p
        |  FROM li GROUP BY 1, 2),
        |months AS (
        |  SELECT pd, CAST(row_number() OVER (ORDER BY pd) AS BIGINT) - 1 AS m
        |  FROM (SELECT DISTINCT pd FROM uv)),
        |nm AS (SELECT MAX(m) AS maxm, LEAST(CAST(13 AS BIGINT), MAX(m) + 1) AS w FROM months),
        |uvm AS (SELECT uv.*, months.m FROM uv JOIN months USING (pd)),
        |pr AS (
        |  SELECT a.m AS ma, b.m AS mb,
        |    CAST(round(a.ed * 1000000.0) AS BIGINT) AS eam,
        |    CAST(round(b.ed * 1000000.0) AS BIGINT) AS ebm,
        |    a.p AS pa, b.p AS pb
        |  FROM uvm a JOIN uvm b ON a.it = b.it AND b.m > a.m AND b.m <= a.m + 12),
        |terms AS (
        |  SELECT ma, mb,
        |    CAST(round(((CAST(eam AS DOUBLE) / CAST(SUM(eam) OVER (PARTITION BY ma, mb) AS DOUBLE)
        |      + CAST(ebm AS DOUBLE) / CAST(SUM(ebm) OVER (PARTITION BY ma, mb) AS DOUBLE)) / 2.0
        |      * ln(pb / pa)) * 1000000000.0) AS BIGINT) AS tn
        |  FROM pr),
        |lnt0 AS (SELECT ma, mb, SUM(tn) AS lnt FROM terms GROUP BY 1, 2),
        |lnt AS (
        |  SELECT ma, mb, lnt FROM lnt0
        |  UNION ALL SELECT mb, ma, -lnt FROM lnt0
        |  UNION ALL SELECT m, m, CAST(0 AS BIGINT) FROM months),
        |g0 AS (
        |  SELECT b.mb AS t,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lnp
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE a.ma = 0 AND a.mb < (SELECT w FROM nm) AND b.mb < (SELECT w FROM nm)
        |  GROUP BY 1),
        |gw AS (
        |  SELECT a.ma AS z, b.mb AS tgt,
        |    CAST(round(SUM(a.lnt + b.lnt) / CAST((SELECT w FROM nm) AS DOUBLE)) AS BIGINT) AS lng
        |  FROM lnt a JOIN lnt b ON a.mb = b.ma
        |  WHERE b.mb >= (SELECT w FROM nm)
        |    AND a.mb BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb
        |    AND a.ma BETWEEN b.mb - (SELECT w FROM nm) + 1 AND b.mb - 1
        |  GROUP BY 1, 2),
        |spl AS (
        |  SELECT (SELECT w FROM nm) - 1 AS tt,
        |         (SELECT list(lnp ORDER BY t) FROM g0) AS hist
        |  UNION ALL
        |  SELECT s.tt + 1,
        |    list_append(s.hist, (
        |      SELECT CAST(round(SUM(s.hist[CAST(g.z AS INT) + 1] + g.lng)
        |        / CAST((SELECT w FROM nm) - 1 AS DOUBLE)) AS BIGINT)
        |      FROM gw g WHERE g.tgt = s.tt + 1))
        |  FROM spl s WHERE s.tt < (SELECT maxm FROM nm)),
        |fin AS (SELECT hist FROM spl WHERE tt = (SELECT maxm FROM nm))
        |SELECT months.pd AS period,
        |  round(exp(CAST(f.hist[CAST(months.m AS INT) + 1] AS DOUBLE) / 1000000000.0), 6) AS geks
        |FROM months, fin f
        |ORDER BY period""".stripMargin,
    "q_weight_audit" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, p_brand, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, p_brand, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2, 3),
        |base AS (SELECT it, p_brand, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.p_brand, uv.pd, uv.p, b.p0, b.q0
        |  FROM uv JOIN base b USING (it, p_brand)),
        |agg AS (
        |  SELECT p_brand, pd AS period,
        |    CAST(SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS BIGINT) AS weight_micro
        |  FROM j GROUP BY 1, 2),
        |sh AS (
        |  SELECT p_brand, period, weight_micro,
        |    CAST(weight_micro AS DOUBLE)
        |      / CAST(SUM(weight_micro) OVER (PARTITION BY period) AS DOUBLE) AS share
        |  FROM agg),
        |b0 AS (SELECT p_brand, share AS share0 FROM sh WHERE period = '1995-01')
        |SELECT period, COUNT(*) AS n_groups,
        |  CAST(SUM(weight_micro) AS BIGINT) AS total_weight_micro,
        |  round(CAST(SUM(CAST(round(share * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |    / 1000000000.0, 6) AS share_sum,
        |  round(MAX(abs(share - share0)), 6) AS max_share_drift
        |FROM sh JOIN b0 USING (p_brand)
        |GROUP BY 1 ORDER BY period""".stripMargin,
    // the index chain replays exactly: decimal sums, one double division
    // per unit value, micro-quantized terms, integer sums, 6-dp ratios
    "q_grouped_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, p_brand, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, p_brand, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2, 3),
        |base AS (SELECT it, p_brand, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.p_brand, uv.pd, uv.p, b.p0, b.q0
        |  FROM uv JOIN base b USING (it, p_brand)),
        |agg AS (
        |  SELECT p_brand, pd AS period, COUNT(*) AS n_items,
        |    SUM(CAST(round(p * q0 * 1000000.0) AS BIGINT)) AS numL,
        |    CAST(SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS BIGINT) AS weight_micro
        |  FROM j GROUP BY 1, 2)
        |SELECT p_brand, period, n_items, weight_micro,
        |  round(CAST(numL AS DOUBLE) / CAST(weight_micro AS DOUBLE), 6) AS laspeyres
        |FROM agg ORDER BY p_brand, period""".stripMargin,
    "q_superlative_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, ed AS e0, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.pd, uv.ed, uv.p, uv.qd, b.e0, b.p0, b.q0,
        |    CAST(round(b.e0 * 1000000.0) AS BIGINT) AS e0m,
        |    CAST(round(uv.ed * 1000000.0) AS BIGINT) AS etm
        |  FROM uv JOIN base b USING (it)),
        |t AS (
        |  SELECT pd,
        |    CAST(round(((CAST(e0m AS DOUBLE) / CAST(SUM(e0m) OVER (PARTITION BY pd) AS DOUBLE)
        |        + CAST(etm AS DOUBLE) / CAST(SUM(etm) OVER (PARTITION BY pd) AS DOUBLE)) / 2.0
        |        * ln(p / p0)) * 1000000000.0) AS BIGINT) AS tn,
        |    CAST(round((sqrt(q0 * qd) * p) * 1000000.0) AS BIGINT) AS wn,
        |    CAST(round((sqrt(q0 * qd) * p0) * 1000000.0) AS BIGINT) AS wd
        |  FROM j),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(tn) AS t, SUM(wn) AS n, SUM(wd) AS d
        |  FROM t GROUP BY 1)
        |SELECT period, n_items,
        |  round(exp(CAST(t AS DOUBLE) / 1000000000.0), 6) AS tornqvist,
        |  round(CAST(n AS DOUBLE) / CAST(d AS DOUBLE), 6) AS walsh
        |FROM agg ORDER BY period""".stripMargin,
    "q_me_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, ed AS e0, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.pd, uv.p, uv.qd, b.p0, b.q0,
        |    CAST(round(uv.ed * 1000000.0) AS BIGINT) AS etm,
        |    CAST(round(b.e0 * 1000000.0) AS BIGINT) AS e0m,
        |    SUM(CAST(round(uv.ed * 1000000.0) AS BIGINT)) OVER (PARTITION BY uv.pd) AS E,
        |    SUM(CAST(round(b.e0 * 1000000.0) AS BIGINT)) OVER (PARTITION BY uv.pd) AS E0
        |  FROM uv JOIN base b USING (it)),
        |t AS (
        |  SELECT pd,
        |    CAST(round(p * (q0 + qd) * 1000000.0) AS BIGINT) AS men,
        |    CAST(round(p0 * (q0 + qd) * 1000000.0) AS BIGINT) AS med,
        |    CAST(round((CAST(etm AS DOUBLE) / CAST(E AS DOUBLE)) * (p / p0)
        |      * 1000000000.0) AS BIGINT) AS pal,
        |    CAST(round((CAST(e0m AS DOUBLE) / CAST(E0 AS DOUBLE)) * ln(p / p0)
        |      * 1000000000.0) AS BIGINT) AS gl,
        |    CAST(round((CAST(e0m AS DOUBLE) / CAST(E0 AS DOUBLE)) / (p / p0)
        |      * 1000000000.0) AS BIGINT) AS hl
        |  FROM j),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(men) AS n, SUM(med) AS d, SUM(pal) AS p,
        |    SUM(gl) AS g, SUM(hl) AS h
        |  FROM t GROUP BY 1)
        |SELECT period, n_items,
        |  round(CAST(n AS DOUBLE) / CAST(d AS DOUBLE), 6) AS marshall_edgeworth,
        |  round(CAST(p AS DOUBLE) / 1000000000.0, 6) AS palgrave,
        |  round(exp(CAST(g AS DOUBLE) / 1000000000.0), 6) AS geom_laspeyres,
        |  round(1000000000.0 / CAST(h AS DOUBLE), 6) AS harmonic_laspeyres
        |FROM agg ORDER BY period""".stripMargin,
    "q_sato_vartia" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, ed AS e0, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.pd, uv.p, b.p0,
        |    CAST(round(uv.ed * 1000000.0) AS BIGINT) AS etm,
        |    CAST(round(b.e0 * 1000000.0) AS BIGINT) AS e0m,
        |    SUM(CAST(round(uv.ed * 1000000.0) AS BIGINT)) OVER (PARTITION BY uv.pd) AS E,
        |    SUM(CAST(round(b.e0 * 1000000.0) AS BIGINT)) OVER (PARTITION BY uv.pd) AS E0
        |  FROM uv JOIN base b USING (it)),
        |w AS (
        |  SELECT pd,
        |    CASE WHEN round(CAST(etm AS DOUBLE) * 1000000.0 / CAST(E AS DOUBLE))
        |            = round(CAST(e0m AS DOUBLE) * 1000000.0 / CAST(E0 AS DOUBLE))
        |      THEN CAST(etm AS DOUBLE) / CAST(E AS DOUBLE)
        |      ELSE (CAST(etm AS DOUBLE) / CAST(E AS DOUBLE)
        |            - CAST(e0m AS DOUBLE) / CAST(E0 AS DOUBLE))
        |        / (ln(CAST(etm AS DOUBLE) / CAST(E AS DOUBLE))
        |            - ln(CAST(e0m AS DOUBLE) / CAST(E0 AS DOUBLE)))
        |    END AS lw,
        |    ln(p / p0) AS lnr
        |  FROM j),
        |t AS (
        |  SELECT pd,
        |    CAST(round(lw * 1000000000.0) AS BIGINT) AS wq,
        |    CAST(round(lw * lnr * 1000000000.0) AS BIGINT) AS wl
        |  FROM w),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(wq) AS sw, SUM(wl) AS swl
        |  FROM t GROUP BY 1)
        |SELECT period, n_items,
        |  round(exp(CAST(swl AS DOUBLE) / CAST(sw AS DOUBLE)), 6) AS sato_vartia,
        |  round(CAST(sw AS DOUBLE) / 1000000000.0, 6) AS w_sum
        |FROM agg ORDER BY period""".stripMargin,
    "q_lloyd_moulton" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) AS ed,
        |    CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, ed AS e0, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (
        |  SELECT uv.pd, uv.p, b.p0,
        |    CAST(round(b.e0 * 1000000.0) AS BIGINT) AS e0m,
        |    SUM(CAST(round(b.e0 * 1000000.0) AS BIGINT)) OVER (PARTITION BY uv.pd) AS E0
        |  FROM uv JOIN base b USING (it)),
        |t AS (
        |  SELECT pd,
        |    CAST(round((CAST(e0m AS DOUBLE) / CAST(E0 AS DOUBLE))
        |      * pow(p / p0, 0.5) * 1000000000.0) AS BIGINT) AS tn
        |  FROM j),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items, SUM(tn) AS s
        |  FROM t GROUP BY 1)
        |SELECT period, n_items,
        |  round(pow(CAST(s AS DOUBLE) / 1000000000.0, 2.0), 6) AS lloyd_moulton
        |FROM agg ORDER BY period""".stripMargin,
    "q_imputed_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |periods AS (SELECT DISTINCT pd FROM uv WHERE pd >= '1995-01'),
        |panel AS (
        |  SELECT s.it, s.pd, s.p0, s.q0, uv.p AS p_obs,
        |    last_value(uv.p IGNORE NULLS)
        |      OVER (PARTITION BY s.it ORDER BY s.pd
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_fill
        |  FROM (SELECT b.it, p.pd, b.p0, b.q0 FROM base b CROSS JOIN periods p) s
        |  LEFT JOIN uv ON uv.it = s.it AND uv.pd = s.pd),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CASE WHEN p_obs IS NULL THEN 1 ELSE 0 END) AS n_imputed,
        |    SUM(CAST(round(p_fill * q0 * 1000000.0) AS BIGINT)) AS numL,
        |    SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS denL
        |  FROM panel GROUP BY 1)
        |SELECT period, n_items, CAST(n_imputed AS BIGINT) AS n_imputed,
        |  round(CAST(numL AS DOUBLE) / CAST(denL AS DOUBLE), 6) AS laspeyres
        |FROM agg ORDER BY period""".stripMargin,
    "q_cleansed_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0 FROM uv WHERE pd = '1995-01'),
        |rel AS (SELECT uv.pd, uv.p / b.p0 AS rel FROM uv JOIN base b USING (it)),
        |bq AS (
        |  SELECT pd, CAST(quantile_cont(rel, 0.25) AS DOUBLE) AS q1,
        |    CAST(quantile_cont(rel, 0.75) AS DOUBLE) AS q3
        |  FROM rel GROUP BY 1),
        |f AS (SELECT pd, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM bq),
        |fl AS (
        |  SELECT r.pd, r.rel, (r.rel < f.lo OR r.rel > f.hi) AS is_out
        |  FROM rel r JOIN f USING (pd)),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CASE WHEN NOT is_out THEN 1 ELSE 0 END) AS n_kept,
        |    SUM(CAST(round(ln(rel) * 1000000000.0) AS BIGINT)) AS slr_all,
        |    SUM(CASE WHEN NOT is_out
        |      THEN CAST(round(ln(rel) * 1000000000.0) AS BIGINT) ELSE 0 END) AS slr_kept
        |  FROM fl GROUP BY 1)
        |SELECT period, n_items, CAST(n_kept AS BIGINT) AS n_kept,
        |  round(exp(CAST(slr_all AS DOUBLE) / CAST(n_items AS DOUBLE) / 1000000000.0), 6) AS jevons,
        |  round(exp(CAST(slr_kept AS DOUBLE) / CAST(n_kept AS DOUBLE) / 1000000000.0), 6) AS jevons_cleansed
        |FROM agg ORDER BY period""".stripMargin,
    "q_chained_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, CAST(date_trunc('month', l_shipdate) AS DATE) AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |j AS (
        |  SELECT cur.pd, cur.p, prv.p AS pp, prv.qd AS pq
        |  FROM uv cur JOIN uv prv
        |    ON cur.it = prv.it AND prv.pd + INTERVAL 1 MONTH = cur.pd),
        |links AS (
        |  SELECT pd, COUNT(*) AS n_items,
        |    CAST(SUM(CAST(round(p * pq * 1000000.0) AS BIGINT)) AS DOUBLE)
        |      / CAST(SUM(CAST(round(pp * pq * 1000000.0) AS BIGINT)) AS DOUBLE) AS link
        |  FROM j GROUP BY 1),
        |ch AS (
        |  SELECT pd, n_items, link,
        |    SUM(CAST(round(ln(link) * 1000000000.0) AS BIGINT))
        |      OVER (ORDER BY pd ROWS UNBOUNDED PRECEDING) AS cln
        |  FROM links)
        |SELECT pd AS period, n_items, round(link, 6) AS link,
        |  round(exp(CAST(cln AS DOUBLE) / 1000000000.0), 6) AS chained
        |FROM ch ORDER BY period""".stripMargin,
    "q_elementary_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0 FROM uv WHERE pd = '1995-01'),
        |j AS (SELECT uv.pd, uv.p, b.p0 FROM uv JOIN base b USING (it)),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CAST(round((p / p0) * 1000000000.0) AS BIGINT)) AS sr,
        |    SUM(CAST(round(p * 1000000.0) AS BIGINT)) AS sp,
        |    SUM(CAST(round(p0 * 1000000.0) AS BIGINT)) AS sp0,
        |    SUM(CAST(round(ln(p / p0) * 1000000000.0) AS BIGINT)) AS slr
        |  FROM j GROUP BY 1)
        |SELECT period, n_items,
        |  round(CAST(sr AS DOUBLE) / CAST(n_items AS DOUBLE) / 1000000000.0, 6) AS carli,
        |  round(CAST(sp AS DOUBLE) / CAST(sp0 AS DOUBLE), 6) AS dutot,
        |  round(exp(CAST(slr AS DOUBLE) / CAST(n_items AS DOUBLE) / 1000000000.0), 6) AS jevons
        |FROM agg ORDER BY period""".stripMargin,
    "q_lowe_young" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0 FROM uv WHERE pd = '1995-01'),
        |wt AS (SELECT it, p AS pb, qd AS qb FROM uv WHERE pd = '1995-02'),
        |j AS (
        |  SELECT uv.pd, uv.p, b.p0, w.pb, w.qb
        |  FROM uv JOIN base b USING (it) JOIN wt w USING (it)),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CAST(round(p * qb * 1000000.0) AS BIGINT)) AS numLo,
        |    SUM(CAST(round(p0 * qb * 1000000.0) AS BIGINT)) AS denLo,
        |    SUM(CAST(round(pb * qb * (p / p0) * 1000000.0) AS BIGINT)) AS numY,
        |    SUM(CAST(round(pb * qb * 1000000.0) AS BIGINT)) AS denY
        |  FROM j GROUP BY 1)
        |SELECT period, n_items,
        |  round(CAST(numLo AS DOUBLE) / CAST(denLo AS DOUBLE), 6) AS lowe,
        |  round(CAST(numY AS DOUBLE) / CAST(denY AS DOUBLE), 6) AS young
        |FROM agg ORDER BY period""".stripMargin,
    "q_index_contrib" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |m AS (SELECT uv.pd, uv.it, uv.p, b.p0, b.q0 FROM uv JOIN base b USING (it)),
        |den AS (
        |  SELECT pd, SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS d
        |  FROM m GROUP BY 1),
        |c AS (
        |  SELECT m.pd AS period, m.it AS item,
        |    round(100.0 * CAST(CAST(round(p * q0 * 1000000.0) AS BIGINT)
        |                     - CAST(round(p0 * q0 * 1000000.0) AS BIGINT) AS DOUBLE)
        |          / CAST(den.d AS DOUBLE), 6) AS contrib_pts
        |  FROM m JOIN den USING (pd))
        |SELECT period, item, contrib_pts FROM c
        |WHERE abs(contrib_pts) >= 0.001
        |ORDER BY period, item""".stripMargin,
    "q_bortkiewicz" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (SELECT uv.pd, uv.p, uv.qd, b.p0, b.q0 FROM uv JOIN base b USING (it)),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS w,
        |    SUM(CAST(round(p0 * q0 * (p / p0) * 1000000.0) AS BIGINT)) AS wr,
        |    SUM(CAST(round(p0 * q0 * (qd / q0) * 1000000.0) AS BIGINT)) AS ws,
        |    SUM(CAST(round(p0 * q0 * (p / p0) * (qd / q0) * 1000000.0)
        |      AS BIGINT)) AS wrs,
        |    SUM(CAST(round(p0 * q0 * (p / p0) * (p / p0) * 1000000.0)
        |      AS BIGINT)) AS wrr,
        |    SUM(CAST(round(p0 * q0 * (qd / q0) * (qd / q0) * 1000000.0)
        |      AS BIGINT)) AS wss
        |  FROM j GROUP BY 1),
        |c AS (
        |  SELECT period, n_items,
        |    CAST(wr AS DOUBLE) / CAST(w AS DOUBLE) AS rbar,
        |    CAST(ws AS DOUBLE) / CAST(w AS DOUBLE) AS sbar,
        |    CAST(wrs AS DOUBLE) / CAST(w AS DOUBLE) AS mrs,
        |    CAST(wrr AS DOUBLE) / CAST(w AS DOUBLE) AS mrr,
        |    CAST(wss AS DOUBLE) / CAST(w AS DOUBLE) AS mss
        |  FROM agg)
        |SELECT period, n_items,
        |  round(rbar, 6) AS laspeyres,
        |  round(sbar, 6) AS q_laspeyres,
        |  round(rbar * (1.0 + (mrs - rbar * sbar) / (rbar * sbar)), 6)
        |    AS paasche_implied,
        |  round((mrs - rbar * sbar) / (rbar * sbar), 6) AS gap_pct,
        |  CASE WHEN mrr - rbar * rbar > 0.0 AND mss - sbar * sbar > 0.0 THEN
        |    round((mrs - rbar * sbar)
        |      / sqrt((mrr - rbar * rbar) * (mss - sbar * sbar)), 6)
        |  END AS corr_rs
        |FROM c ORDER BY period""".stripMargin,
    "q_price_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS it, strftime(l_shipdate, '%Y-%m') AS pd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995),
        |uv AS (
        |  SELECT it, pd, CAST(SUM(e) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS p,
        |    CAST(SUM(q) AS DOUBLE) AS qd
        |  FROM li GROUP BY 1, 2),
        |base AS (SELECT it, p AS p0, qd AS q0 FROM uv WHERE pd = '1995-01'),
        |j AS (SELECT uv.pd, uv.p, uv.qd, b.p0, b.q0 FROM uv JOIN base b USING (it)),
        |agg AS (
        |  SELECT pd AS period, COUNT(*) AS n_items,
        |    SUM(CAST(round(p * q0 * 1000000.0) AS BIGINT)) AS numL,
        |    SUM(CAST(round(p0 * q0 * 1000000.0) AS BIGINT)) AS denL,
        |    SUM(CAST(round(p * qd * 1000000.0) AS BIGINT)) AS numP,
        |    SUM(CAST(round(p0 * qd * 1000000.0) AS BIGINT)) AS denP
        |  FROM j GROUP BY 1)
        |SELECT period, n_items,
        |  round(CAST(numL AS DOUBLE) / CAST(denL AS DOUBLE), 6) AS laspeyres,
        |  round(CAST(numP AS DOUBLE) / CAST(denP AS DOUBLE), 6) AS paasche,
        |  round(sqrt((CAST(numL AS DOUBLE) / CAST(denL AS DOUBLE))
        |           * (CAST(numP AS DOUBLE) / CAST(denP AS DOUBLE))), 6) AS fisher
        |FROM agg ORDER BY period""".stripMargin,
  )
}
