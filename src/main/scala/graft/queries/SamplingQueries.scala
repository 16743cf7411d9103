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

/** Sampling family: splits, stratification, mixtures, apportionment, caps.
  *
  * Query defs + their DuckDB oracle SQL, split out of the former
  * monolithic SparkEntry (registry semantics unchanged — the maps merge
  * in [[graft.SparkEntry]]).
  */
object SamplingQueries {

  /** Purged temporal split ([[Sampling.temporalSplit]]): train < Jan 20,
    * embargo [Jan 20, Jan 22), test >= Jan 22 — integer epoch-micro
    * boundaries, counts + exact value sums per (event_type, split).
    */
  private def qTemporalSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.temporalSplit(t(s, dir, "events"), col("ts"),
        cutoffUs = 1705881600000000L, embargoUs = 172800000000L)
      .groupBy(col("event_type"), col("split"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"), col("split"))

  /** Deterministic shuffle-and-shard
    * ([[Sampling.deterministicShuffle]]): every document's (shard, pos)
    * under seed "42" into 8 shards — the epoch-reproducible dataloader
    * layout. The oracle replays the md5 split (shard from hex 1-8,
    * order from hex 9-24) row-for-row.
    */
  private def qDetShuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.deterministicShuffle(t(s, dir, "documents"), "doc_id",
        nShards = 8, seed = "42")
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))

  /** Deterministic hash-bucket train/val/test split: counts per (lang,
    * split) — md5-bucketed so the oracle reproduces it exactly.
    */
  private def qSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.deterministicSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))

  /** EXACT-count stratified sample ([[graft.ops.Sampling
    * .stratifiedExact]]): exactly ⌊0.25·n⌋ orders per status, selected
    * by the engine-reproducible (md5(key), key) rank. The summary emits
    * the per-stratum count AND the sum of selected keys, so the oracle
    * verifies the exact SELECTION, not just its size.
    */
  private def qStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedExact(t(s, dir, "orders"), Seq("o_orderstatus"),
        "o_orderkey", 0.25)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("o_orderkey")).as("sum_keys"))
      .orderBy(col("o_orderstatus"))

  /** Training-mixture construction: resample the corpus toward a target
    * language mix {en 0.5, zh 0.2, de/es/fr 0.1}; the binding source
    * keeps everything, the rest downsample deterministically (md5
    * bucket). Output: kept rows per language.
    */
  private def qMixture(s: SparkSession, dir: String): DataFrame =
    Sampling.resampleToMixture(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.1, "es" -> 0.1, "fr" -> 0.1))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))

  /** Exact-budget mixture materialization ([[graft.ops.Sampling.apportion]]
    * + [[graft.ops.Sampling.takeApportioned]]): 357 documents split across
    * sources by largest-remainder quotas proportional to availability,
    * then taken in the unbiased md5 order. Quotas sum to the budget
    * EXACTLY — the fixed-total complement of q_mixture's fractions.
    */
  private def qApportion(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n_avail"))
    val quotas = Sampling.apportion(counts, "source", "n_avail", budget = 357L)
    val taken = Sampling.takeApportioned(d, Seq("source"), "doc_id",
        quotas.select(col("source"), col("quota")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_taken"), sum(col("doc_id")).as("sum_taken_ids"))
    quotas.join(taken, Seq("source"))
      .select(col("source"), col("n_avail"), col("quota"),
        col("n_taken"), col("sum_taken_ids"))
      .orderBy(col("source"))
  }

  /** Temperature-scaled mixture quotas ([[graft.ops.Sampling.apportion]]
    * with α=1/2 weights): multilingual sampling's standard fix for
    * head-language dominance (sample ∝ n^α, α<1 — the multilingual-LM
    * recipe) — quotas proportional to √n_lang, summed to an exact 1000
    * budget by largest remainder. √ is the one temperature with a
    * correctly-rounded IEEE primitive on every engine, so the
    * micro-quantized weights (and therefore every quota) replay
    * bit-for-bit.
    */
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_avail"))
      .withColumn("w_micro",
        round(sqrt(col("n_avail").cast("double")) * lit(1e6), 0).cast("long"))
    Sampling.apportion(counts, "lang", "w_micro", budget = 1000L)
      .join(counts.select(col("lang"), col("n_avail")), Seq("lang"))
      .select(col("lang"), col("n_avail"), col("w_micro"), col("quota"))
      .orderBy(col("lang"))
  }

  /** Per-group cap ([[Sampling.capPerGroup]]): at most 15 documents per
    * source, hash-selected — the kept-id sums pin exact membership, not
    * just the counts.
    */
  private def qCapGroup(s: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(t(s, dir, "documents"), Seq("source"), "doc_id", 15)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept_ids"))
      .orderBy(col("source"))

  /** Validation for deterministic weighted sampling
    * ([[graft.ops.Sampling.weightedSample]]): exactly k distinct rows,
    * no zero-weight row ever drawn, and a second invocation returns the
    * IDENTICAL sample (the property rand()-based sampling cannot give).
    * Violations = 0, oracle SELECT 0.
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("w", when(col("doc_id") % 10 === 0, lit(0.0))
        .otherwise(col("n_chars").cast("double")))
    def ids = Sampling.weightedSample(d, "doc_id", "w", k = 100)
    // the k-row sample is materialized ONCE (it is tiny); every check
    // reads the checkpoint, plus exactly one genuine re-invocation for
    // the rerun-identity gate — 2 sample executions, not 5
    val s1 = ids.localCheckpoint(true)
    // the size law is min(k, eligible), not k: weightedSample returns
    // every eligible row when fewer than k carry positive weight
    // (degenerate-lint alignment — the fixture always has >= 100)
    val eligible = d.filter(col("w").isNotNull && !isnan(col("w")) && col("w") > 0)
      .agg(count(lit(1)).as("__elig"))
    val vOnce = s1.agg(
        count(lit(1)).as("__k"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("__dup"),
        coalesce(sum(when(col("doc_id") % 10 === 0, 1L).otherwise(0L)), lit(0L))
          .as("__zero"))
      .crossJoin(broadcast(eligible))
      .select(((col("__k") =!= least(lit(100L), col("__elig"))).cast("long") +
        col("__dup") + col("__zero")).as("v"))
    val vRerun = s1.select(col("doc_id")).exceptAll(ids.select(col("doc_id")))
      .agg(count(lit(1)).as("v"))
    vOnce.unionByName(vRerun)
      .agg(coalesce(sum(col("v")), lit(0L)).as("n_violations"))
  }

  /** This family's slice of [[graft.SparkEntry.queries]]. */
  /** Neyman allocation ([[graft.ops.Sampling.neymanAllocation]]): a
    * 500-doc audit budget split across sources by N_h·S_h on text
    * length — the variance-optimal stratified design (proportional
    * allocation would oversample big-but-homogeneous sources). Exact
    * micro moments, apportion's largest-remainder integerization.
    */
  private def qNeyman(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.neymanAllocation(t(s, dir, "documents"),
        "source", length(col("text")).cast("double"), budget = 500L)
      .orderBy(col("source"))

  /** Raking / iterative proportional fitting ([[graft.ops.Survey
    * .rake]]): calibrate the positive-balance customer subsample's
    * weights so its nation × segment margins match the FULL register's
    * counts — the survey-reweighting workhorse (post-stratification on
    * two margins at once). 5 sweeps of exact integer-unit IPF
    * (truncating `div` on decimal products), all-BIGINT output; the
    * oracle replays every sweep CTE-for-CTE with HUGEINT `//`.
    */
  private def qRaking(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val rt = c.groupBy(col("c_nationkey").cast("string").as("r"))
      .agg((count(lit(1)) * lit(1000000L)).as("t"))
    val ct = c.groupBy(col("c_mktsegment").cast("string").as("c"))
      .agg((count(lit(1)) * lit(1000000L)).as("t"))
    graft.ops.Survey.rake(c.filter(col("c_acctbal") > 0),
      col("c_nationkey"), col("c_mktsegment"), lit(1.0), rt, ct,
      iterations = 5)
  }

  private def rakingOracleSql: String = {
    val sweeps = (1 to 5).map { i =>
      val prev = if (i == 1) "j0" else s"b${i - 1}"
      s"""a$i AS (
         |  SELECT r, c, n, (w * tr) // SUM(w) OVER (PARTITION BY r) AS w, tr, tc
         |  FROM $prev),
         |b$i AS (
         |  SELECT r, c, n, (w * tc) // SUM(w) OVER (PARTITION BY c) AS w, tr, tc
         |  FROM a$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT CAST(c_nationkey AS VARCHAR) AS r, c_mktsegment AS c,
       |    COUNT(*) AS n, CAST(COUNT(*) AS HUGEINT) * 1000000 AS w
       |  FROM customer WHERE c_acctbal > 0 GROUP BY 1, 2),
       |rt AS (
       |  SELECT CAST(c_nationkey AS VARCHAR) AS r,
       |    CAST(COUNT(*) AS HUGEINT) * 1000000 AS tr
       |  FROM customer GROUP BY 1),
       |ct AS (
       |  SELECT c_mktsegment AS c, CAST(COUNT(*) AS HUGEINT) * 1000000 AS tc
       |  FROM customer GROUP BY 1),
       |j0 AS (
       |  SELECT w0.r, w0.c, w0.n, w0.w, rt.tr, ct.tc
       |  FROM w0 JOIN rt USING (r) JOIN ct USING (c)),
       |$sweeps
       |SELECT j0.r AS row_key, j0.c AS col_key, CAST(j0.n AS BIGINT) AS n_rows,
       |  CAST(j0.w AS BIGINT) AS w_base_units,
       |  CAST(b5.w AS BIGINT) AS w_raked_units,
       |  CAST(5 AS BIGINT) AS iters_run
       |FROM j0 JOIN b5 ON j0.r = b5.r AND j0.c = b5.c
       |ORDER BY row_key, col_key""".stripMargin
  }

  /** Horvitz-Thompson stratified total ([[graft.ops.Survey
    * .horvitzThompson]]): scale the md5-deterministic 20% customer
    * sample's account balances back to the full register, stratified
    * by segment with finite-population-corrected SE — the
    * design-unbiased "gross up the sample" every survey publication
    * runs. The oracle replays the md5 inclusion rule and the exact
    * quantized trees.
    */
  private def qHt(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val samp = Sampling.deterministicSample(c, "c_custkey", 0.2)
    val pop = c.groupBy(col("c_mktsegment").as("h")).agg(count(lit(1)).as("N"))
    graft.ops.Survey.horvitzThompson(samp, col("c_mktsegment"),
      col("c_acctbal"), pop)
  }

  private def htOracleSql: String =
    """WITH s AS (
      |  SELECT c_mktsegment AS h,
      |    CAST(round(c_acctbal * 1000000.0) AS BIGINT) AS y
      |  FROM customer
      |  WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 10000 < 2000
      |    AND c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
      |g AS (
      |  SELECT h, COUNT(*) AS n, SUM(CAST(y AS HUGEINT)) AS s1,
      |    SUM(CAST(y AS HUGEINT) * y) AS s2
      |  FROM s GROUP BY 1),
      |p AS (SELECT c_mktsegment AS h, COUNT(*) AS np FROM customer GROUP BY 1),
      |j AS (SELECT g.h, g.n, g.s1, g.s2, p.np FROM g JOIN p USING (h)),
      |per AS (
      |  SELECT h, n, np,
      |    CAST(round(CAST(CAST(np AS HUGEINT) * s1 AS DOUBLE)
      |      / CAST(n AS DOUBLE)) AS HUGEINT) AS t,
      |    CAST(round(CAST(np AS DOUBLE) * CAST(np AS DOUBLE)
      |      * (1.0 - CAST(n AS DOUBLE) / CAST(np AS DOUBLE))
      |      * (CASE WHEN n >= 2 THEN
      |          (CAST(s2 AS DOUBLE)
      |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |          / (CAST(n AS DOUBLE) - 1.0) ELSE 0.0 END)
      |      / CAST(n AS DOUBLE) / 1000000000000.0 * 1000000000.0)
      |      AS HUGEINT) AS v
      |  FROM j)
      |SELECT COUNT(*) AS n_strata, CAST(SUM(np) AS BIGINT) AS n_pop,
      |  CAST(SUM(n) AS BIGINT) AS n_sample,
      |  CAST(SUM(t) AS BIGINT) AS ht_total_micros,
      |  round(sqrt(CAST(SUM(v) AS DOUBLE) / 1000000000.0), 6) AS se
      |FROM per""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_raking" -> (qRaking _),
    "q_ht" -> (qHt _),
    "q_neyman" -> (qNeyman _),
    "q_det_shuffle" -> (qDetShuffle _),
    "q_temporal_split" -> (qTemporalSplit _),
    "q_split" -> (qSplit _),
    "q_stratified" -> (qStratified _),
    "q_mixture" -> (qMixture _),
    "q_apportion" -> (qApportion _),
    "q_temperature_mix" -> (qTemperatureMix _),
    "q_cap_group" -> (qCapGroup _),
    "q_weighted_sample" -> (qWeightedSample _),
  )

  /** This family's slice of [[graft.SparkEntry.oracleSql]]. */
  def oracleSql: Map[String, String] = Map(
    "q_raking" -> rakingOracleSql,
    "q_ht" -> htOracleSql,
    "q_neyman" ->
      """WITH v AS (
        |  SELECT source,
        |    CAST(round(CAST(length(text) AS DOUBLE) * 1000000.0) AS BIGINT) AS x
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |m AS (
        |  SELECT source, COUNT(*) AS n_rows, SUM(CAST(x AS HUGEINT)) AS s1,
        |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2
        |  FROM v GROUP BY 1),
        |wts AS (
        |  SELECT source, n_rows,
        |    round((CASE WHEN n_rows >= 2 THEN
        |      sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |        / (CAST(n_rows AS DOUBLE) - 1.0)) ELSE 0.0 END) / 1000000.0, 6) AS sd,
        |    CAST(round(CAST(n_rows AS DOUBLE) * (CASE WHEN n_rows >= 2 THEN
        |      sqrt((CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |        / (CAST(n_rows AS DOUBLE) - 1.0)) ELSE 0.0 END)) AS BIGINT) AS weight
        |  FROM m),
        |t AS (SELECT SUM(CAST(weight AS HUGEINT)) AS W FROM wts),
        |b AS (
        |  SELECT source, (500 * CAST(weight AS HUGEINT)) // W AS base,
        |    (500 * CAST(weight AS HUGEINT)) % W AS rem
        |  FROM wts CROSS JOIN t),
        |r AS (SELECT 500 - SUM(base) AS extra FROM b),
        |q AS (
        |  SELECT source,
        |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= extra
        |      THEN 1 ELSE 0 END AS quota
        |  FROM b CROSS JOIN r)
        |SELECT wts.source, wts.n_rows, wts.sd, wts.weight,
        |  CAST(q.quota AS BIGINT) AS quota
        |FROM wts JOIN q USING (source) ORDER BY wts.source""".stripMargin,
    "q_temporal_split" ->
      """SELECT event_type,
        |  CASE WHEN epoch_us(ts) < 1705881600000000 - 172800000000 THEN 'train'
        |       WHEN epoch_us(ts) < 1705881600000000 THEN 'embargo'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2
        |""".stripMargin,
    "q_det_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS hx FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS shard,
        |    substr(hx, 9, 16) AS ord
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) - 1 AS pos
        |FROM s ORDER BY doc_id
        |""".stripMargin,
    "q_split" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 0.25 is a binary-exact fraction, so floor(n*0.25) is identical on
    // both engines; md5 hex strings sort identically (lowercase ASCII).
    "q_stratified" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk,
        |    count(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n_sampled,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM r WHERE rk <= floor(n * 0.25)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Largest-remainder replay: floor quotas via integer //, leftovers by
    // remainder rank (ties to smaller source), md5-order materialization.
    "q_apportion" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_avail FROM documents GROUP BY 1),
        |t AS (SELECT SUM(n_avail) AS W FROM c),
        |b AS (
        |  SELECT source, n_avail,
        |    (357 * n_avail) // W AS base, (357 * n_avail) % W AS rem
        |  FROM c CROSS JOIN t),
        |r AS (SELECT 357 - SUM(base) AS extra FROM b),
        |q AS (
        |  SELECT source, n_avail,
        |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= extra
        |      THEN 1 ELSE 0 END AS quota
        |  FROM b CROSS JOIN r),
        |ranked AS (
        |  SELECT d.source, d.doc_id,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
        |  FROM documents d),
        |taken AS (
        |  SELECT ranked.source, COUNT(*) AS n_taken, SUM(ranked.doc_id) AS sum_taken_ids
        |  FROM ranked JOIN q USING (source) WHERE rk <= quota GROUP BY 1)
        |SELECT q.source, q.n_avail, CAST(q.quota AS BIGINT) AS quota,
        |  CAST(taken.n_taken AS BIGINT) AS n_taken,
        |  CAST(taken.sum_taken_ids AS BIGINT) AS sum_taken_ids
        |FROM q JOIN taken USING (source) ORDER BY q.source""".stripMargin,
    "q_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_avail FROM documents GROUP BY 1),
        |wm AS (
        |  SELECT lang, n_avail,
        |    CAST(round(sqrt(CAST(n_avail AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
        |  FROM c),
        |t AS (SELECT SUM(w_micro) AS W FROM wm),
        |b AS (
        |  SELECT lang, n_avail, w_micro,
        |    (1000 * w_micro) // W AS base, (1000 * w_micro) % W AS rem
        |  FROM wm CROSS JOIN t),
        |r AS (SELECT 1000 - SUM(base) AS extra FROM b)
        |SELECT lang, n_avail, w_micro,
        |  CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= extra
        |    THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM b CROSS JOIN r ORDER BY lang""".stripMargin,
    "q_mixture" ->
      // the lang filter mirrors resampleToMixture dropping sources absent
      // from the target map — without it a sixth fixture language would
      // shift every cutoff on the oracle side only
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents
        |               WHERE lang IN ('en', 'zh', 'de', 'es', 'fr') GROUP BY 1),
        |tw AS (SELECT lang, n,
        |         CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 ELSE 0.1 END AS w
        |       FROM counts),
        |t AS (SELECT min(n / w) AS total FROM tw),
        |rates AS (
        |  SELECT lang, LEAST(CAST(round(w * total / n * 10000) AS BIGINT), 10000) AS cutoff
        |  FROM tw, t)
        |SELECT d.lang, COUNT(*) AS n_kept
        |FROM documents d
        |JOIN rates r ON d.lang = r.lang
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < r.cutoff
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cap_group" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids
        |FROM r WHERE rk <= 15
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_weighted_sample" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
  )
}
