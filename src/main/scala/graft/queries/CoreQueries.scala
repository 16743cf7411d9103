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

/** Core relational family: the reference's column ops, reshape, windows, joins-with-aggregation.
  *
  * Query defs + their DuckDB oracle SQL, split out of the former
  * monolithic SparkEntry (registry semantics unchanged — the maps merge
  * in [[graft.SparkEntry]]).
  */
object CoreQueries {

  /** Star-schema join + aggregation (capability inherited from Spark; SURVEY
    * §2.3). nation/region are broadcast explicitly — at 100 TB the fact-side
    * tables shuffle on join keys while dims ship to every executor.
    */
  private def qJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"),
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  /** C1 concat: three frames with deliberately perturbed schemas — int-cast
    * quantity (widens back to double), dropped l_tax (typed null-fill),
    * string-cast suppkey (string sink) — concatenated with an injected key
    * column, then aggregated per source frame.
    */
  private def qConcatKeys(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "A")
      .withColumn("l_quantity", col("l_quantity").cast("int"))
    val nf = li.filter(col("l_returnflag") === "N").drop("l_tax")
    val rf = li.filter(col("l_returnflag") === "R")
      .withColumn("l_suppkey", col("l_suppkey").cast("string"))
    Concat.concat(Seq(a, nf, rf), Seq(Seq("A"), Seq("N"), Seq("R")), Seq("src_flag"))
      .groupBy(col("src_flag"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        dsum(col("l_tax")).as("sum_tax"),
        count(col("l_suppkey")).as("n_supp"),
      )
      .orderBy(col("src_flag"))
  }

  /** P3 literal-map decode: unmapped key ('P') must yield null. */
  private def qMapCol(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("status_name",
        Columns.mapCol("o_orderstatus", Seq("F" -> "Fulfilled", "O" -> "Open")))
      .groupBy(col("status_name"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))
      .orderBy(asc_nulls_first("status_name"))

  /** P2 rename-by-mapping, names absent from the mapper unchanged. */
  private def qRename(s: SparkSession, dir: String): DataFrame =
    Columns.mapColumnNames(t(s, dir, "customer"),
        Map("c_mktsegment" -> "segment", "c_acctbal" -> "balance"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), dsum(col("balance")).as("sum_balance"))
      .orderBy(col("segment"))

  /** P4 first-group filter (deterministic min-key variant). */
  private def qFirstGroup(s: SparkSession, dir: String): DataFrame =
    Columns.firstGroupOrdered(t(s, dir, "orders"), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))

  /** W1 window-spec builder: per-group window sum, plus a global total.
    * The global total deliberately does NOT use `windowSpec(Nil)` — the
    * whole-frame window sorts every row into one task (the reference's
    * documented single-partition hazard, general.py:173-179, kept in the
    * library with its warning). The scale-safe composition shown here is
    * a one-row `agg` attached via broadcast cross join: same result, no
    * single-partition Window anywhere in the plan.
    */
  private def qWindowSum(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val perCust = Columns.windowSpec(Seq("o_custkey"))
    val globalTotal = o.agg(
      sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("global_total"))
    o.select(
        col("o_orderkey"),
        col("o_custkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(perCust)
          .cast("double").as("cust_total"),
      )
      .crossJoin(broadcast(globalTotal))
      .orderBy(col("o_orderkey"))
  }

  /** U2 array successive-difference as pure Catalyst (no UDF). The diffs
    * are posexploded to scalar (l_partkey, idx, diff) rows — the oracle
    * comparator aligns on scalar columns, and single-element groups (empty
    * diff arrays) drop out on both engines.
    */
  private def qArrayDiff(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(array_sort(collect_list(struct(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice")))).as("sorted"))
      .select(
        col("l_partkey"),
        posexplode(Columns.arrayDiff(transform(col("sorted"), x => x.getField("l_extendedprice"))))
          .as(Seq("idx", "diff")),
      )
      .select(col("l_partkey"), col("idx").cast("long").as("idx"), col("diff"))
      .orderBy(col("l_partkey"), col("idx"))

  /** U1 grouped-map table function: per-group demean inside the executor
    * JVM via flatMapGroups (integral quantities ⇒ order-insensitive sums).
    */
  private def qGroupedApply(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val outSchema = StructType.fromDDL("l_orderkey bigint, l_linenumber int, q_demeaned double")
    Grouped.applyPerGroup(li, Seq("l_partkey"), outSchema) { (_, rows) =>
      val buf = rows.toSeq
      val mean = buf.iterator.map(_.getDouble(3)).sum / buf.size
      buf.iterator.map(r => Row(r.getLong(1), r.getInt(2), r.getDouble(3) - mean))
    }
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** R1 unstack (long→wide pivot) with explicit pivot values. */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    Reshape.unstack(t(s, dir, "lineitem"), Seq("l_linestatus"), "l_returnflag",
        "l_quantity", Seq("A", "N", "R"), c => sum(col(c)))
      .orderBy(col("l_linestatus"))

  /** R2 stack (wide→long unpivot): round-trips [[qPivot]] back to long. */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Reshape.unstack(t(s, dir, "lineitem"), Seq("l_linestatus"),
      "l_returnflag", "l_quantity", Seq("A", "N", "R"), c => sum(col(c)))
    Reshape.stack(wide, Seq("l_linestatus"), Seq("A", "N", "R"), "l_returnflag", "sum_qty")
      .filter(col("sum_qty").isNotNull) // pandas stack dropna=True semantics
      .orderBy(col("l_linestatus"), col("l_returnflag"))
  }

  /** JSON extraction from the events.props payload column. */
  private def qJsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Top-k per group via ranking window (the §2.9 top-k idiom). */
  private def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  /** Rollup with grouping-id (hierarchical subtotals, inherited agg
    * surface).
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** CUBE: all four grouping-set combinations of (returnflag,
    * linestatus) in one pass (Expand + single aggregation — Spark plans
    * grouping sets without per-set scans; rollup's sibling, §2.4).
    */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Set operations: nation keys serving both customers and suppliers
    * (INTERSECT) vs customer-only nations (EXCEPT), tagged and unioned.
    */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val both = c.intersect(sup).withColumn("tag", lit("both"))
    val custOnly = c.except(sup).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).select(col("tag"), col("nationkey"))
      .orderBy(col("tag"), col("nationkey"))
  }

  /** A2 — distinct level combinations. */
  private def qDistinctLevels(s: SparkSession, dir: String): DataFrame =
    Reshape.indexLevelValues(t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** HLL sketch vs exact distinct — the sketch is the 100 TB path for
    * distinct counting. The sketch estimate itself is engine-specific, so
    * the oracled surface is the exact count plus the error-bound
    * invariant (|approx − exact| ≤ 5% of exact, far above the
    * configured 2% rsd): the oracle verifies the sketch actually
    * estimates the right quantity, not just that a number came back.
    */
  private def qHll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("exact_orders"),
        (abs(col("approx") - col("exact_orders")) <= col("exact_orders") * 0.05)
          .as("approx_within_5pct"))

  /** Typed Dataset pipeline ([[graft.typed.Typed.prioritySummary]]):
    * case-class encoders + typed group key, Catalyst partial/final
    * aggregation retained (TypedSpec pins the plan).
    */
  private def qTypedAgg(s: SparkSession, dir: String): DataFrame =
    graft.typed.Typed.prioritySummary(graft.typed.Typed.orders(s, dir), 150000.0)
      .orderBy(col("o_orderpriority"))

  /** End-to-end training-data pipeline composition: normalize → quality
    * filter → exact dedup → per-source cap → corpus summary, every stage
    * an operator from this library, the WHOLE chain mirrored in the
    * oracle. Integration coverage: a stage whose output contract drifts
    * (normalization bytes, score arithmetic, dedup keep-rule, cap
    * selection) breaks the final sums even if its unit query still
    * passes in isolation.
    */
  private def qPipeline(s: SparkSession, dir: String): DataFrame = {
    val d1 = t(s, dir, "documents")
      .withColumn("norm", TextStats.normalizeText(col("text")))
    val d2 = d1.filter(TextStats.qualityScore(col("norm")) > 0.54)
    val d3 = Dedup.dedupExact(d2, "norm", "doc_id")
    val d4 = Sampling.capPerGroup(d3, Seq("source"), "doc_id", 10)
    d4.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("norm"))).as("n_tokens"),
        sum(col("doc_id")).as("sum_ids"),
      )
      .orderBy(col("lang"))
  }

  /** FULL corpus-curation pipeline — the deepest composition query:
    * normalize → quality gate → exact dedup → 5-gram-Jaccard near-dup
    * keep-one (connected components over the oracled pair set) →
    * benchmark decontamination (anti-join on ≥3 shared shingles) →
    * deterministic split, each stage one library operator and the WHOLE
    * chain replayed by the oracle CTE-for-CTE. Emits per split the
    * survivor count, the id sum (selection-exact: a single doc kept or
    * dropped differently anywhere in the chain breaks it) and the token
    * budget. Extends [[qPipeline]]'s integration coverage to the
    * near-dup component and contamination stages — the two whose
    * contracts drift most easily in isolation.
    */
  private def qCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("norm", TextStats.normalizeText(col("text")))
    val q = docs.filter(TextStats.qualityScore(col("norm")) > 0.54)
    // stage boundary: three consumers (pair mining, keep-one, final join)
    // each replay the normalize→gate→dedup lineage without it — the
    // single-job analog of the parquet handoff a real pipeline writes
    // between curation stages
    val ex = Dedup.dedupExact(q, "norm", "doc_id").localCheckpoint(true)
    val pairs = Dedup.ngramJaccardPairs(ex, "doc_id", "norm",
      shingleSize = 5, minJaccard = 0.5)
    val nd = Dedup.dedupByPairs(ex, "doc_id", pairs)
    // benchmark set: the same fixed slice q_decontaminate uses
    val bench = t(s, dir, "documents")
      .filter(col("doc_id") % 50 === 0 && col("doc_id") < 500)
    val flagged = Dedup.crossCorpusOverlap(nd, "doc_id", "norm",
        bench, "doc_id", "text", shingleSize = 5, minShared = 3)
      .select(col("doc_id")).distinct()
    val clean = nd.join(flagged, Seq("doc_id"), "left_anti")
    Sampling.deterministicSplit(clean, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(TextStats.tokenCount(col("norm")).cast("long")).as("n_tokens"))
      .orderBy(col("split"))
  }

  /** Cogrouped-map ([[Grouped.cogroupApply]]): per-user reconciliation of
    * purchase vs error value streams — counts and an exact-decimal net —
    * computed in one JVM lambda over both row groups. The oracle is a
    * full-outer aggregated join: one-sided keys (users with only
    * purchases or only errors) are where a broken cogroup shows first.
    */
  private def qCogroup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("value"))
    Grouped.cogroupApply(purchases, errors, Seq("user_id"),
        StructType.fromDDL("n_purch bigint, n_err bigint, purch_minus_err double")) {
      (_, l, r) =>
        def sumUp(it: Iterator[Row]): (Long, BigDecimal) = {
          var n = 0L
          var s = BigDecimal(0)
          // valueOf goes through the shortest decimal rendering, so the
          // 2-decimal fixture values accumulate exactly (decimal-sum rule)
          it.foreach { row => n += 1; s += BigDecimal(java.math.BigDecimal.valueOf(row.getDouble(1))) }
          (n, s)
        }
        val (np, sp) = sumUp(l)
        val (ne, se) = sumUp(r)
        Iterator(Row(np, ne, (sp - se).toDouble))
    }.orderBy(col("user_id"))
  }

  /** Dense surrogate ids ([[graft.ops.Ids.withDenseId]]): contiguous
    * 0..n-1 in doc_id order WITHOUT a single-partition sort — range
    * repartition + partition offsets (the scale-safe form of the
    * whole-frame row_number the reference warns about).
    */
  private def qDenseId(s: SparkSession, dir: String): DataFrame =
    graft.ops.Ids.withDenseId(
        t(s, dir, "documents").select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("row_id"))
      .orderBy(col("doc_id"))

  /** Ranking-window feature block (§2.7 analytics surface): percentile
    * rank and cumulative distribution of order value within each status
    * — both rational ((rank−1)/(n−1), rank/n), so the features are
    * oracled bit-exact. One hash shuffle on the partition key.
    */
  private def qRankFeatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** This family's slice of [[graft.SparkEntry.queries]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_agg" -> (qJoinAgg _),
    "q_concat_keys" -> (qConcatKeys _),
    "q_map_col" -> (qMapCol _),
    "q_rename" -> (qRename _),
    "q_first_group" -> (qFirstGroup _),
    "q_window_sum" -> (qWindowSum _),
    "q_array_diff" -> (qArrayDiff _),
    "q_grouped_apply" -> (qGroupedApply _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_json_props" -> (qJsonProps _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_rollup" -> (qRollup _),
    "q_set_ops" -> (qSetOps _),
    "q_distinct_levels" -> (qDistinctLevels _),
    "q_hll" -> (qHll _),
    "q_typed_agg" -> (qTypedAgg _),
    "q_pipeline" -> (qPipeline _),
    "q_curate" -> (qCurate _),
    "q_cogroup" -> (qCogroup _),
    "q_cube" -> (qCube _),
    "q_dense_id" -> (qDenseId _),
    "q_rank_features" -> (qRankFeatures _),
  )

  /** This family's slice of [[graft.SparkEntry.oracleSql]]. */
  def oracleSql: Map[String, String] = Map(
    "q_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_concat_keys" ->
      """WITH u AS (
        |  SELECT 'A' AS src_flag, CAST(CAST(l_quantity AS INTEGER) AS DOUBLE) AS l_quantity,
        |         l_tax, CAST(l_suppkey AS VARCHAR) AS l_suppkey
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT 'N', l_quantity, CAST(NULL AS DOUBLE), CAST(l_suppkey AS VARCHAR)
        |  FROM lineitem WHERE l_returnflag = 'N'
        |  UNION ALL
        |  SELECT 'R', l_quantity, l_tax, CAST(l_suppkey AS VARCHAR)
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT src_flag, SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax,
        |  COUNT(l_suppkey) AS n_supp
        |FROM u GROUP BY src_flag ORDER BY src_flag""".stripMargin,
    "q_map_col" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'Fulfilled' WHEN 'O' THEN 'Open' END AS status_name,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY 1 ORDER BY status_name NULLS FIRST""".stripMargin,
    "q_rename" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance
        |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin,
    "q_first_group" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders
        |WHERE o_orderpriority = (SELECT min(o_orderpriority) FROM orders)
        |GROUP BY 1""".stripMargin,
    "q_window_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER () AS DOUBLE) AS global_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_array_diff" ->
      """WITH g AS (
        |  SELECT l_partkey, list(l_extendedprice ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS p
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, idx, diff FROM (
        |  SELECT l_partkey,
        |    unnest(range(0, len(p) - 1)) AS idx,
        |    unnest([p[i+1] - p[i] FOR i IN range(1, len(p))]) AS diff
        |  FROM g)
        |ORDER BY l_partkey, idx""".stripMargin,
    "q_grouped_apply" ->
      """SELECT l_partkey, l_orderkey, l_linenumber,
        |  l_quantity - SUM(l_quantity) OVER (PARTITION BY l_partkey)
        |               / COUNT(*) OVER (PARTITION BY l_partkey) AS q_demeaned
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  SUM(l_quantity) FILTER (l_returnflag = 'A') AS "A",
        |  SUM(l_quantity) FILTER (l_returnflag = 'N') AS "N",
        |  SUM(l_quantity) FILTER (l_returnflag = 'R') AS "R"
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    "q_unpivot" ->
      """SELECT l_linestatus, l_returnflag, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderpriority,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rank,
        |  o_orderkey, o_totalprice
        |FROM orders QUALIFY rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n,
        |  GROUPING_ID(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |HAVING COUNT(*) > 0
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  GROUPING_ID(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |HAVING COUNT(*) > 0
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_dense_id" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_rank_features" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders WHERE o_orderkey % 50 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_set_ops" ->
      """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        |     s AS (SELECT s_nationkey AS nationkey FROM supplier)
        |SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |UNION ALL
        |SELECT 'cust_only', nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |ORDER BY tag, nationkey""".stripMargin,
    "q_distinct_levels" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    // The full curation chain, stage for stage: normalize (q_normalize's
    // regex pair), quality gate (q_doc_quality's formula at q_pipeline's
    // 0.54 cut), exact dedup (min id per norm), Jaccard >= 0.5 pairs
    // (q_dedup_jaccard's shingle machinery over the deduped survivors),
    // components keep-one (q_semdedup's recursive CTE), decontamination
    // (q_decontaminate's bench slice at >= 3 shared shingles), md5-bucket
    // split (q_split's arithmetic).
    "q_curate" ->
      """WITH RECURSIVE nrm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[\x00-\x1F\x7F]', '', 'g')) AS norm
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, norm FROM nrm
        |  WHERE 0.4 * least(len(string_split(norm, ' ')) / 50.0, 1.0)
        |      + 0.4 * (len(list_distinct(string_split(norm, ' ')))
        |               / CAST(len(string_split(norm, ' ')) AS DOUBLE))
        |      + 0.2 * (len(list_filter(string_split(norm, ' '), t -> t IN ('the', 'a')))
        |               / CAST(len(string_split(norm, ' ')) AS DOUBLE)) > 0.54),
        |ex AS (
        |  SELECT doc_id, norm FROM (
        |    SELECT doc_id, norm,
        |      row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn FROM q)
        |  WHERE rn = 1),
        |s AS (
        |  SELECT doc_id, list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w)-3)]) AS sh
        |  FROM (SELECT doc_id, string_split(norm, ' ') AS w FROM ex)),
        |sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
        |e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
        |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM i
        |      JOIN (SELECT doc_id, n_sh AS n_a FROM sz) sa ON i.id_a = sa.doc_id
        |      JOIN (SELECT doc_id, n_sh AS n_b FROM sz) sb ON i.id_b = sb.doc_id
        |      WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        |  UNION
        |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
        |losers AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) <> a),
        |nd AS (SELECT doc_id, norm FROM ex
        |       WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |bs AS (
        |  SELECT doc_id AS bench_id, list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w)-3)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |        WHERE doc_id % 50 = 0 AND doc_id < 500)),
        |be AS (SELECT bench_id, unnest(sh) AS shingle FROM bs),
        |ce AS (SELECT doc_id, unnest(sh) AS shingle FROM s
        |       WHERE doc_id IN (SELECT doc_id FROM nd)),
        |flag AS (SELECT DISTINCT doc_id FROM (
        |  SELECT ce.doc_id, be.bench_id FROM ce JOIN be USING (shingle)
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)),
        |clean AS (SELECT doc_id, norm FROM nd
        |          WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
        |b2 AS (
        |  SELECT doc_id, norm,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        |  FROM clean)
        |SELECT CASE WHEN bucket < 8000 THEN 'train'
        |            WHEN bucket < 9000 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(SUM(len(string_split(norm, ' '))) AS BIGINT) AS n_tokens
        |FROM b2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS exact_orders, true AS approx_within_5pct
        |FROM lineitem""".stripMargin,
    "q_typed_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders WHERE o_totalprice > 150000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_pipeline" ->
      // the full chain re-spelled: normalize -> quality > 0.54 ->
      // min-id-per-body dedup -> md5-ordered cap 10/source -> summary
      """WITH d1 AS (
        |  SELECT doc_id, lang, source,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[\x00-\x1F\x7F]', '', 'g')) AS norm
        |  FROM documents),
        |d2 AS (
        |  SELECT * FROM d1
        |  WHERE 0.4 * least(len(string_split(norm, ' ')) / 50.0, 1.0)
        |    + 0.4 * (len(list_distinct(string_split(norm, ' ')))
        |             / CAST(len(string_split(norm, ' ')) AS DOUBLE))
        |    + 0.2 * (len(list_filter(string_split(norm, ' '), t -> t IN ('the', 'a')))
        |             / CAST(len(string_split(norm, ' ')) AS DOUBLE)) > 0.54),
        |d3 AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY norm) AS keep FROM d2)
        |  WHERE doc_id = keep),
        |d4 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM d3)
        |  WHERE rk <= 10)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(norm, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM d4 GROUP BY lang ORDER BY lang""".stripMargin,
    "q_cogroup" ->
      """WITH p AS (
        |  SELECT user_id, COUNT(*) AS n_purch, SUM(CAST(value AS DECIMAL(18,2))) AS sp
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |e AS (
        |  SELECT user_id, COUNT(*) AS n_err, SUM(CAST(value AS DECIMAL(18,2))) AS se
        |  FROM events WHERE event_type = 'error' GROUP BY user_id)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |  CAST(COALESCE(n_purch, 0) AS BIGINT) AS n_purch,
        |  CAST(COALESCE(n_err, 0) AS BIGINT) AS n_err,
        |  CAST(COALESCE(sp, 0) - COALESCE(se, 0) AS DOUBLE) AS purch_minus_err
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
        |ORDER BY user_id""".stripMargin,
  )
}
