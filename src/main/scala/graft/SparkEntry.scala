package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.multimodal.Multimodal
import graft.ops.{AsOf, Columns, Concat, Grouped, Merge, Pack, Profile, RangeJoin, Reshape, Sampling, Skew, Timeseries}
import graft.streaming.Streaming
import graft.text.{Boilerplate, Cluster, Dedup, Dsir, LangModel, Pq, Rank, Similarity, TextStats}

/** Driver contract — one runnable query per implemented operator from
  * SURVEY.md §2, each paired with DuckDB oracle SQL in [[oracleSql]].
  *
  * Determinism conventions (the driver hash-compares against DuckDB):
  *   - every query ends in an orderBy on unique keys, mirrored in the oracle;
  *   - double aggregations go through exact decimal sums
  *     (`sum(cast(x as decimal))`) and cast back to double, so partial-agg
  *     ordering can never change the result;
  *   - timestamps in outputs are formatted as strings (parquet/duckdb
  *     timestamp-zone semantics differ).
  */
object SparkEntry {

  /** Read one of the harness tables (nanos-timestamp-aware — see
    * [[graft.sources.Sources.readTable]]).
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Sources.readTable(s, dir, name)

  /** Exact sum of a double column with `scale` true decimal places:
    * decimal accumulate (associative, order-insensitive), then one
    * deterministic cast back to double.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qJoinAgg(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

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

  /** Per-dimension embedding drift ([[graft.ops.Drift.psiPerDim]]): PSI
    * between the label-0 and label-1 embedding populations across all 64
    * dimensions — the monitoring pass an embedding pipeline runs on
    * every encoder change. The labels are cluster-correlated in the
    * synthetic embeddings, so per-dimension PSI carries real signal
    * (0.05-0.97 at sf0.01) — drifted dimensions stand out by an order
    * of magnitude.
    */
  private def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.ops.Drift.psiPerDim(
        e.filter(col("label") === 0).select(col("embedding")),
        e.filter(col("label") === 1).select(col("embedding")),
        "embedding", Seq(-0.2, -0.1, -0.05, 0.0, 0.05, 0.1, 0.2))
      .orderBy(col("dim"))
  }

  /** Vocabulary drift ([[graft.ops.Drift.psiCategorical]]): token-level
    * PSI between the src0 and src1 document populations over src0's
    * top-20 tokens + OTHER — the text-input sibling of q_embed_drift
    * (tokenizer swaps and source-mix changes surface here first).
    */
  private def qVocabDrift(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    def toks(src: String) = d.filter(col("source") === src)
      .select(explode(TextStats.tokens(col("text"))).as("token"))
    graft.ops.Drift.psiCategorical(toks("src0"), toks("src1"), "token", topN = 20)
      .orderBy(col("category"))
  }

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

  /** W3 forward-fill per series (nulls injected on 'click' events). */
  private def qFfill(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("value_filled",
      when(col("event_type") === "click", lit(null).cast("double")).otherwise(col("value")))
    Timeseries.ffill(e, Seq("user_id"), Seq("ts", "event_id"), Seq("value_filled"))
      .select(col("event_id"), col("user_id"), col("value_filled"))
      .orderBy(col("event_id"))
  }

  /** W2+W3 — forward-fill bounded by the reference's shifted (Feb→Jan+1)
    * year: fill must not cross the February boundary.
    */
  private def qShiftedFfill(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").withColumn("value_filled",
      when(col("event_type") === "click", lit(null).cast("double")).otherwise(col("value")))
    Timeseries.shiftedWithinYearFfill(e, Seq("user_id"), "ts", Seq("value_filled"),
        tieBreakCols = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value_filled"))
      .orderBy(col("event_id"))
  }

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

  /** Event-time tumbling window aggregation (batch form of the streaming
    * operator; window start emitted as string for oracle parity).
    */
  private def qTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sessionization: 30-minute-gap sessions via lag + running sum
    * (microsecond-exact gap comparison on both engines).
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
    val newSession = when(gapUs.isNull || gapUs > lit(1800000000L), 1).otherwise(0)
    t(s, dir, "events")
      .withColumn("session_seq",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        dsum(col("value")).as("sum_value"),
      )
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** JSON extraction from the events.props payload column. */
  private def qJsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Bucket-bounded near-dup pairs (the LSH scale path for
    * [[qEmbedPairs]]; approximate → rows-only check).
    */
  private def qEmbedPairsLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, nPlanes = 4)
      .orderBy(col("id_a"), col("id_b"))

  /** Deterministic hash-bucket train/val/test split: counts per (lang,
    * split) — md5-bucketed so the oracle reproduces it exactly.
    */
  private def qSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.deterministicSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))

  /** Skew-mitigating salted join ([[graft.ops.Skew.saltedJoin]]):
    * lineitem salts 8 ways, the orders dimension replicates across the
    * salt values, the join runs on (key, salt). Salting only ROUTES
    * rows — the result must equal the plain join row-for-row, which is
    * exactly what the oracle computes (the same discipline as
    * q_bloom_join: the accelerated plan, the plain semantics).
    */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ords = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    graft.ops.Skew.saltedJoin(li, ords, Seq("l_orderkey"), saltBuckets = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

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

  /** Multi-column profile (nulls, exact distinct, min/max; Expand-free
    * two-scan shape, see [[graft.ops.Profile]]).
    */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_discount", "l_returnflag", "l_linenumber"))
      .orderBy(col("col_name"))

  /** As-of backward join: each purchase event picks up the same user's
    * most recent click at-or-before it (union+window composition — one
    * key shuffle, no inequality-join cross product).
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    AsOf.asofJoinBackward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
        rightTieBreak = Seq("click_id"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("asof_click_id"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of ([[AsOf.asofJoinForward]]): each purchase attaches the
    * NEXT click at-or-after it per user. DuckDB's native ASOF is
    * backward-only, so the oracle is an independent inequality-join +
    * row_number formulation — agreement checks the reversed-scan
    * semantics end to end.
    */
  private def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    AsOf.asofJoinForward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
        rightTieBreak = Seq("click_id"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("asof_click_id"))
      .orderBy(col("event_id"))
  }

  /** Bucketized point-in-interval (range) join: purchases land in their
    * user's session interval (gap sessions as intervals, purchases as
    * points). The naive inequality join here is a nested loop; the
    * bucketized spelling is a hash equi-join on (user, hour-bucket) with
    * a residual containment filter — see [[graft.ops.RangeJoin]].
    * Half-open end (sessions tile adjacently at exactly the gap).
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val sessions = Streaming.sessionAgg(e, "ts", "30 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n")))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    RangeJoin.pointInInterval(purchases, sessions, Seq("user_id"), "ts",
        "s_start", "s_end", Nil, inclusiveEnd = false)
      .select(col("event_id"), col("user_id"),
        date_format(col("iv_s_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy(col("event_id"))
  }

  /** Two-phase salted aggregation (skew mitigation): must equal the plain
    * aggregation — the salt routes rows, never reaches results.
    */
  private def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedAggregate(t(s, dir, "lineitem"), Seq("l_returnflag"), 16,
        partial = Seq(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pc")),
        combine = Seq(sum(col("ps")).as("sum_qty"), sum(col("pc")).as("n")))
      .orderBy(col("l_returnflag"))

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

  /** Sliding event-time windows (1h window, 30m slide — every event lands
    * in two windows).
    */
  private def qSliding(s: SparkSession, dir: String): DataFrame =
    Streaming.slidingAgg(t(s, dir, "events"), "ts", "1 hour", "30 minutes", Nil,
        Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start"))

  /** Native gap-based session windows (session_window), the declarative
    * form of [[qSessionize]].
    */
  private def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Streaming.sessionAgg(t(s, dir, "events"), "ts", "30 minutes", Seq("user_id"),
        Seq(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value")))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  // ------------------------------------------------- text / LLM pipeline

  /** Corpus statistics per language partition — tokenization, lexical
    * diversity, stopword counts, BPE-ish subword counts.
    */
  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("text"))).as("sum_tokens"),
        sum(length(col("text"))).as("sum_chars"),
        sum(TextStats.distinctTokenCount(col("text"))).as("sum_distinct_tokens"),
        sum(TextStats.stopwordCount(col("text"), Seq("the", "a"))).as("sum_stopwords"),
        sum(TextStats.subwordCount(col("text"))).as("sum_subwords"),
      )
      .orderBy(col("lang"))

  /** Per-document quality scoring (length saturation + diversity +
    * stopword presence), deterministic double arithmetic.
    */
  private def qDocQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic distribution (same heuristic mirrored in SQL). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(TextStats.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))

  /** Vocabulary statistics: per-token corpus frequencies (explode-shaped
    * aggregation), top tokens by count with deterministic tie-break.
    */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextStats.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  /** DSIR importance-resampling selection ([[graft.text.Dsir]]): the 120
    * documents whose hashed unigram+bigram distribution best matches the
    * `lang = 'en'` target slice, scored by exact integer micro-nat LLR
    * sums. The oracle replays the whole chain — bucketing, smoothed LLR
    * quantization, occurrence-sum, top-k — so selection AND scores match
    * bit-for-bit.
    */
  private def qDsir(s: SparkSession, dir: String): DataFrame =
    Dsir.selectTopK(t(s, dir, "documents"), "doc_id", "text",
      isTarget = col("lang") === "en", k = 120, hexChars = 3)

  /** Retrieval evaluation ([[graft.text.Rank.bm25SearchAll]]): each of 20
    * held-out lead chunks queries the remaining chunk corpus via batch
    * BM25; a hit is retrieving a chunk of the SAME document. Emits exact
    * integer recall@1/@5 numerators — the retrieval-QA harness a
    * training-data pipeline runs after chunking. The numbers are
    * data-honest: this synthetic corpus draws from a ~31-token shared
    * vocabulary, so chunk→document identity is irrecoverable BY
    * CONSTRUCTION and the true recall is ~0 — exactly what the harness
    * reports (both engines, bit-identical). RankSpec's distinctive-topic
    * fixture is the positive control where recall is 100%.
    */
  private def qRetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextStats.chunkTokens(col("text"), 32, 8)).as(Seq("chunk_idx", "ctext")))
      .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
        col("doc_id"), col("chunk_idx"), col("ctext"))
    val isQuery = col("doc_id") < 20 && col("chunk_idx") === 0
    val queries = chunks.filter(isQuery)
      .select(col("doc_id").as("query_id"), col("ctext").as("qtext"))
    val corpus = chunks.filter(!isQuery)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_nano").desc, col("chunk_id"))
    val top = Rank.bm25SearchAll(corpus, "chunk_id", "ctext", queries, "query_id", "qtext")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .withColumn("hit",
        when(expr("chunk_id div 1000") === col("query_id"), 1L).otherwise(0L))
    top.groupBy(col("query_id"))
      .agg(max(when(col("rank") === 1, col("hit")).otherwise(0L)).as("h1"),
        max(col("hit")).as("h5"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("h1")).as("hits_at_1"), sum(col("h5")).as("hits_at_5"))
  }

  /** Sequence packing: documents are sharded by (lang, md5-bucket%8) —
    * NOT by lang alone: a low-cardinality shard key would cap the
    * window's parallelism at the language count, the same single-task
    * hazard as a global window. The md5 bucket is deterministic on both
    * engines (same construction as q_split), shards pack independently,
    * and the summary is per (lang, bucket, pack).
    */
  private def qPack(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id"), 8).as("bucket"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Pack.packSequences(d, Seq("lang", "bucket"), Seq("doc_id"), "n_tokens", 512)
    Pack.packSummary(packed, Seq("lang", "bucket"), "n_tokens")
      .orderBy(col("lang"), col("bucket"), col("pack_id"))
  }

  /** PII redaction over the corpus. The synthetic docs carry no PII, so
    * deterministic fake PII (an email + an IPv4 per tenth doc) is
    * injected identically on both engines; the oracle reproduces the
    * redaction byte-for-byte (patterns are Java-regex/RE2-portable by
    * construction, [[TextStats.redactPii]]).
    */
  private def qRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      when(col("doc_id") % 10 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
        .otherwise(lit("")))
    t(s, dir, "documents")
      .select(col("lang"), injected.as("inj"))
      .withColumn("red", TextStats.redactPii(col("inj")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("red") =!= col("inj"), 1L).otherwise(0L)).as("n_redacted"),
        sum(length(col("inj")) - length(col("red"))).cast("long").as("chars_removed"))
      .orderBy(col("lang"))
  }

  /** Benchmark decontamination: a FIXED-size benchmark (every 50th doc
    * among ids < 500 — ten docs at any SF, like a real benchmark suite
    * that does not grow with the corpus, so the broadcast in
    * [[Dedup.crossCorpusOverlap]] stays sound at every scale); corpus
    * docs sharing ≥3 distinct 5-grams with one are flagged with the
    * shared count and contaminated fraction. (The benchmark docs
    * trivially flag against themselves — kept in, as the deterministic
    * sanity floor.)
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("b_id"), col("text").as("b_text"))
    Dedup.crossCorpusOverlap(docs, "doc_id", "text", bench, "b_id", "b_text",
        shingleSize = 5, minShared = 3)
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** Per-language repetition profile (C4/Gopher-style quality rule):
    * docs over the 0.03 repetition threshold (chosen non-vacuous on the
    * synthetic corpus — 2-16 docs trip it per SF, so a broken predicate
    * cannot hide behind an all-zero column) and the exact corpus sum.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextStats.repetitionScore(col("text"), 3).as("rep"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rep") > 0.03, 1L).otherwise(0L)).as("n_repetitive"),
        dsum(col("rep"), 9).as("sum_rep"))
      .orderBy(col("lang"))

  /** Overlapping token-window chunking (embedding/RAG prep): 40-token
    * windows advancing by 30 (10-token overlap), exploded to
    * (doc_id, chunk_idx, n_chunk_tokens) rows.
    */
  private def qChunk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextStats.chunkTokens(col("text"), 40, 10)).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        TextStats.tokenCount(col("chunk")).cast("long").as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Rolling 3-event trailing sum per user (decimal-exact, so the
    * sliding-window reassociation both engines do cannot change values).
    */
  private def qRolling(s: SparkSession, dir: String): DataFrame =
    Timeseries.withRollingSum(t(s, dir, "events"), Seq("user_id"),
        Seq("ts", "event_id"), col("value").cast(DecimalType(18, 2)), 3, "rsum")
      .select(col("event_id"), col("user_id"), col("rsum").cast("double").as("rsum"))
      .orderBy(col("event_id"))

  /** Exact dedup groups keyed by md5 fingerprint. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("fingerprint"))

  /** Exact 5-gram Jaccard near-dup pairs (shingle-join, no n² blowup). */
  private def qDedupJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 5)
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash+LSH near-dup summary (hash-dependent → rows-only check):
    * candidate-pair count and max signature-estimated Jaccard.
    */
  private def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text")
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        coalesce(max(col("est_jaccard")), lit(0.0)).as("max_est_jaccard"),
        coalesce(avg(col("est_jaccard")), lit(0.0)).as("avg_est_jaccard"),
      )

  /** Semantic check for the MinHash+LSH path: every candidate pair must
    * actually share a shingle (left-join to the exact Jaccard pairs finds
    * none missing), and its signature-estimated Jaccard must track the
    * exact Jaccard within 0.35 (measured max deviation at these scales is
    * 0.15 with 32 hashes; deterministic given the fixed seed). Violations
    * = 0, oracled as SELECT 0 — a broken signature, band slicing, or
    * estimate formula fires this.
    */
  private def qMinhashContainment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cand = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    cand.join(exact, Seq("id_a", "id_b"), "left")
      .agg(coalesce(sum(when(col("jaccard").isNull ||
          abs(col("est_jaccard") - col("jaccard")) > 0.35, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
  }

  /** Semantic check for pair→group dedup: components over the exact
    * Jaccard pair graph must satisfy (a) both endpoints of every edge
    * share a label, (b) every label is the minimum id among its members,
    * and (c) dedupByPairs keeps exactly one doc per component plus all
    * unpaired docs. Violations = 0 (oracle SELECT 0).
    */
  private def qDupComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, minJaccard = 0.05)
      .select(col("id_a"), col("id_b"))
      .persist() // feeds CC's edge build plus two validation joins
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    // LEFT joins: a vertex MISSING from cc must count as a violation,
    // not silently drop the edge row — the check may not fail open.
    val edgeViol = pairs
      .join(cc.select(col("v").as("id_a"), col("label").as("la")), Seq("id_a"), "left")
      .join(cc.select(col("v").as("id_b"), col("label").as("lb")), Seq("id_b"), "left")
      .filter(col("la").isNull || col("lb").isNull || col("la") =!= col("lb")).count()
    val minViol = cc.groupBy(col("label")).agg(min(col("v")).as("min_v"))
      .filter(col("label") =!= col("min_v")).count()
    // vertex completeness: cc must cover exactly the pair endpoints
    val nEndpoints = pairs.select(col("id_a").as("v"))
      .union(pairs.select(col("id_b").as("v"))).distinct().count()
    val nVerts = cc.count()
    val vertViol = if (nVerts == nEndpoints) 0L else 1L
    // keep-one identity, derived from the SAME cc result (running
    // dedupByPairs would re-run the whole iterative loop)
    val losers = cc.filter(col("v") =!= col("label")).select(col("v").as("doc_id"))
    val kept = docs.join(losers, Seq("doc_id"), "left_anti").count()
    val nDocs = docs.count()
    val nComponents = cc.select(col("label")).distinct().count()
    val keepViol = if (kept == nDocs - nVerts + nComponents) 0L else 1L
    pairs.unpersist()
    val spark = s
    import spark.implicits._
    Seq(edgeViol + minViol + vertViol + keepViol).toDF("n_violations")
  }

  /** SimHash clustering: docs per 32-bit simhash value (rows-only). */
  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(Dedup.simhash32(col("text")).as("simhash"))
      .groupBy(col("simhash")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("simhash"))

  /** Winnowing fingerprint + subword counts per doc (rows-only). */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextStats.fingerprints(col("text"), 5, 4)).as("n_fingerprints"),
        TextStats.subwordCount(col("text")).as("n_subwords"))
      .orderBy(col("doc_id"))

  /** Exact brute-force cosine top-5 for 10 query vectors. */
  private def qTopkSimilar(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-5 (the scale path; rows-only check —
    * the bucket contents are hash-dependent. [[qAnnContainment]] is the
    * semantic check on this path).
    */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Semantic check for the ANN path: every LSH top-k hit's cosine must
    * (a) agree with an independently-formulated exact cosine for that
    * pair (dot/norms on the raw vectors, vs the ANN path's
    * normalize-then-dot) and (b) not exceed the true best cosine for its
    * query (brute-force top-1). Violations = 0, oracled as SELECT 0 —
    * a wrong normalization, a mixed-up pair, or an inflated score all
    * fire this.
    */
  private def qAnnContainment(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val ann = Similarity.lshTopK(queries, e, "vec_id", "embedding", 5)
    val qRaw = e.select(col("vec_id").as("query_id"), col("embedding").as("qv_raw"))
    val nRaw = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv_raw"))
    val best = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 1)
      .select(col("query_id"), col("cos").as("best_cos"))
    ann.join(broadcast(qRaw), "query_id").join(nRaw, "neighbor_id")
      .withColumn("cos_indep", Similarity.cosine(col("qv_raw"), col("nv_raw")))
      .join(broadcast(best), "query_id")
      .agg(coalesce(sum(
        when(abs(col("cos") - col("cos_indep")) > 1e-9 ||
          col("cos") > col("best_cos") + lit(1e-9), 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
  }

  /** IVF (k-means cell) approximate top-5 — learned-partition ANN
    * (rows-only check: k-means init is engine-specific).
    */
  private def qIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Semantic check for int8 embedding quantization: reconstruction
    * error per element must stay within the scale/2 bound and every
    * quantized value within [-127, 127], across the whole corpus.
    * Violations = 0 (oracle SELECT 0) — a wrong scale, rounding mode, or
    * overflow fires this.
    */
  private def qQuantize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val withQ = e.select(
      Similarity.toDoubleArr(col("embedding")).as("v"),
      Similarity.quantize(col("embedding")).as("qv"))
    val maxErr = array_max(zip_with(col("v"), Similarity.dequantize(col("qv")),
      (a, b) => abs(a - b)))
    val maxQ = array_max(transform(col("qv").getField("q"), x => abs(x.cast("int"))))
    withQ.select(
        maxErr.as("max_err"),
        col("qv").getField("scale").cast("double").as("scale"),
        maxQ.as("max_q"))
      .agg(coalesce(sum(when(
        col("max_err") > col("scale") * 0.5 * (1 + 1e-6) + 1e-12 ||
          col("max_q") > 127, 1L).otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** Integer-exact k-means ([[graft.text.Cluster.kmeansInt]]): embeddings
    * globally quantized to the integer lattice (round(x·1000)), then 3
    * Lloyd rounds with 8 centers — initial centers are the 8 smallest
    * vec_ids, ties break to the smaller cluster, centroids floor to the
    * lattice, empty clusters keep their center. Every assignment and
    * squared distance is integer arithmetic, so the oracle REPLAYS THE
    * WHOLE TRAINING as 3 unrolled CTE rounds and must land on identical
    * clusters AND identical distances for all rows — one wrong tiebreak,
    * floor, or stale center anywhere diverges the chain.
    */
  private def qKmeans(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
    Cluster.kmeansInt(d, "vec_id", "q", k = 8, iters = 3)
      .orderBy(col("vec_id"))
  }

  /** Cluster-balanced sampling — the curation move k-means exists FOR:
    * train lattice cells ([[graft.text.Cluster.kmeansInt]], 2 rounds),
    * then keep at most 40 docs per cell by the unbiased md5-hash order
    * ([[graft.ops.Sampling.capPerGroup]]), so over-represented regions of
    * embedding space are capped while sparse regions survive intact
    * (diversity-preserving selection). Selection-exact: the per-cell
    * kept-id sums only match if the ENTIRE training replay and the hash
    * selection both agree.
    */
  private def qClusterSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
    val cells = Cluster.kmeansInt(d, "vec_id", "q", k = 8, iters = 2)
    Sampling.capPerGroup(cells, Seq("cluster"), "vec_id", 40)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("sum_kept_ids"))
      .orderBy(col("cluster"))
  }

  /** PQ/ADC approximate top-5 ([[graft.text.Pq]]): per-subspace integer
    * codebooks (2×8 codes, 2 Lloyd rounds), corpus encoded to 2 code ids,
    * asymmetric-distance scan against the 10-query LUT. Fully oracled —
    * the lossy index replays bit-for-bit (training, codes, ADC sums,
    * ranks), unlike the float ANN paths which get containment laws.
    */
  private def qPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
    val cb = Pq.train(e, "vec_id", "q", d = 64, m = 2, k = 8, iters = 2)
    Pq.adcTopK(e, e.filter(col("vec_id") < 10), "vec_id", "q", cb, topK = 5)
      .select(col("query_id"), col("neighbor_id"), col("approx_d2"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ recall@5 law ([[qPq]] vs exact lattice brute force): per query,
    * how many of the ADC top-5 appear in the true integer top-5. Both
    * sides replay bit-for-bit, so the recall NUMERATORS are oracle-exact
    * — a measured quality figure for the lossy index, not just a
    * containment bound. Validation query (re-runs training + an
    * oracle-scale brute scan; excluded from the bench workload).
    */
  private def qPqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
    val cb = Pq.train(e, "vec_id", "q", d = 64, m = 2, k = 8, iters = 2)
    val pq5 = Pq.adcTopK(e, e.filter(col("vec_id") < 10), "vec_id", "q", cb, topK = 5)
      .select(col("query_id"), col("neighbor_id"))
    val brute = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("__qv"))
      .crossJoin(e.select(col("vec_id").as("neighbor_id"), col("q").as("__nv")))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("__qv"), col("__nv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val b5 = brute.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__in"))
    pq5.join(b5, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__in"), lit(0))).cast("long").as("n_overlap"))
      .orderBy(col("query_id"))
  }

  /** Embedding near-dup pairs above cosine 0.45 — the brute-force O(n²)
    * baseline, scoped to small-SF oracle duty only. The production path is
    * [[qEmbedPairsLsh]]; its semantics are verified against this baseline
    * by [[qLshContainment]].
    */
  private def qEmbedPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
      .orderBy(col("id_a"), col("id_b"))

  /** Semantic check for the bucketed near-dup path: every pair emitted by
    * [[Similarity.lshNearDupPairs]] must appear in the brute-force
    * above-threshold set (LSH candidates are re-scored with the exact
    * cosine, so containment must be exact). Violations = 0, a scalar the
    * oracle verifies as SELECT 0 — this graduates the scale path from a
    * rows-only check to a verified-semantics one.
    */
  private def qLshContainment(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val lsh = Similarity.lshNearDupPairs(e, "vec_id", "embedding", threshold = 0.3, nPlanes = 4)
      .select(col("id_a"), col("id_b"))
    val brute = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    lsh.join(brute, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
  }

  // ------------------------------------------------------- multimodal

  /** Binary payload metadata (size, sha256 content key, format sniff) over
    * text-as-binary payloads.
    */
  private def qBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").withColumn("payload", col("text").cast("binary"))
    Multimodal.withBinaryMeta(d, "payload")
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"), col("sha"), col("format"))
      .orderBy(col("doc_id"))
  }

  /** REAL image decode ([[graft.multimodal.Multimodal.decodePpm]] — a
    * complete pure-JVM P6 parser). The testdata carries no image column,
    * so each document's bytes are wrapped in a genuine PPM container
    * (header + raw RGB data) in-query; the decoder then parses that
    * container from the payload bytes alone — magic, dimensions, maxval,
    * data offset — and computes per-channel pixel sums. The oracle
    * recomputes every output from the raw text independently, so a
    * misread header, a wrong data offset, or a channel-interleave slip
    * all hash-mismatch.
    */
  private def qDecode(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      // 4-pixel-wide rows: h = ⌊bytes/12⌋ full rows of 4 RGB pixels
      .withColumn("h", floor(octet_length(col("bytes")) / 12).cast("int"))
      .select(col("doc_id"),
        concat(
          concat(lit("P6\n4 "), col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("bytes").substr(lit(1), col("h") * 12)).as("payload"))
    Multimodal.decodePpm(d, "doc_id", "payload")
      .select(col("doc_id"), col("width"), col("height"), col("maxval"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget selection — keep the BEST documents (by quality score,
    * doc_id tiebreak) until a global token budget fills: quality ranking
    * plus an exact GLOBAL running token total via
    * [[graft.ops.Ids.withRunningTotals]] (range-partitioned prefix sums —
    * no single-partition window), cut at 10k tokens. The per-doc
    * cumulative emitted alongside the selection makes the check
    * prefix-exact, not just membership-exact: one document ranked or
    * summed differently anywhere shifts every later cumulative. The
    * oracle is a plain windowed sum over the same (quality DESC, doc_id)
    * order — DuckDB can afford the single-partition window at oracle
    * scale; the operator can't at 100 TB, which is the point.
    */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
        (-TextStats.qualityScore(col("text"))).as("__negq"))
    graft.ops.Ids.withRunningTotals(d, Seq("__negq", "doc_id"), Seq("n_tok"))
      .filter(col("n_tok_cum") <= 10000)
      .select(col("doc_id"), col("n_tok"), col("n_tok_cum").as("cum_tok"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate-line removal ([[graft.text.Boilerplate.stripBoilerplateLines]],
    * C4-style): the fixture text has no line structure, so each document's
    * tokens are first re-joined into 10-token lines (the same
    * synthesize-in-query pattern the codec queries use), then lines
    * appearing in ≥ 3 documents are stripped and the text reassembled in
    * original order. The md5 of the cleaned text is selection-exact: one
    * line kept, dropped, or reordered differently anywhere breaks it. The
    * oracle replays the chain with line STRINGS where the operator
    * aggregates 8-byte line hashes — so it also certifies the hash-first
    * shuffle loses nothing at this scale.
    */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    // pre-fold any literal newline into a space on BOTH sides: a token
    // containing the line separator would otherwise re-split inside the
    // operator while the oracle's line units stay 10-token groups —
    // a silent divergence armed by any future fixture with \n in text
    val lined = t(s, dir, "documents")
      .withColumn("w", split(translate(col("text"), "\n", " "), " "))
      .withColumn("lined", concat_ws("\n",
        transform(sequence(lit(0), (ceil(size(col("w")) / lit(10.0)) - 1).cast("int")),
          i => array_join(slice(col("w"), i * lit(10) + 1, lit(10)), " "))))
      .select(col("doc_id"), col("lined"))
    Boilerplate.stripBoilerplateLines(lined, "doc_id", "lined", "\n", minDocs = 3)
      .select(col("doc_id"), md5(col("lined")).as("sig"),
        col("n_kept"), col("n_dropped"))
      .orderBy(col("doc_id"))
  }

  /** REAL image resize ([[graft.multimodal.Multimodal.resizePpmNearest]])
    * proven through the engine's own codec: each document's bytes become
    * a genuine 4×h P6 container (same synthesis as [[qDecode]]), the
    * resizer halves the width by nearest-neighbor (src_x = 2·dst_x), and
    * [[graft.multimodal.Multimodal.decodePpm]] then parses the RESIZED
    * container back — so the query only passes if the resizer emits a
    * valid P6 whose pixel grid is exactly the sampled sub-grid. The
    * oracle recomputes the resized channel sums from the raw text with
    * independent index arithmetic (byte (4·y + 2·x)·3 + c).
    */
  private def qResize(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .withColumn("h", floor(octet_length(col("bytes")) / 12).cast("int"))
      .select(col("doc_id"),
        concat(
          concat(lit("P6\n4 "), col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("bytes").substr(lit(1), col("h") * 12)).as("payload"))
    val small = Multimodal.resizePpmNearest(d, "doc_id", "payload", outW = 2, outH = 0)
    Multimodal.decodePpm(small, "doc_id", "resized")
      .select(col("doc_id"), col("width"), col("height"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio decode ([[graft.multimodal.Multimodal.decodeWav]] — a
    * complete pure-JVM RIFF/WAVE chunk walker). The testdata carries no
    * audio column, so each document's bytes are first wrapped in a genuine
    * 44-byte PCM WAV container ([[graft.multimodal.Multimodal.encodeWavPcm16]],
    * sample rate varying per row to exercise the header parse), then the
    * decoder recovers channel count, rate, bit width, frame count, and the
    * exact signed-sample sum from the payload bytes alone. The oracle
    * recomputes all of it from the raw text independently (16-bit LE
    * reassembly in SQL), so a wrong chunk offset, an endianness slip, or a
    * sign-extension bug all hash-mismatch.
    */
  private def qWav(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        (lit(8000) + (col("doc_id") % 3).cast("int") * lit(4000)).as("rate"))
    val wav = Multimodal.encodeWavPcm16(d, "doc_id", "bytes", "rate")
    Multimodal.decodeWav(wav, "doc_id", "payload")
      .select(col("doc_id"), col("n_channels"), col("sample_rate"), col("bits"),
        col("n_frames"), col("sum_ch0"))
      .orderBy(col("doc_id"))
  }

  /** REAL video frame sampling ([[graft.multimodal.Multimodal.sampleAviFrames]]
    * — a complete pure-JVM RIFF/AVI demuxer) proven through the engine's
    * own writer: each document's bytes become packed top-down RGB24
    * frames of a 2×2 video (12 source bytes per frame),
    * [[graft.multimodal.Multimodal.encodeAviRgb24]] wraps them in a
    * genuine AVI container (DIB convention: bottom-up rows, BGR samples,
    * rows padded to 4 bytes — 2·3=6-byte rows pad to 8), and the demuxer
    * samples every 2nd frame, so the query only passes if the chunk walk,
    * the pad-byte exclusion, AND the RGB→BGR/bottom-up round trip are all
    * exact. `top_b` pins the row order: the image-top-left blue sample of
    * sampled frame i is source byte 12·i+2, which the oracle recomputes
    * straight from the raw text with independent index arithmetic.
    */
  private def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("rgb"))
    val avi = Multimodal.encodeAviRgb24(d, "doc_id", "rgb", width = 2, height = 2)
    Multimodal.sampleAviFrames(avi, "doc_id", "payload", stride = 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("top_left_b").cast("long")).as("top_b"))
      .orderBy(col("doc_id"))
  }

  // ----------------------------------------------------- ranking / merge

  private val bm25Terms = Seq("spark", "vector", "stream", "merge")

  /** BM25 keyword relevance ([[graft.text.Rank.bm25Scores]], rational
    * rank-equivalent idf): per-(doc, term) scores for a fixed query-term
    * set, folded to per-document totals with a conditional aggregation —
    * one `max(when(term = t))` column per term, summed left-to-right — so
    * double addition order is explicit and the DuckDB oracle reproduces
    * every bit. Top 20 documents by total relevance.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame = {
    val scores = Rank.bm25Scores(t(s, dir, "documents"), "doc_id", "text", bm25Terms)
    val termCols = bm25Terms.map(term =>
      max(when(col("term") === term, col("score"))).as(s"s_$term"))
    val total = bm25Terms.map(term => coalesce(col(s"s_$term"), lit(0.0))).reduce(_ + _)
    scores.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
      .withColumn("total", total)
      .orderBy(col("total").desc, col("doc_id"))
      .limit(20)
  }

  /** Last-wins snapshot merge ([[graft.ops.Merge.upsert]]): fold a delta
    * of updated rows (status→'U', version 2) and inserted rows (offset
    * keys, status 'I') into the orders snapshot (version 1), then
    * aggregate the merged corpus per status — survivor selection, insert
    * pass-through, and base pass-through are all visible in the counts,
    * and `sum_version` pins WHICH version of each key survived.
    */
  private def qUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").withColumn("version", lit(1L))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("version", lit(2L))
    val inserts = base.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      .withColumn("o_orderstatus", lit("I"))
      .withColumn("version", lit(2L))
    Merge.upsert(base, updates.unionByName(inserts), Seq("o_orderkey"), "version")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_total"),
        sum(col("version")).as("sum_version"),
      )
      .orderBy(col("o_orderstatus"))
  }

  /** Funnel analysis ([[graft.ops.Funnel]]): users progressing through
    * view → click → purchase in event-time order (event_id tiebreak),
    * counted per step reached. The oracle deliberately uses a DIFFERENT
    * formulation (iterated first-match-after via row-comparison windows)
    * — agreement cross-checks the greedy-fold semantics, not just the
    * arithmetic.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.funnelCounts(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("step"))

  /** Exact fixed-width histogram ([[Profile.histogram]]) of lineitem
    * extended prices over [20000, 80000) ×16 bins — under/overflow bins
    * exercised on both tails.
    */
  private def qHistogram(s: SparkSession, dir: String): DataFrame =
    Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice", 20000.0, 80000.0, 16)
      .orderBy(col("bin"))

  /** Per-group mean imputation ([[graft.ops.Impute.imputePerGroup]]):
    * error events' values are masked to null, then imputed from each
    * user's exact-decimal mean of the present values. Output pins the
    * fill value per user (all imputed rows share it) plus the present
    * sum, so a wrong window frame, leaked null, or drifted mean all
    * surface.
    */
  private def qImpute(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    graft.ops.Impute.imputePerGroup(e, Seq("user_id"), "v", "mean")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_imputed"),
        min(when(col("v").isNull, col("v_imputed"))).as("fill_value"),
        dsum(col("v")).as("sum_present"),
      )
      .orderBy(col("user_id"))
  }

  /** Z-order curve ([[graft.ops.ZOrder.zValue]]): Morton codes over the
    * (partkey, suppkey) grid, aggregated per curve bucket — the bucket
    * membership counts pin every interleaved bit against the oracle's
    * independently-spelled shift/mask arithmetic.
    */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "lineitem").select(
      (col("l_partkey") % 1024).as("xg"), (col("l_suppkey") % 1024).as("yg"))
    g.withColumn("z", graft.ops.ZOrder.zValue(Seq(col("xg"), col("yg")), 10))
      .groupBy(shiftright(col("z"), 10).as("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xg")).as("sum_x"),
        sum(col("yg")).as("sum_y"),
      )
      .orderBy(col("zbucket"))
  }

  /** The oracle's Morton spelling: per-bit shift/mask/shift terms OR'd
    * together (column k's bit i at position i·n+k, matching zValue).
    */
  private def mortonSql(bits: Int, cols: Seq[String]): String = {
    val n = cols.size
    (for {
      i <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * n + k})").mkString(" | ")
  }

  /** Incremental aggregation ([[graft.ops.Incremental]]): three disjoint
    * order batches folded through aggState → mergeState → mergeState; the
    * oracle aggregates the whole table directly, so agreement proves
    * merge ≡ recompute down to the last decimal bit.
    */
  private def qIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Incremental.{aggState, mergeState, MAgg}
    val o = t(s, dir, "orders")
    val keys = Seq("o_orderpriority")
    val aggs = Seq(MAgg("o_totalprice", "sum"), MAgg("o_totalprice", "count"),
      MAgg("o_totalprice", "min"), MAgg("o_totalprice", "max"))
    def batch(i: Int) = o.filter(col("o_orderkey") % 3 === i)
    val merged = mergeState(
      mergeState(aggState(batch(0), keys, aggs), batch(1), keys, aggs),
      batch(2), keys, aggs)
    merged.select(
        col("o_orderpriority"),
        col("count_o_totalprice").as("n"),
        col("sum_o_totalprice").cast("double").as("sum_total"),
        col("min_o_totalprice").as("min_total"),
        col("max_o_totalprice").as("max_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** Vocabulary coverage ([[TextStats.oovRate]]): per-document OOV counts
    * against the corpus top-200 vocabulary.
    */
  private def qOov(s: SparkSession, dir: String): DataFrame =
    TextStats.oovRate(t(s, dir, "documents"), "doc_id", "text", 200)
      .orderBy(col("doc_id"))

  /** Text normalization ([[TextStats.normalizeText]]): every fifth doc is
    * dirtied (leading/trailing runs, upper case, tab, a control byte),
    * normalized, and summarized per language — length sums catch any
    * one-byte divergence from the oracle's RE2 rendition.
    */
  private def qNormalize(s: SparkSession, dir: String): DataFrame = {
    val messy = t(s, dir, "documents").withColumn("m",
      when(col("doc_id") % 5 === 0,
        concat(lit("  "), upper(col("text")), lit("\tX\u0001Y  ")))
        .otherwise(col("text")))
    messy.withColumn("norm", TextStats.normalizeText(col("m")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("norm"))).as("sum_len"),
        sum(when(col("norm") =!= col("text"), 1L).otherwise(0L)).as("n_changed"),
      )
      .orderBy(col("lang"))
  }

  /** Typed Dataset pipeline ([[graft.typed.Typed.prioritySummary]]):
    * case-class encoders + typed group key, Catalyst partial/final
    * aggregation retained (TypedSpec pins the plan).
    */
  private def qTypedAgg(s: SparkSession, dir: String): DataFrame =
    graft.typed.Typed.prioritySummary(graft.typed.Typed.orders(s, dir), 150000.0)
      .orderBy(col("o_orderpriority"))

  /** Deterministic negative sampling ([[Sampling.negativePairs]]): two
    * hash-derived partners per document via bucket-representative
    * pairing — reproduced id-for-id by the oracle's md5 arithmetic.
    */
  private def qNegPairs(s: SparkSession, dir: String): DataFrame =
    Sampling.negativePairs(t(s, dir, "documents").select(col("doc_id")), "doc_id", 2, 64)
      .orderBy(col("doc_id"), col("j"))

  /** Count-min sketch validation (the frequency sibling of q_hll's HLL
    * check): a 0.1%-width CMS over the token stream must bound every
    * top-10 token's true count from above within eps·N, and never
    * undercount (CMS's one-sided guarantee). Deterministic under the
    * fixed seed; violations = 0 (oracle SELECT 0). The sketch itself is
    * a few KB — aggregate it distributed, read it driver-side: the
    * mergeable-sketch pattern for 100 TB frequency monitoring.
    */
  private def qCms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(TextStats.tokens(col("text"))).as("w"))
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(10).collect()
    val eps = 0.001
    // one pass supplies the token count AND the sketch (a second scan
    // for count() would re-tokenize the corpus)
    val aggRow = toks
      .agg(count(lit(1)).as("n"),
        count_min_sketch(col("w"), lit(eps), lit(0.99), lit(42)).as("sk"))
      .head()
    val n = aggRow.getAs[Long]("n")
    val bytes = aggRow.getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    // The eps·N overcount bound holds per estimate only with the sketch's
    // 0.99 confidence; testing 10 tokens at exactly eps·N would fail a
    // CORRECT sketch on ~1 in 10 fixtures. 2·eps·N keeps the check
    // meaningful (undercounting is still impossible and the width is
    // still 0.2% of N) while the spill-past-2eps probability is
    // negligible. Deterministic for a given fixture under seed 42.
    val violations = top.count { r =>
      val est = cms.estimateCount(r.getString(0))
      est < r.getLong(1) || est > r.getLong(1) + (2 * eps * n).ceil.toLong
    }
    Seq(violations.toLong).toDF("n_violations")
  }

  /** Interval-overlap join ([[RangeJoin.intervalOverlap]]): 5-minute
    * event windows × 10-minute error windows per user, pair counts per
    * user. The oracle is DuckDB's native inequality join — an
    * independent formulation that cross-checks the bucket explosion AND
    * the canonical-bucket dedup (any double-emitted pair breaks the
    * counts).
    */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val a = e.select(col("user_id"), col("ts").as("a_start"),
      expr("ts + INTERVAL 5 MINUTE").as("a_end"))
    val b = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_start"),
        expr("ts + INTERVAL 10 MINUTE").as("err_end"), col("event_id"))
    RangeJoin.intervalOverlap(a, b, Seq("user_id"),
        "a_start", "a_end", "err_start", "err_end", Seq("event_id"),
        // buckets sized to the interval lengths (5-10 min): explosion
        // factor stays ~1-2 while per-bucket join occupancy drops 4×
        // vs the 1-hour default
        bucketWidthUs = 15L * 60 * 1000000)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
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

  /** Semantic check for the IVF path: probing EVERY cell must reproduce
    * the brute-force top-k exactly — same neighbors, same ranks, same
    * cosine bits (both paths share the normalize+dot scoring and the
    * (cos desc, id) tiebreak). A wrong cell assignment, a dropped
    * member, or a scoring drift all fire it. Violations = 0.
    */
  private def qIvfExact(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(queries, e, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 16)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("n_ivf"), col("cos").as("cos_ivf"))
    val bf = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("n_bf"), col("cos").as("cos_bf"))
    ivf.join(bf, Seq("query_id", "rank"), "full_outer")
      .agg(coalesce(sum(when(
        col("n_ivf").isNull || col("n_bf").isNull ||
          col("n_ivf") =!= col("n_bf") || col("cos_ivf") =!= col("cos_bf"), 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** Semantic check for the SimHash path, both directions: (a) every
    * candidate's reported Hamming distance must equal an independent
    * full-32-bit recompute and respect the threshold; (b) within the
    * banding recall-guarantee domain — pairs agreeing on one of the two
    * 16-bit halves — every pair under the threshold must have been
    * emitted. Violations = 0.
    */
  private def qSimhashContainment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cand = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
    val hashed = docs.select(col("doc_id"), Dedup.simhash32(col("text")).as("sh"))
    val all = hashed.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(hashed.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hx", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
    val v1 = cand
      .join(all.select(col("id_a"), col("id_b"), col("hx")), Seq("id_a", "id_b"), "left")
      .agg(coalesce(sum(when(col("hx").isNull ||
        col("hamming") =!= col("hx") || col("hamming") > 3, 1L).otherwise(0L)), lit(0L))
        .as("v"))
    val v2 = all
      .filter((shiftright(col("sh_a"), 16) === shiftright(col("sh_b"), 16)) ||
        (col("sh_a").bitwiseAND(lit(0xFFFFL)) === col("sh_b").bitwiseAND(lit(0xFFFFL))))
      .filter(col("hx") <= 3)
      .join(cand, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("v"))
    v1.unionByName(v2).agg(coalesce(sum(col("v")), lit(0L)).as("n_violations"))
  }

  /** Semantic check for winnowing fingerprints (the last rows-only
    * family): (a) membership — every fingerprint is the minimum of some
    * k-gram window, hence an element of the document's k-gram hash set;
    * (b) the winnowing guarantee — a common substring of ≥ w+k-1 grams
    * shares at least one fingerprint, so prefixing a document must leave
    * a non-empty fingerprint intersection for any document with ≥ w+k-1
    * grams. Violations = 0 (Schleimer et al., SIGMOD'03, §2).
    */
  private def qFingerprintContainment(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ArrayMath
    val docs = t(s, dir, "documents")
    val toks = TextStats.tokens(col("text"))
    val grams = ArrayMath.shingleHash64(toks, 5, distinct = false)
    val fp = TextStats.fingerprints(col("text"))
    val fpShifted = TextStats.fingerprints(concat(lit("p0 p1 p2 "), col("text")))
    docs.select(
        size(toks).as("n_toks"),
        size(array_except(fp, grams)).as("n_escaped"),
        size(array_intersect(fp, fpShifted)).as("n_shared"))
      .agg(coalesce(sum(
        when(col("n_escaped") > 0, 1L)
          .when(col("n_toks") >= 12 && col("n_shared") === 0, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** TF-IDF keyword extraction ([[Rank.tfidfTopTerms]]): top-3 terms per
    * document (df over the full corpus, output scoped to the first 50
    * docs to keep the verified surface small).
    */
  private def qTfidf(s: SparkSession, dir: String): DataFrame =
    Rank.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))

  /** Sketch-bound validation for approximate quantiles (completing the
    * HLL/CMS family): each percentile_approx value must admit SOME rank
    * within the Greenwald-Khanna guarantee `|rank − q·n| ≤ n/accuracy`
    * (+1 row of integer slack). A duplicated value's valid ranks form
    * the interval [count(x < v), count(x ≤ v)] — the check passes iff
    * that interval intersects the GK window, so heavy duplicates at a
    * quantile boundary cannot spuriously fire it. Deterministic sketch,
    * violations = 0.
    */
  private def qQuantileBound(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val acc = 10000
    val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
    val approx = Profile.quantiles(li, Seq("x"), qs, acc)
      .select(posexplode(col("quantiles")).as(Seq("qi", "qv")))
    val qArr = array(qs.map(lit): _*)
    val slack = col("n").cast("double") / acc + 1.0
    val target = col("q") * col("n")
    li.crossJoin(broadcast(approx))
      .groupBy(col("qi"), col("qv"))
      .agg(
        sum(when(col("x") < col("qv"), 1L).otherwise(0L)).as("rank_lo"),
        sum(when(col("x") <= col("qv"), 1L).otherwise(0L)).as("rank_hi"),
        count(lit(1)).as("n"))
      .withColumn("q", try_element_at(qArr, col("qi") + 1))
      .agg(coalesce(sum(when(
        col("rank_lo") > target + slack || col("rank_hi") < target - slack, 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  // ------------------------------------------------------- bucketed join

  /** Write (once per session and sf dir) the two fact projections as
    * bucketed+sorted tables on their join keys — the storage layout that
    * makes repeated fact-fact joins Exchange-free.
    */
  private[graft] def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val liT = s"lineitem_bucketed$tag"
    val oT = s"orders_bucketed$tag"
    if (!s.catalog.tableExists(liT))
      graft.sources.Sources.writeBucketed(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
        liT, Seq("l_orderkey"), numBuckets = 8)
    if (!s.catalog.tableExists(oT))
      graft.sources.Sources.writeBucketed(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        oT, Seq("o_orderkey"), numBuckets = 8)
    (liT, oT)
  }

  /** The fact-fact join+agg used by [[qBucketedJoin]] on both layouts.
    * The merge hint keeps the join a sort-merge even when one side would
    * fit a broadcast at test SF — at 100 TB neither side broadcasts, and
    * the point is the Exchange-free bucketed plan (PlanSpec asserts it).
    */
  private[graft] def factFactJoinAgg(li: DataFrame, o: DataFrame, suffix: String): DataFrame =
    li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as(s"n_items$suffix"),
        dsum(col("l_extendedprice")).as(s"revenue$suffix"),
      )

  /** Validation: the bucketed-layout join must agree with the raw-frame
    * join exactly — per-priority counts and decimal-exact revenue both.
    * Disagreements = 0 (oracle SELECT 0). Bench-excluded (validation
    * harness); the plan property it guards is asserted in PlanSpec.
    */
  private def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (liT, oT) = bucketedTables(s, dir)
    val bucketed = factFactJoinAgg(s.table(liT), s.table(oT), "_b")
    val plain = factFactJoinAgg(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")), "_p")
    bucketed.join(plain, Seq("o_orderpriority"), "full_outer")
      .agg(coalesce(sum(when(
        col("n_items_b").isNull || col("n_items_p").isNull ||
          col("n_items_b") =!= col("n_items_p") ||
          col("revenue_b") =!= col("revenue_p"), 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
  }

  /** REAL audio resampling ([[graft.multimodal.Multimodal.resampleWav]])
    * container-to-container: each document's bytes become a genuine
    * 12 kHz PCM16 WAV ([[graft.multimodal.Multimodal.encodeWavPcm16]]),
    * the resampler decimates to 8 kHz by exact rational nearest-pick
    * (output frame j ← source frame ⌊3j/2⌋, n_out = ⌊2·n_in/3⌋) and
    * re-encodes a valid WAV, which
    * [[graft.multimodal.Multimodal.decodeWav]] then parses back — so the
    * query only passes if the resampled container is well-formed AND the
    * picked samples are exactly right: the oracle recomputes the signed
    * sum of every ⌊3j/2⌋-th 16-bit LE sample straight from the raw text.
    */
  private def qAudioResample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        lit(12000).as("rate"))
    val wav = Multimodal.encodeWavPcm16(d, "doc_id", "bytes", "rate")
    val res = Multimodal.resampleWav(wav, "doc_id", "payload", dstRate = 8000)
    Multimodal.decodeWav(res, "doc_id", "resampled")
      .select(col("doc_id"), col("sample_rate"), col("n_frames"), col("sum_ch0"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-pruned semi join ([[graft.ops.Bloom]]): a selective order-side
    * predicate builds a bloom filter over the surviving keys; the fact
    * side is pruned by codegen'd `might_contain` BEFORE its shuffle, then
    * the exact semi join removes the false positives — result identical
    * to a plain semi join (the oracle), shuffle volume proportional to
    * selectivity instead of table size.
    */
  private def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val hot = t(s, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))
    graft.ops.Bloom.bloomSemiJoin(t(s, dir, "lineitem"), hot,
        "l_orderkey", "o_orderkey", expectedItems = 100000L)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Blocked fuzzy (Levenshtein ≤ 1) duplicate pairs over customer names,
    * nation as the blocking key ([[graft.text.Fuzzy.fuzzyDupPairs]]) —
    * the record-linkage candidate generator: one equi-shuffle on the
    * block key, banded threshold DP within blocks, never a cross product.
    */
  private def qFuzzyJoin(s: SparkSession, dir: String): DataFrame =
    graft.text.Fuzzy.fuzzyDupPairs(t(s, dir, "customer"), "c_custkey", "c_name",
        Seq(col("c_nationkey")), maxDist = 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))

  /** Regular-grid resample with gap fill
    * ([[graft.ops.Timeseries.resampleGapFill]]): per-user hourly buckets,
    * exact decimal sums, empty buckets flagged and forward-filled — all
    * three stages co-partitioned on the series key.
    */
  private def qResample(s: SparkSession, dir: String): DataFrame =
    Timeseries.resampleGapFill(
        t(s, dir, "events").filter(col("user_id") < 3),
        Seq("user_id"), "ts", stepSeconds = 3600,
        aggs = Seq(dsum(col("value")).as("sum_value")))
      .select(col("user_id"),
        date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("sum_value"), col("is_gap"))
      .orderBy(col("user_id"), col("bucket"))

  /** Robust outlier gate ([[graft.ops.Outliers]]): per-status Tukey
    * fences from EXACT quartiles (single-pass percentile aggregate, no
    * sort), bounds broadcast back onto rows, outliers counted. Quantile
    * interpolation uses exact powers-of-two fractions, so the fences are
    * bit-identical to the DuckDB oracle's `quantile_cont`.
    */
  private def qOutliers(s: SparkSession, dir: String): DataFrame = {
    // Flags are computed against the RAW fences (straddle odds ~1e-15);
    // the emitted q1/q3/lo/hi are INTEGER MICRO UNITS on both sides:
    // round(x, 6) doubles diverged across engines for a fence sitting on
    // a rounding boundary (two red rounds), while the micro grid is safe
    // because the quantiles are quarter-cent multiples, so x*1e6 lands
    // thousands of ulps away from any .5 boundary.
    def micro(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    graft.ops.Outliers.flagIqrOutliers(
        t(s, dir, "orders"), Seq("o_orderstatus"), "o_totalprice")
      .groupBy(col("o_orderstatus"))
      .agg(micro(first(col("q1"))).as("q1_micro"), micro(first(col("q3"))).as("q3_micro"),
        micro(first(col("lo"))).as("lo_micro"), micro(first(col("hi"))).as("hi_micro"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  /** Exact-moment Pearson correlation in long form
    * ([[graft.ops.Profile.corrExact]]): decimal moment sums (order-free,
    * partial-agg-safe), closed-form r in one deterministic double
    * expression — streaming `corr()` could never hash-match across
    * engines.
    */
  private def qCorr(s: SparkSession, dir: String): DataFrame =
    // All three columns are 2-dp fixed point, so the scaled-long fast
    // path applies: moments become codegen long products feeding compact
    // decimal sums (3.7s → ~1s at sf0.1 vs the double→BigDecimal path).
    // r is scale-invariant; it is emitted rounded to 12 dp because the
    // final int128→double casts differ in the last ulp across engines.
    Profile.corrExactScaled(t(s, dir, "lineitem"), Seq("l_returnflag"),
        Seq("l_quantity" -> "l_extendedprice", "l_quantity" -> "l_discount",
          "l_extendedprice" -> "l_discount"),
        Map("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 2))
      .select(col("l_returnflag"), col("x_col"), col("y_col"), col("n"),
        round(col("corr"), 12).as("corr"))
      .orderBy(col("l_returnflag"), col("x_col"), col("y_col"))

  /** Golden-record consolidation ([[graft.ops.Merge.consolidate]]): per
    * user, each column independently takes its most recent NON-NULL
    * value (error events null out `value`), one window shuffle. The
    * column-level upgrade of row-level last-wins upsert.
    */
  private def qConsolidate(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("user_id") < 20)
      .withColumn("value",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
    Merge.consolidate(e, Seq("user_id"), "ts", Seq("value"), tieBreak = Seq("event_id"))
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Exact equal-frequency binning ([[graft.ops.Binning]]): rank-based
    * ntile per return flag (bounded group partitions — the exact form's
    * domain), bucket stats aggregated. The sketch-cutpoint form is the
    * scale path (BinningSpec covers it; its bins are approximate by
    * construction, so the exact form carries the oracle).
    */
  private def qBinning(s: SparkSession, dir: String): DataFrame =
    graft.ops.Binning.discretizeEqualFreq(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice", nBins = 4,
        tieBreak = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("l_returnflag"), col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .orderBy(col("l_returnflag"), col("bin"))

  /** Weekly cohort retention ([[graft.ops.Funnel.retentionMatrix]]):
    * users cohorted by first-event week, distinct-active counted per
    * (cohort, week offset) — two co-partitioned shuffles on user_id.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.retentionMatrix(t(s, dir, "events"), "user_id", "ts",
        periodSeconds = 7L * 24 * 3600)
      .select(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort_week"),
        col("period"), col("n_active"))
      .orderBy(col("cohort_week"), col("period"))

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
    val vOnce = s1.agg((
      (count(lit(1)) =!= 100).cast("long") +
        (count(lit(1)) - countDistinct(col("doc_id"))) +
        coalesce(sum(when(col("doc_id") % 10 === 0, 1L).otherwise(0L)), lit(0L)))
      .as("v"))
    val vRerun = s1.select(col("doc_id")).exceptAll(ids.select(col("doc_id")))
      .agg(count(lit(1)).as("v"))
    vOnce.unionByName(vRerun)
      .agg(coalesce(sum(col("v")), lit(0L)).as("n_violations"))
  }

  /** SCD2 history ([[graft.ops.Cdc.scd2]]): per-user event_type change
    * history from the events log — unchanged runs compressed, validity
    * intervals chained by one lead. event_id rides along as the
    * interval's unique id (deterministic under ts ties). One shuffle on
    * user_id; both window passes share it.
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame =
    graft.ops.Cdc.scd2(
        t(s, dir, "events").select("user_id", "event_id", "ts", "event_type"),
        Seq("user_id"), "ts", Seq("event_type"), tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("effective_from"), "yyyy-MM-dd HH:mm:ss").as("effective_from"),
        date_format(col("effective_to"), "yyyy-MM-dd HH:mm:ss").as("effective_to"),
        col("is_current"))
      .orderBy(col("user_id"), col("event_id"))

  /** Snapshot diff ([[graft.ops.Cdc.diffSnapshots]]): two deterministic
    * corpus versions derived from orders (drop-by-modulus on each side,
    * status flip on the new side) diffed into insert/update/delete rows.
    * One full-outer hash join on the key.
    */
  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val old = orders.filter(col("o_orderkey") % 7 =!= 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val nw = orders.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))
    graft.ops.Cdc.diffSnapshots(old, nw, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Data-quality expectations ([[graft.ops.Expectations]]): six rule
    * kinds over lineitem evaluated in ONE aggregation pass (the InRange
    * and InSet rules are deliberately violated by the data — the report
    * must count, not just flag).
    */
  private def qExpectations(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations.Rule
    graft.ops.Expectations.check(t(s, dir, "lineitem"), Seq(
      Rule.NotNull("l_returnflag"),
      Rule.Unique(Seq("l_orderkey", "l_linenumber")),
      Rule.InRange("l_discount", 0.0, 0.05),
      Rule.InSet("l_returnflag", Seq("A", "N")),
      Rule.Matches("l_linestatus", "[OF]"),
      Rule.Satisfies("non_negative_price", col("l_extendedprice") >= 0),
    ))
  }

  /** Distribution drift ([[graft.ops.Drift.psi]]): PSI between the view
    * and purchase event-value distributions over explicit cutpoints.
    * Counts are exact; the irrational PSI term is rounded to 6 dp on
    * both sides (ln differs in the last ulp across libm builds).
    */
  private def qDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.ops.Drift.psi(
        ev.filter(col("event_type") === "view").select(col("value")),
        ev.filter(col("event_type") === "purchase").select(col("value")),
        "value", driftCuts)
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(col("psi_term"), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  private val driftCuts = Seq(25.0, 50.0, 75.0, 100.0, 150.0, 200.0, 250.0, 300.0)

  /** Rolling z-score anomalies ([[graft.ops.Timeseries.flagAnomalies]]):
    * trailing-50 per-event-type baseline, |z| > 3 flags. Moments ride
    * exact decimal sums then one double cast — bit-equal across engines
    * (sqrt is IEEE-exact, unlike ln), so zscore itself is oracled.
    */
  private def qAnomaly(s: SparkSession, dir: String): DataFrame =
    Timeseries.flagAnomalies(t(s, dir, "events"), Seq("event_type"),
        Seq("ts", "event_id"), col("value"), n = 50, z = 3.0, minPeriods = 10)
      .filter(col("is_anomaly"))
      // filter on the raw z (ulp-straddle odds at the 3.0 fence ~1e-15);
      // emit it rounded so a last-ulp engine difference can't flip the hash
      .select(col("event_type"), col("event_id"), col("value"),
        round(col("zscore"), 6).as("zscore"))
      .orderBy(col("event_type"), col("event_id"))

  /** Feature scaling ([[graft.ops.Scaling]]): per-return-flag z-score and
    * min-max scaled prices, emitted row-level for a keyed subset (no
    * aggregation over scaled doubles → no float-order hazard; the stats
    * themselves ride decimal sums and IEEE arithmetic, bit-equal to the
    * oracle's closed form).
    */
  private def qScale(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        col("l_extendedprice").as("z_price"),
        col("l_extendedprice").as("mm_price"))
    val scaled = graft.ops.Scaling.minMaxScale(
      graft.ops.Scaling.standardize(li, Seq("l_returnflag"), Seq("z_price")),
      Seq("l_returnflag"), Seq("mm_price"))
    // 9-dp rounding on both sides: the decimal-sum -> double cast is
    // correctly rounded in the JVM but not in DuckDB's int128 path, so
    // raw doubles can disagree in the final ulp.
    scaled.filter(col("l_orderkey") % 100 === 0)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("z_price"), 9).as("z_price"),
        round(col("mm_price"), 9).as("mm_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Bigram-LM quality scoring ([[graft.text.LangModel]]): train on 80%
    * of documents, score the held-out 20%. The oracled output is the
    * exact-integer sufficient statistics (bigram/unseen counts, model
    * count sums) that pin down tokenization + both model joins; the
    * ln-based `avg_logp` is a per-row monotone transform of them,
    * cross-libm-unsafe, and covered by LangModelSpec instead. Vocab is a
    * fixed constant so scoring stays one job (vocabSize() is a separate
    * count job a real pipeline runs once at train time).
    */
  private def qPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = LangModel.bigramCounts(docs.filter(col("doc_id") % 5 =!= 0), "text")
    LangModel.scoreDocs(docs.filter(col("doc_id") % 5 === 0), model,
        "doc_id", "text", vocab = 64)
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        col("sum_c12"), col("sum_c1"))
      .orderBy(col("doc_id"))
  }

  /** Event-type co-occurrence lift ([[graft.ops.Funnel.cooccurrenceLift]]):
    * unordered behavior pairs per user with lift over independence —
    * entity-co-partitioned self-join, broadcast marginals, one exact
    * long division (bit-deterministic, no rounding needed).
    */
  private def qCooccur(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.cooccurrenceLift(t(s, dir, "events"), "user_id", "event_type")
      .orderBy(col("item_a"), col("item_b"))

  /** Integer-exact PageRank ([[graft.ops.Graph.pageRank]]) over the
    * supplier co-occurrence graph (suppliers of consecutive lines in an
    * order). Every division is a truncating integer `div` in fixed
    * order, so 5 distributed iterations hash-match the oracle's
    * unrolled CTE chain exactly — float PageRank never could.
    */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    // (orderkey, linenumber) is NOT unique in this data; ordering by the
    // suppkey too makes the per-order supplier SEQUENCE deterministic
    // (ties beyond the suppkey cannot change it)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_suppkey"))
    val edges = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("src"),
        lead(col("l_suppkey"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
    graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5)
      .orderBy(col("node"))
  }

  /** Oracle for [[qPagerank]]: the identical integer recurrence with the
    * iteration loop unrolled into chained CTEs (DuckDB's recursive CTEs
    * allow only one self-reference, which the nodes-left-join shape
    * needs twice).
    */
  private def pagerankOracleSql: String = {
    val base = "((1000000000000 * 15) // 100) // (SELECT n FROM cnt)"
    val iters = (1 to 5).map { i =>
      s"""pr$i AS (
         |  SELECT nd.node, $base + (85 * COALESCE(c.m, 0)) // 100 AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank // od.d) AS m
         |    FROM e JOIN pr${i - 1} p ON e.src = p.node JOIN od ON od.src = e.src
         |    GROUP BY e.dst) c ON nd.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH nxt AS (
       |  SELECT l_suppkey AS src,
       |    lead(l_suppkey) OVER (PARTITION BY l_orderkey
       |                          ORDER BY l_linenumber, l_suppkey) AS dst
       |  FROM lineitem),
       |e AS (SELECT DISTINCT src, dst FROM nxt WHERE dst IS NOT NULL AND src <> dst),
       |nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
       |cnt AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |pr0 AS (SELECT node, 1000000000000 // (SELECT n FROM cnt) AS rank FROM nodes),
       |$iters
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM pr5 ORDER BY node""".stripMargin
  }

  /** Unrolled-CTE replay of [[graft.text.Cluster.kmeansInt]]'s training:
    * round r assigns with centers c(r-1) (arg_min with [dist, cluster]
    * tiebreak), then c(r) floors the per-dimension means — exactly the
    * operator's `(s - pmod(s, n)) div n` lattice rule (`//` on the
    * exact quotient agrees) — with empty clusters keeping their center
    * via the LEFT JOIN coalesce. The final SELECT assigns with the
    * last centers, mirroring the operator's post-loop projection.
    */
  /** `p` prefixes every CTE name so multiple instances compose in one
    * WITH (the PQ oracle trains one chain per subspace); `vecExpr` is the
    * integer-vector expression over `embeddings` (default: the ×1000
    * lattice quantization; PQ slices it per subspace).
    */
  private def kmeansOracleCtes(k: Int, iters: Int, p: String = "",
      vecExpr: String =
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"): String = {
    // assignment = lexicographic min over [dist, cluster] lists (DuckDB
    // compares lists element-wise; arg_min doesn't accept composite keys)
    val d2 = "list_sum(list_transform(list_zip(v.q, c.c), x -> (x[1]-x[2])*(x[1]-x[2])))"
    val rounds = (1 to iters).map { r =>
      s"""${p}a$r AS (
         |  SELECT v.vec_id, v.q,
         |    CAST(min([$d2, c.cluster])[2] AS INTEGER) AS cluster
         |  FROM ${p}v v, ${p}c${r - 1} c GROUP BY v.vec_id, v.q),
         |${p}c$r AS (
         |  SELECT p.cluster, coalesce(u.c, p.c) AS c
         |  FROM ${p}c${r - 1} p LEFT JOIN (
         |    SELECT cluster, list((s - ((s % n) + n) % n) // n ORDER BY pos) AS c
         |    FROM (
         |      SELECT a.cluster, pos.pos, SUM(a.q[pos.pos]) AS s, COUNT(*) AS n
         |      FROM ${p}a$r a CROSS JOIN ${p}pos pos GROUP BY a.cluster, pos.pos)
         |    GROUP BY cluster) u ON u.cluster = p.cluster)""".stripMargin
    }.mkString(",\n")
    s"""${p}v AS (
       |  SELECT vec_id, $vecExpr AS q
       |  FROM embeddings),
       |${p}pos AS (SELECT unnest(range(1, 1 + (SELECT max(len(q)) FROM ${p}v), 1)) AS pos),
       |${p}c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster, q AS c
       |  FROM ${p}v ORDER BY vec_id LIMIT $k),
       |$rounds,
       |${p}af AS (
       |  SELECT v.vec_id,
       |    CAST(min([$d2, c.cluster])[2] AS INTEGER) AS cluster,
       |    CAST(min([$d2, c.cluster])[1] AS BIGINT) AS dist
       |  FROM ${p}v v, ${p}c$iters c GROUP BY v.vec_id)""".stripMargin
  }

  /** PQ/ADC oracle: two prefixed [[kmeansOracleCtes]] chains train the
    * per-subspace codebooks on the sliced lattice vectors; codes come
    * from each chain's final assignment; the query-side LUT scores each
    * query subvector against the FINAL centers; ADC = exact integer sum
    * of the two lookups, top-5 per query with id tie-break.
    */
  private def pqOracleCtes(k: Int, iters: Int, d: Int): String = {
    val sub = d / 2
    val quant = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    def lut(p: String, lo: Int, hi: Int) =
      s"""${p}lut AS (
         |  SELECT qv.query_id, c.cluster AS code,
         |    list_sum(list_transform(list_zip(qv.q[$lo:$hi], c.c),
         |      x -> (x[1]-x[2])*(x[1]-x[2]))) AS d2
         |  FROM qv, ${p}c$iters c)""".stripMargin
    s"""${kmeansOracleCtes(k, iters, "s0_", s"($quant)[1:$sub]")},
       |${kmeansOracleCtes(k, iters, "s1_", s"($quant)[${sub + 1}:$d]")},
       |codes AS (
       |  SELECT a.vec_id, a.cluster AS c0, b.cluster AS c1
       |  FROM s0_af a JOIN s1_af b USING (vec_id)),
       |qv AS (
       |  SELECT vec_id AS query_id, $quant AS q
       |  FROM embeddings WHERE vec_id < 10),
       |cv AS (SELECT vec_id, $quant AS q FROM embeddings),
       |${lut("s0_", 1, sub)},
       |${lut("s1_", sub + 1, d)},
       |sc AS (
       |  SELECT l0.query_id, codes.vec_id AS neighbor_id,
       |    CAST(l0.d2 + l1.d2 AS BIGINT) AS approx_d2
       |  FROM codes
       |  JOIN s0_lut l0 ON l0.code = codes.c0
       |  JOIN s1_lut l1 ON l1.code = codes.c1 AND l1.query_id = l0.query_id)""".stripMargin
  }

  private def pqOracleSql(k: Int, iters: Int, d: Int): String =
    s"""WITH ${pqOracleCtes(k, iters, d)}
       |SELECT query_id, neighbor_id, approx_d2,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY approx_d2, neighbor_id) AS rank
       |FROM sc QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** PQ recall law: the ADC top-5 measured against the EXACT integer
    * brute-force top-5 on the same lattice vectors — both sides fully
    * deterministic, so the recall numerators are oracle-exact, unlike the
    * float ANN paths whose laws are containment-only.
    */
  private def pqRecallOracleSql(k: Int, iters: Int, d: Int): String =
    s"""WITH ${pqOracleCtes(k, iters, d)},
       |pq5 AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY approx_d2, neighbor_id) AS rank
       |  FROM sc QUALIFY rank <= 5),
       |bd AS (
       |  SELECT qv.query_id, cv.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(qv.q, cv.q),
       |      x -> (x[1]-x[2])*(x[1]-x[2]))) AS d2
       |  FROM qv CROSS JOIN cv),
       |b5 AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM bd QUALIFY rank <= 5)
       |SELECT p.query_id,
       |  CAST(SUM(CASE WHEN b.rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |FROM pq5 p LEFT JOIN b5 b USING (query_id, neighbor_id)
       |GROUP BY p.query_id ORDER BY p.query_id""".stripMargin

  private def kmeansOracleSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansOracleCtes(k, iters)}
       |SELECT vec_id, cluster, dist FROM af ORDER BY vec_id""".stripMargin

  /** [[kmeansOracleCtes]] composed with [[graft.ops.Sampling.capPerGroup]]'s
    * md5-order selection rule (q_cap_group's spelling) over the trained
    * cells: the cap keeps the same per-cluster ids only if the whole
    * training chain AND the hash order agree.
    */
  private def clusterSampleOracleSql(k: Int, iters: Int, cap: Int): String =
    s"""WITH ${kmeansOracleCtes(k, iters)},
       |r AS (
       |  SELECT cluster, vec_id,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM af)
       |SELECT cluster, COUNT(*) AS n_kept, CAST(SUM(vec_id) AS BIGINT) AS sum_kept_ids
       |FROM r WHERE rk <= $cap
       |GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Exact join-size pre-flight ([[graft.ops.Stats.joinSizeExact]]):
    * predicts the lineitem self-join cardinality on l_partkey WITHOUT
    * running the join (count-product over per-key counts). The oracle
    * MATERIALIZES the join and counts — the estimate must equal reality
    * row-for-row.
    */
  private def qJoinsize(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // The operator keeps DECIMAL(38,0) internally (a hot key can push the
    // pair count past Long.MaxValue), but the emitted row is BIGINT: at the
    // bench SF the totals fit comfortably (18.6M at sf0.1) and decimal
    // output columns hash differently across engines in the driver gate.
    graft.ops.Stats.joinSizeExact(li, "l_partkey", li, "l_partkey")
      .select(col("n_pairs").cast("long").as("n_pairs"),
        col("n_keys_matched"),
        col("max_key_pairs").cast("long").as("max_key_pairs"))
  }

  /** Wilson proportion CI ([[graft.ops.Stats.proportionCi]]): purchase
    * conversion per A/B variant (user_id parity) with 95% bounds — all
    * IEEE div/mul/sqrt on exact counts, mirrored bit-for-bit by the
    * oracle's formula.
    */
  private def qAbCi(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.proportionCi(
        t(s, dir, "events").withColumn("variant", (col("user_id") % 2).cast("int")),
        Seq("variant"), col("event_type") === "purchase")
      .orderBy(col("variant"))

  /** Lexical diversity ([[graft.text.TextStats.simpsonDiversity]]):
    * type-token ratio + Gini-Simpson index per document — entirely
    * rational (no ln, unlike Shannon entropy), so the scores themselves
    * are oracled bit-exact. Narrow map, no shuffle.
    */
  private def qDiversity(s: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        (size(array_distinct(toks)).cast("double") / size(toks).cast("double")).as("ttr"),
        TextStats.simpsonDiversity(col("text")).as("simpson"))
      .orderBy(col("doc_id"))
  }

  /** SCD2 + as-of composition: enrich each purchase with the event-type
    * interval ACTIVE at purchase time — [[graft.ops.Cdc.scd2]] builds
    * the validity intervals, [[graft.ops.AsOf.asofJoinBackward]] finds
    * the governing one (one key shuffle each). The oracle uses DuckDB's
    * native ASOF JOIN over the same compressed intervals. effective_from
    * is unique per user here (no same-user same-ts events), so the
    * as-of pick is tie-free on both engines.
    */
  private def qScd2Lookup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val dim = graft.ops.Cdc.scd2(
        ev.select("user_id", "event_id", "ts", "event_type"),
        Seq("user_id"), "ts", Seq("event_type"), tieBreak = Seq("event_id"))
      .select(col("user_id"), col("effective_from"),
        col("event_type").as("state_type"), col("event_id").as("interval_id"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    AsOf.asofJoinBackward(facts, dim, Seq("user_id"), "ts", "effective_from",
        Seq("state_type", "interval_id"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("asof_state_type").as("state_type"),
        col("asof_interval_id").as("interval_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Gaps-and-islands activity streaks
    * ([[graft.ops.Funnel.activityStreaks]]): longest consecutive-day run
    * and active-day count per user — one distinct, one window, one agg,
    * all on the entity key.
    */
  private def qStreaks(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.activityStreaks(t(s, dir, "events"), "user_id", "ts")
      .orderBy(col("user_id"))

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

  /** Validation for the sketch-only join-size bound
    * ([[graft.ops.Stats.joinSizeUpperBound]]): the CMS inner product can
    * never undercount the exact count-product — a deterministic law, so
    * violations = 0, oracle SELECT 0. A deliberately narrow width keeps
    * collisions (and the bound's slack) in play.
    */
  private def qJoinsizeBound(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val bound = graft.ops.Stats.joinSizeUpperBound(li, "l_partkey", li, "l_partkey",
      depth = 5, width = 1 << 10)
    val exact = graft.ops.Stats.joinSizeExact(li, "l_partkey", li, "l_partkey")
      .select(col("n_pairs"))
    bound.crossJoin(exact)
      .select(when(col("upper_bound") < col("n_pairs"), 1L).otherwise(0L)
        .as("n_violations"))
  }

  /** Skewed key shared by the heavy-hitter queries: 3 hot keys carrying
    * ~25% of lineitem between them, plus one cold key per order.
    */
  private def hhKeyed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").withColumn("hkey",
      when(col("l_orderkey") % 4 === 0,
        concat(lit("hot_"), (col("l_orderkey") % 3).cast("string")))
        .otherwise(concat(lit("cold_"), col("l_orderkey").cast("string"))))

  /** Exact heavy hitters ([[graft.ops.Frequency.heavyHitters]]): keys
    * above total/100 with exact counts — one map-combined shuffle plus a
    * 1-row broadcast total, no second scan.
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.ops.Frequency.heavyHitters(hhKeyed(s, dir), "hkey", k = 100)
      .orderBy(col("key"))

  /** Validation for the Misra-Gries sketch path
    * ([[graft.ops.Frequency.misraGries]]): every exact heavy hitter
    * (freq > n/100) must appear in the bounded-memory candidate set
    * (capacity 200 → guaranteed for freq > n/201). Violations = 0,
    * oracle SELECT 0.
    */
  private def qHhContainment(s: SparkSession, dir: String): DataFrame = {
    val keyed = hhKeyed(s, dir)
    val exact = graft.ops.Frequency.heavyHitters(keyed, "hkey", k = 100)
    val cand = graft.ops.Frequency.misraGries(keyed, "hkey", capacity = 200)
    exact.join(cand, Seq("key"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
  }

  /** Cosine threshold shared by the semantic-dedup queries (qSemDedup,
    * qGroupSplit) and their oracles — one knob, four former copies.
    */
  private val semDedupThreshold = 0.45

  /** Banding parameters shared by the LSH-pair queries and their oracles. */
  private val semBandPlanes = 6
  private val semBands = 4

  /** DuckDB list literal for one hyperplane — `Double.toString` is the
    * shortest round-trip rendering, so the oracle parses the exact same
    * 64-bit values the operator folds over.
    */
  private def planeLit(p: Seq[Double]): String =
    p.map(java.lang.Double.toString).mkString("[", ", ", "]")

  /** Normalized-embedding CTE shared by every semantic oracle. */
  private val nvCte: String =
    """nv AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding,
      |           y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
      |  FROM embeddings)""".stripMargin

  /** Brute-force exact pair CTE (the O(n²) baseline the laws compare
    * against; the workload queries use [[lshPairsCteChain]] instead).
    */
  private def brutePairsSubquery: String =
    s"""SELECT id_a, id_b FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |      list_sum(list_transform(list_zip(a.nv, b.nv), x -> x[1] * x[2])) AS cos
       |    FROM nv a, nv b WHERE a.vec_id < b.vec_id)
       |  WHERE cos > $semDedupThreshold""".stripMargin

  /** CTE chain replicating [[graft.text.Similarity.lshNearDupPairsBanded]]
    * bit-for-bit: per band, bucket = sign bits of sequential-fold dot
    * products against the operator's own (seeded, embedded-as-literals)
    * hyperplanes; candidates = same-(band,)bucket pairs unioned across
    * bands; `pairs` = candidates passing the exact cosine filter. The
    * oracle therefore verifies the bucketing AND the scoring, not just a
    * pair list.
    */
  private def lshPairsCteChain: String = {
    val bands = Similarity.bandedPlanes(semBandPlanes, semBands, 64)
    val bandCtes = bands.zipWithIndex.map { case (planes, bi) =>
      val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_sum(list_transform(list_zip(nv, ${planeLit(p)}), " +
          s"x -> x[1] * x[2])) >= 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"b$bi AS (SELECT vec_id, $bucketExpr AS bucket FROM nv)"
    }
    val candUnion = (0 until semBands).map { bi =>
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM b$bi a " +
        s"JOIN b$bi b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
    }.mkString("\n  UNION\n  ") // UNION, not UNION ALL: bands dedup
    s"""${bandCtes.mkString(",\n")},
       |cand AS (
       |  $candUnion),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT c.id_a, c.id_b,
       |      list_sum(list_transform(list_zip(x.nv, y.nv), z -> z[1] * z[2])) AS cos
       |    FROM cand c JOIN nv x ON c.id_a = x.vec_id
       |                JOIN nv y ON c.id_b = y.vec_id)
       |  WHERE cos > $semDedupThreshold)""".stripMargin
  }

  /** Shared oracle-SQL prefix for the semantic-dedup workload queries:
    * normalized embeddings, the BANDED-LSH pair set (the operators' scale
    * path — see [[lshPairsCteChain]]), symmetric edges, transitive
    * closure (`reach`). Both the q_semdedup and q_group_split oracles
    * build on exactly this chain, so their pair sets can never drift
    * apart; q_lsh_recall measures this pair set against the brute-force
    * baseline.
    */
  private def semanticComponentsCte: String =
    s"""WITH RECURSIVE $nvCte,
       |$lshPairsCteChain,
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)""".stripMargin

  /** Semantic dedup, keep-one-per-cluster
    * ([[graft.text.Dedup.dedupByPairs]]): banded-LSH near-dup pairs
    * ([[graft.text.Similarity.lshNearDupPairsBanded]] — the scale path;
    * no cross product anywhere in the plan) → connected components
    * (hash-to-min with pointer jumping) → minimum member survives. The
    * oracle replicates the banding, the bucketing, the exact cosine
    * filter, AND rebuilds the components with a recursive CTE over that
    * identical pair set, so the grouping semantics are verified end to
    * end; q_lsh_recall measures this pair source against the exact
    * brute-force baseline (which stays oracled via q_embed_pairs).
    */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val pairs = Similarity.lshNearDupPairsBanded(e, "vec_id", "embedding",
      semDedupThreshold, semBandPlanes, semBands)
    Dedup.dedupByPairs(e.select(col("vec_id"), col("label")), "vec_id", pairs)
      .orderBy(col("vec_id"))
  }

  /** Leakage-safe split ([[graft.ops.Sampling.splitByGroup]]): rows split
    * by their duplicate-cluster representative, so near-copies (as found
    * by the banded-LSH pair source — same scale path and caveats as
    * [[qSemDedup]]) can never straddle train/test. The oracle rebuilds
    * the banding, the clusters (recursive CTE over the same pair set)
    * AND the md5 bucket arithmetic, so grouping and assignment are both
    * verified hex-for-hex.
    */
  private def qGroupSplit(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val pairs = Similarity.lshNearDupPairsBanded(e, "vec_id", "embedding",
      semDedupThreshold, semBandPlanes, semBands)
    Sampling.splitByGroup(e.select(col("vec_id")), "vec_id", pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"))
  }

  /** Validation law: measured recall of the banded-LSH pair source
    * against the exact brute-force pair set at the same threshold —
    * the honesty artifact behind qSemDedup/qGroupSplit. LSH pairs are a
    * SUBSET of brute pairs by construction (same exact cosine filter,
    * fewer candidates), so recall = n_lsh / n_brute; the oracle
    * recomputes both sides independently. Runs the O(n²) baseline, so
    * it lives in the validation set, never the bench workload.
    */
  private def qLshRecall(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val brute = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", semDedupThreshold)
    val lsh = Similarity.lshNearDupPairsBanded(e, "vec_id", "embedding",
      semDedupThreshold, semBandPlanes, semBands)
    brute.agg(count(lit(1)).as("n_brute"))
      .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
      .select(col("n_brute"), col("n_lsh"),
        round(col("n_lsh").cast("double") / col("n_brute"), 6).as("recall"))
  }

  /** Validation: distinct-count-as-mergeable-state. History's per-type
    * HLL sketch states merged with a delta's partials
    * ([[graft.ops.Incremental.hllMergeState]]) must estimate within the
    * sketch's error envelope of the EXACT distinct count over the full
    * data (4σ at lgK=12 ≈ 6.5% relative; at these cardinalities the
    * sketch is still in sparse-exact mode, so the real gap is 0).
    * Violations = 0, oracle SELECT 0.
    */
  private def qHllMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Incremental
    val e = t(s, dir, "events")
    val cutoff = "2024-01-15 00:00:00"
    val hist = e.filter(col("ts") < lit(cutoff))
    val delta = e.filter(col("ts") >= lit(cutoff))
    val state = Incremental.hllState(hist, Seq("event_type"), "user_id")
    val merged = Incremental.hllMergeState(state, delta, Seq("event_type"), "user_id")
      .select(col("event_type"), Incremental.hllCount(col("hll_user_id")).as("est"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    merged.join(exact, Seq("event_type"))
      .agg(coalesce(sum(when(
        abs(col("est") - col("n_exact")) > lit(0.065) * col("n_exact"), 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** Markov transition matrix over user journeys
    * ([[graft.ops.Funnel.transitionMatrix]]): consecutive event-type
    * pairs per user with row-normalized probabilities — one entity
    * shuffle, then a types²-sized aggregation.
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.transitionMatrix(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type"))

  /** Rolling 7-day distinct active users
    * ([[graft.ops.Funnel.rollingActiveEntities]]): the trailing-window
    * WAU curve via contribution explode — O(user-days × 7) moved, never
    * a per-day rescan or a day×events range join.
    */
  private def qRollingActive(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.rollingActiveEntities(t(s, dir, "events"),
        "user_id", "ts", windowPeriods = 7)
      .select(date_format(col("period_ts"), "yyyy-MM-dd").as("day"), col("n_active"))
      .orderBy(col("day"))

  /** Signup→purchase conversion lag ([[graft.ops.Funnel.timeToConvert]]):
    * first purchase at/after each user's first signup, lag in exact
    * microseconds — window + aggregation on one shared entity exchange.
    */
  private def qConversionLag(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.timeToConvert(t(s, dir, "events"),
        "user_id", "ts", "event_type", "signup", "purchase")
      .select(col("user_id"),
        date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss").as("from_ts"),
        date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss").as("to_ts"),
        col("lag_us"))
      .orderBy(col("user_id"))

  /** Cross-document repeated 6-token spans
    * ([[graft.text.Dedup.repeatedSpans]]): substring-level boilerplate
    * discovery — narrow HOF span generation, one map-combined exchange.
    */
  private def qSpanDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 6, minOccurrences = 2)
      .orderBy(col("span"))

  /** Span masking ([[graft.text.Dedup.maskRepeatedSpans]]): the rewrite
    * step q_span_dedup's discovery feeds — every occurrence of a 6-token
    * span shared by >= 2 documents is removed, token-exactly. The md5 of
    * the rebuilt text makes the check byte-exact without shipping full
    * documents through the compare.
    */
  private def qSpanMask(s: SparkSession, dir: String): DataFrame =
    Dedup.maskRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 6, minDocs = 2)
      .select(col("doc_id"),
        col("n_before").cast("long").as("n_before"),
        col("n_after").cast("long").as("n_after"),
        md5(col("text_masked").cast("binary")).as("masked_md5"))
      .orderBy(col("doc_id"))

  /** Triangle count on the part co-purchase graph
    * ([[graft.ops.Graph.triangleCount]]): parts sharing an order form
    * edges; degree-ordered wedges close against the canonical edge set.
    * The oracle counts the same triangles with id-ordered SQL joins —
    * different enumeration order, provably the same count.
    */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    // the graph is sampled by order (25%): triangle work grows with the
    // wedge count (~Σ outdeg²), so the BENCH graph is kept at a density
    // where the 4× sf0.01→sf0.1 step doesn't square into the total; the
    // operator itself is bounded by degree orientation, not this filter
    val items = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("i")).distinct()
    val a = items.toDF("k", "ia")
    val b = items.toDF("k", "ib")
    val edges = a.join(b, Seq("k")).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
    graft.ops.Graph.triangleCount(edges, "ia", "ib")
  }

  /** Winsorized robust stats ([[graft.ops.Outliers.winsorize]]): order
    * values clamped into their status's exact [p5, p95] band, then
    * count/min/max/mean — bounds broadcast back, fact rows shuffle once.
    */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Outliers.winsorize(t(s, dir, "orders"),
        Seq("o_orderstatus"), "o_totalprice", pLo = 0.05, pHi = 0.95)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        (dsum(col("o_totalprice")) / count(lit(1))).as("wmean"))
      .orderBy(col("o_orderstatus"))

  /** Exact α=½ EWMA over per-user daily spend
    * ([[graft.ops.Timeseries.ewmaHalf]]): cents accumulate in a long
    * prefix sum, one IEEE division at the end — bit-deterministic
    * recency weighting, no float recurrence.
    */
  private def qEwma(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).as("__day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    Timeseries.ewmaHalf(daily, Seq("user_id"), Seq("__day"), "cents")
      .select(col("user_id"),
        date_format(timestamp_micros(col("__day") * 86400000000L), "yyyy-MM-dd")
          .as("day"),
        col("cents"), col("ewma"))
      .orderBy(col("user_id"), col("day"))
  }

  /** k-core of the (thinned) part co-purchase graph
    * ([[graft.ops.Graph.kCore]]): iterative peeling to the unique
    * maximal min-degree-4 subgraph. The oracle unrolls the same peeling
    * as chained CTEs (the PageRank convention) with spare rounds —
    * peeling is confluent and idempotent at the fixpoint, so extra
    * rounds can't change the result.
    */
  private def qKcore(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 16 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("i")).distinct()
    val a = items.toDF("k", "ia")
    val b = items.toDF("k", "ib")
    val edges = a.join(b, Seq("k")).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
    graft.ops.Graph.kCore(edges, "ia", "ib", k = 4)
      .orderBy(col("node"))
  }

  /** Unrolled k-core peeling oracle: `rounds` chained (degree → keep →
    * filter) CTE blocks over the same thinned co-purchase edges. Sized
    * with headroom over the sf0.01 fixpoint depth (5 rounds measured).
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS kk, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey % 16 = 0),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.i AS u, b.i AS v
        |  FROM items a JOIN items b ON a.kk = b.kk AND a.i < b.i)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""k$r AS MATERIALIZED (
         |  SELECT x FROM (SELECT u AS x FROM e${r - 1}
         |                 UNION ALL SELECT v FROM e${r - 1})
         |  GROUP BY x HAVING count(*) >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${r - 1} e
         |  JOIN k$r a ON e.u = a.x JOIN k$r b ON e.v = b.x)""".stripMargin
    }
    val tail =
      s"""SELECT x AS node, count(*) AS core_degree
         |FROM (SELECT u AS x FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY x ORDER BY x""".stripMargin
    (head +: steps).mkString(",\n") + "\n" + tail
  }

  /** Order-independent table checksum ([[graft.ops.Observe
    * .tableChecksum]]) over integer/string lineitem columns: identical
    * md5-derived 60-bit row hashes on both engines, combined with
    * XOR + exact decimal sum + count — the replication-audit triple.
    */
  private def qTableChecksum(s: SparkSession, dir: String): DataFrame =
    graft.ops.Observe.tableChecksum(t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus"))

  /** BPE merge-rule training ([[graft.text.Bpe.trainMerges]]): 8 rounds
    * over the corpus vocabulary, greedy-left merge semantics,
    * (count, left, right) total-order tiebreak. The oracle replays the
    * identical rounds as unrolled MATERIALIZED CTEs with a
    * `list_reduce` fold.
    */
  private def qBpe(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainMerges(t(s, dir, "documents"), "text", rounds = 8)
      .orderBy(col("round"))

  /** BPE ENCODE ([[graft.text.Bpe.encodeTokenCounts]]): train 8 merge
    * rules (the 8-row driver collect is the bounded rule table, same
    * posture as training itself), then tokenize every document —
    * distinct words fold once, documents join counts. The oracle
    * re-derives the SAME rules with the unrolled training CTEs and
    * replays the identical greedy-left fold over a word-keyed copy, so
    * rule derivation AND application verify together.
    */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val rules = graft.text.Bpe.trainMerges(t(s, dir, "documents"), "text", rounds = 8)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.text.Bpe.encodeTokenCounts(t(s, dir, "documents"), "doc_id", "text", rules)
      .orderBy(col("doc_id"))
  }

  /** The greedy-left BPE fold in SQL — THE single copy shared by the
    * training v-steps and the encode e-steps (string accumulator,
    * '|'-delimited; symbols are alphanumeric so the delimiter can't
    * collide). `lRef`/`rRef` name the LEFT-JOINed winner columns; the
    * IS NULL guard makes a dried-up round (empty w$r — no pairs left)
    * an IDENTITY fold instead of emptying the chain, matching
    * [[graft.text.Bpe.trainMerges]]'s early stop.
    */
  private def bpeFoldSql(lRef: String, rRef: String): String =
    s"""CASE WHEN $lRef IS NULL OR len(syms) = 1 THEN syms ELSE string_split(
       |    list_reduce(syms, (acc, x) -> CASE
       |      WHEN string_split(acc, '|')[-1] = $lRef AND x = $rRef
       |      THEN array_to_string(list_append(
       |        string_split(acc, '|')[1:len(string_split(acc, '|')) - 1],
       |        $lRef || $rRef), '|')
       |      ELSE acc || '|' || x END), '|') END""".stripMargin

  private val bpeVocabHead =
    """WITH v0 AS MATERIALIZED (
      |  SELECT string_split_regex(word, '') AS syms, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY word)""".stripMargin

  /** Per-round (pair counts, winner, fold-rewrite) training CTEs — ONE
    * copy shared by [[bpeOracleSql]] and [[bpeEncodeOracleSql]], so the
    * rule derivation the two gates verify can never drift apart.
    */
  private def bpeTrainingSteps(rounds: Int): Seq[String] = (1 to rounds).map { r =>
    s"""p$r AS MATERIALIZED (
       |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM v${r - 1} CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
       |  GROUP BY 1, 2),
       |w$r AS MATERIALIZED (
       |  SELECT $r AS round, l, r, n FROM p$r ORDER BY n DESC, l, r LIMIT 1),
       |v$r AS MATERIALIZED (
       |  SELECT ${bpeFoldSql("w.l", "w.r")} AS syms, cnt
       |  FROM v${r - 1} LEFT JOIN w$r w ON TRUE)""".stripMargin
  }

  /** Unrolled BPE oracle: round r = pair counts from v(r-1), one winner
    * by (n DESC, l, r), fold-rewrite into v(r) — assembled from the
    * shared CTE builders above.
    */
  private def bpeOracleSql(rounds: Int): String = {
    val tail =
      s"""SELECT round, l AS left, r AS right, n FROM (
         |${(1 to rounds).map(r => s"  SELECT * FROM w$r").mkString(" UNION ALL\n")}
         |) ORDER BY round""".stripMargin
    (bpeVocabHead +: bpeTrainingSteps(rounds)).mkString(",\n") + "\n" + tail
  }

  /** Encode oracle: the training chain of [[bpeOracleSql]] derives the
    * same w1..wN winner rules, then an `e`-chain replays the identical
    * greedy-left fold over a WORD-KEYED copy of the distinct vocabulary
    * (the training chain's v-tables drop the word), and documents join
    * their words' token counts.
    */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    val e0 =
      """e0 AS MATERIALIZED (
        |  SELECT word, string_split_regex(word, '') AS syms
        |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 1)""".stripMargin
    val esteps = (1 to rounds).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT word, ${bpeFoldSql("w.l", "w.r")} AS syms
         |  FROM e${r - 1} LEFT JOIN w$r w ON TRUE)""".stripMargin
    }
    val tail =
      s"""tok AS (SELECT word, len(syms) AS n_tok FROM e$rounds),
         |dwf AS (
         |  SELECT doc_id, word
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE len(word) >= 1)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM dwf JOIN tok USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ((bpeVocabHead +: bpeTrainingSteps(rounds)) ++ (e0 +: esteps))
      .mkString(",\n") + ",\n" + tail
  }

  /** Validation for the sketch-path rolling actives
    * ([[graft.ops.Funnel.rollingActiveEntitiesApprox]]): every period's
    * HLL estimate must land within the 4σ envelope (6.5% at lgK=12) of
    * the exact trailing distinct count — at these cardinalities the
    * sketch is still sparse-exact, so the real gap is 0. Violations = 0,
    * oracle SELECT 0.
    */
  private def qRollingHll(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val exact = graft.ops.Funnel.rollingActiveEntities(e, "user_id", "ts", 7)
    val approx = graft.ops.Funnel.rollingActiveEntitiesApprox(e, "user_id", "ts", 7)
    exact.join(approx, Seq("period_ts"), "full_outer")
      .agg(coalesce(sum(when(
        col("n_active").isNull || col("n_active_est").isNull ||
          abs(col("n_active_est") - col("n_active")) >
            lit(0.065) * col("n_active"), 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** Validation for small-file compaction ([[graft.sources.Sources
    * .compact]]) composed with the audit checksum
    * ([[graft.ops.Observe.tableChecksum]]): a 64-file fragmented copy of
    * events compacts to exactly the planned file count AND the
    * (n_rows, xor60, sum60) triple is unchanged — content-preservation
    * proven by aggregate, not by a row diff. Violations = 0.
    */
  private def qCompactAudit(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-audit")
    val inPath = root.resolve("in").toString
    val outPath = root.resolve("out").toString
    val cols = Seq("event_id", "user_id", "event_type")
    t(s, dir, "events").select(cols.map(col): _*)
      .repartition(64).write.mode("overwrite").parquet(inPath)
    val target = math.max(1L, graft.sources.Sources.dataFileBytes(s, inPath) / 4)
    val planned = graft.sources.Sources.compact(s, inPath, outPath, target)
    val written = { // count real data files the way dataFileBytes does
      val p = new org.apache.hadoop.fs.Path(outPath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next().getPath.getName
        if (!f.startsWith("_") && !f.startsWith(".")) n += 1
      }
      n
    }
    val a = graft.ops.Observe.tableChecksum(s.read.parquet(inPath), cols)
      .toDF("n_a", "x_a", "s_a")
    val b = graft.ops.Observe.tableChecksum(s.read.parquet(outPath), cols)
      .toDF("n_b", "x_b", "s_b")
    a.crossJoin(b).select(
      ((col("n_a") =!= col("n_b")).cast("long") +
        (col("x_a") =!= col("x_b")).cast("long") +
        (col("s_a") =!= col("s_b")).cast("long") +
        lit(if (planned == written) 0L else 1L)).as("n_violations"))
  }

  /** Two-sample KS drift statistic ([[graft.ops.Drift.ksStatistic]]):
    * even- vs odd-orderkey halves of the order-value distribution. The
    * integer numerator makes the max CDF gap oracle-exact; the global
    * cumulative counts ride [[graft.ops.Ids.withRunningTotals]] (range
    * partitions + bounded windows), never a whole-frame window.
    */
  private def qKs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    graft.ops.Drift.ksStatistic(
      o.filter(col("o_orderkey") % 2 === 0).select(col("o_totalprice")),
      o.filter(col("o_orderkey") % 2 === 1).select(col("o_totalprice")),
      "o_totalprice")
  }

  // ------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_agg" -> (qJoinAgg _),
    "q_price_index" -> (qPriceIndex _),
    "q_elementary_index" -> (qElementaryIndex _),
    "q_chained_index" -> (qChainedIndex _),
    "q_cleansed_index" -> (qCleansedIndex _),
    "q_imputed_index" -> (qImputedIndex _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_vocab_drift" -> (qVocabDrift _),
    "q_superlative_index" -> (qSuperlativeIndex _),
    "q_grouped_index" -> (qGroupedIndex _),
    "q_concat_keys" -> (qConcatKeys _),
    "q_map_col" -> (qMapCol _),
    "q_rename" -> (qRename _),
    "q_first_group" -> (qFirstGroup _),
    "q_window_sum" -> (qWindowSum _),
    "q_array_diff" -> (qArrayDiff _),
    "q_ffill" -> (qFfill _),
    "q_shifted_ffill" -> (qShiftedFfill _),
    "q_grouped_apply" -> (qGroupedApply _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_tumbling" -> (qTumbling _),
    "q_sessionize" -> (qSessionize _),
    "q_json_props" -> (qJsonProps _),
    "q_text_stats" -> (qTextStats _),
    "q_vocab" -> (qVocab _),
    "q_doc_quality" -> (qDocQuality _),
    "q_lang_id" -> (qLangId _),
    "q_dsir" -> (qDsir _),
    "q_pack" -> (qPack _),
    "q_redact" -> (qRedact _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_repetition" -> (qRepetition _),
    "q_chunk" -> (qChunk _),
    "q_rolling" -> (qRolling _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_jaccard" -> (qDedupJaccard _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_minhash_containment" -> (qMinhashContainment _),
    "q_dup_components" -> (qDupComponents _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_fingerprint" -> (qFingerprint _),
    "q_topk_similar" -> (qTopkSimilar _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_containment" -> (qAnnContainment _),
    "q_ivf_topk" -> (qIvfTopk _),
    "q_kmeans" -> (qKmeans _),
    "q_cluster_sample" -> (qClusterSample _),
    "q_pq" -> (qPq _),
    "q_pq_recall" -> (qPqRecall _),
    "q_embed_pairs" -> (qEmbedPairs _),
    "q_embed_pairs_lsh" -> (qEmbedPairsLsh _),
    "q_lsh_containment" -> (qLshContainment _),
    "q_quantize" -> (qQuantize _),
    "q_sliding" -> (qSliding _),
    "q_session_window" -> (qSessionWindow _),
    "q_binary_meta" -> (qBinaryMeta _),
    "q_split" -> (qSplit _),
    "q_stratified" -> (qStratified _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_mixture" -> (qMixture _),
    "q_apportion" -> (qApportion _),
    "q_profile" -> (qProfile _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_rollup" -> (qRollup _),
    "q_set_ops" -> (qSetOps _),
    "q_distinct_levels" -> (qDistinctLevels _),
    "q_hll" -> (qHll _),
    "q_decode" -> (qDecode _),
    "q_wav" -> (qWav _),
    "q_resize" -> (qResize _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_token_budget" -> (qTokenBudget _),
    "q_frame_sample" -> (qFrameSample _),
    "q_bm25" -> (qBm25 _),
    "q_retrieval_eval" -> (qRetrievalEval _),
    "q_upsert" -> (qUpsert _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_funnel" -> (qFunnel _),
    "q_histogram" -> (qHistogram _),
    "q_impute" -> (qImpute _),
    "q_zorder" -> (qZorder _),
    "q_incremental" -> (qIncremental _),
    "q_oov" -> (qOov _),
    "q_normalize" -> (qNormalize _),
    "q_typed_agg" -> (qTypedAgg _),
    "q_neg_pairs" -> (qNegPairs _),
    "q_cms" -> (qCms _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_cap_group" -> (qCapGroup _),
    "q_asof_forward" -> (qAsofForward _),
    "q_pipeline" -> (qPipeline _),
    "q_curate" -> (qCurate _),
    "q_cogroup" -> (qCogroup _),
    "q_ivf_exact" -> (qIvfExact _),
    "q_simhash_containment" -> (qSimhashContainment _),
    "q_fingerprint_containment" -> (qFingerprintContainment _),
    "q_tfidf" -> (qTfidf _),
    "q_quantile_bound" -> (qQuantileBound _),
    "q_audio_resample" -> (qAudioResample _),
    "q_bloom_join" -> (qBloomJoin _),
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_resample" -> (qResample _),
    "q_outliers" -> (qOutliers _),
    "q_corr" -> (qCorr _),
    "q_consolidate" -> (qConsolidate _),
    "q_semdedup" -> (qSemDedup _),
    "q_hll_merge" -> (qHllMerge _),
    "q_group_split" -> (qGroupSplit _),
    "q_binning" -> (qBinning _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_retention" -> (qRetention _),
    "q_scd2" -> (qScd2 _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_expectations" -> (qExpectations _),
    "q_drift" -> (qDrift _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_hh_containment" -> (qHhContainment _),
    "q_anomaly" -> (qAnomaly _),
    "q_scale" -> (qScale _),
    "q_perplexity" -> (qPerplexity _),
    "q_cooccur" -> (qCooccur _),
    "q_pagerank" -> (qPagerank _),
    "q_joinsize" -> (qJoinsize _),
    "q_ab_ci" -> (qAbCi _),
    "q_diversity" -> (qDiversity _),
    "q_scd2_lookup" -> (qScd2Lookup _),
    "q_streaks" -> (qStreaks _),
    "q_cube" -> (qCube _),
    "q_dense_id" -> (qDenseId _),
    "q_rank_features" -> (qRankFeatures _),
    "q_joinsize_bound" -> (qJoinsizeBound _),
    "q_transitions" -> (qTransitions _),
    "q_rolling_active" -> (qRollingActive _),
    "q_conversion_lag" -> (qConversionLag _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_span_mask" -> (qSpanMask _),
    "q_triangles" -> (qTriangles _),
    "q_winsorize" -> (qWinsorize _),
    "q_ewma" -> (qEwma _),
    "q_kcore" -> (qKcore _),
    "q_table_checksum" -> (qTableChecksum _),
    "q_bpe" -> (qBpe _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_rolling_hll" -> (qRollingHll _),
    "q_compact_audit" -> (qCompactAudit _),
    "q_ks" -> (qKs _),
    "q_lsh_recall" -> (qLshRecall _),
  )

  /** Correctness-gate queries: each re-runs a scale-path operator AND its
    * exact baseline to assert a containment invariant (violations = 0).
    * They are part of the verified surface ([[queries]]/[[oracleSql]])
    * but are validation harnesses, not workload queries — [[Bench]]
    * excludes them from the timed set (explicitly, in its JSON output)
    * so bench totals stay comparable with the recorded baseline's
    * workload mix.
    */
  val validationQueries: Set[String] =
    Set("q_lsh_containment", "q_ann_containment", "q_minhash_containment", "q_quantize",
      "q_dup_components", "q_bucketed_join", "q_cms", "q_ivf_exact",
      "q_simhash_containment", "q_fingerprint_containment", "q_quantile_bound",
      "q_hll_merge", "q_weighted_sample", "q_hh_containment", "q_joinsize_bound",
      "q_rolling_hll", "q_compact_audit", "q_lsh_recall", "q_pq_recall")

  def oracleSql: Map[String, String] = Map(
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
    "q_vocab_drift" ->
      """WITH rt AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |  WHERE source = 'src0'),
        |ct AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |  WHERE source = 'src1'),
        |rc AS (SELECT token AS category, COUNT(*) AS rn FROM rt GROUP BY 1),
        |cc AS (SELECT token AS category, COUNT(*) AS cn FROM ct GROUP BY 1),
        |cats AS (SELECT category FROM rc ORDER BY rn DESC, category LIMIT 20),
        |rb AS (
        |  SELECT CASE WHEN cats.category IS NOT NULL THEN rc.category
        |    ELSE '__OTHER__' END AS category, SUM(rn) AS rn
        |  FROM rc LEFT JOIN cats USING (category) GROUP BY 1),
        |cb AS (
        |  SELECT CASE WHEN cats.category IS NOT NULL THEN cc.category
        |    ELSE '__OTHER__' END AS category, SUM(cn) AS cn
        |  FROM cc LEFT JOIN cats USING (category) GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(rb.category, cb.category) AS category,
        |    COALESCE(rn, 0) AS ref_n, COALESCE(cn, 0) AS cur_n
        |  FROM rb FULL OUTER JOIN cb USING (category)),
        |p AS (
        |  SELECT category, CAST(ref_n AS BIGINT) AS ref_n, CAST(cur_n AS BIGINT) AS cur_n,
        |    (ref_n + 0.5) / (SUM(ref_n) OVER () + 0.5 * CAST(COUNT(*) OVER () AS DOUBLE)) AS rp,
        |    (cur_n + 0.5) / (SUM(cur_n) OVER () + 0.5 * CAST(COUNT(*) OVER () AS DOUBLE)) AS cp
        |  FROM j)
        |SELECT category, ref_n, cur_n,
        |  round((cp - rp) * ln(cp / rp), 6) AS psi_term
        |FROM p ORDER BY category""".stripMargin,
    "q_embed_drift" ->
      """WITH re AS (
        |  SELECT CAST(u.d AS INT) AS dim, u.x FROM (
        |    SELECT unnest([{'d': i - 1, 'x': embedding[i]}
        |      FOR i IN range(1, len(embedding) + 1)]) AS u
        |    FROM embeddings WHERE label = 0)),
        |ce AS (
        |  SELECT CAST(u.d AS INT) AS dim, u.x FROM (
        |    SELECT unnest([{'d': i - 1, 'x': embedding[i]}
        |      FOR i IN range(1, len(embedding) + 1)]) AS u
        |    FROM embeddings WHERE label = 1)),
        |rc AS (SELECT dim, CAST(x >= -0.2 AS INT) + CAST(x >= -0.1 AS INT) + CAST(x >= -0.05 AS INT) + CAST(x >= 0.0 AS INT) + CAST(x >= 0.05 AS INT) + CAST(x >= 0.1 AS INT) + CAST(x >= 0.2 AS INT) AS bin, COUNT(*) AS rn FROM re GROUP BY 1, 2),
        |cc AS (SELECT dim, CAST(x >= -0.2 AS INT) + CAST(x >= -0.1 AS INT) + CAST(x >= -0.05 AS INT) + CAST(x >= 0.0 AS INT) + CAST(x >= 0.05 AS INT) + CAST(x >= 0.1 AS INT) + CAST(x >= 0.2 AS INT) AS bin, COUNT(*) AS cn FROM ce GROUP BY 1, 2),
        |spine AS (
        |  SELECT d.dim, b.bin FROM (SELECT DISTINCT dim FROM re) d
        |  CROSS JOIN (SELECT CAST(unnest(range(8)) AS INT) AS bin) b),
        |j AS (
        |  SELECT s.dim, s.bin, COALESCE(rc.rn, 0) AS rn, COALESCE(cc.cn, 0) AS cn
        |  FROM spine s LEFT JOIN rc USING (dim, bin) LEFT JOIN cc USING (dim, bin)),
        |p AS (
        |  SELECT dim, rn, cn,
        |    (rn + 0.5) / (SUM(rn) OVER (PARTITION BY dim) + 4.0) AS rp,
        |    (cn + 0.5) / (SUM(cn) OVER (PARTITION BY dim) + 4.0) AS cp
        |  FROM j),
        |t2 AS (
        |  SELECT dim, rn, cn,
        |    CAST(round(((cp - rp) * ln(cp / rp)) * 1000000000.0) AS BIGINT) AS tn
        |  FROM p)
        |SELECT dim, CAST(SUM(rn) AS BIGINT) AS ref_n, CAST(SUM(cn) AS BIGINT) AS cur_n,
        |  round(CAST(SUM(tn) AS DOUBLE) / 1000000000.0, 6) AS psi
        |FROM t2 GROUP BY 1 ORDER BY dim""".stripMargin,
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
    "q_ffill" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM events ORDER BY event_id""".stripMargin,
    "q_shifted_ffill" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id, year(ts - INTERVAL 1 MONTH) ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM events ORDER BY event_id""".stripMargin,
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
    "q_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_distinct_tokens,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))) AS BIGINT) AS sum_stopwords,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS sum_subwords
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_vocab" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "q_doc_quality" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
        |  + 0.4 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |  + 0.2 * (len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |            WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |            WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |            WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |            ELSE 'unknown' END AS lang_pred, COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Replays Dsir end-to-end: md5-prefix bucketing of unigrams+bigrams,
    // Laplace-smoothed LLR quantized to integer micro-nats PER BUCKET
    // (identical IEEE ratio operands; only ln can differ by ulps, absorbed
    // by the 1e-6 grid), exact BIGINT occurrence sums, top-120.
    "q_dsir" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |f AS (
        |  SELECT doc_id, lang, unnest(list_concat(w,
        |    [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))])) AS feat
        |  FROM w),
        |b AS (SELECT doc_id, lang, substring(md5(feat), 1, 3) AS bucket FROM f),
        |cnt AS (
        |  SELECT bucket, COUNT(*) AS nq,
        |         COUNT(*) FILTER (WHERE lang = 'en') AS np
        |  FROM b GROUP BY 1),
        |tot AS (SELECT SUM(nq) AS tq, SUM(np) AS tp FROM cnt),
        |llr AS (
        |  SELECT bucket,
        |    CAST(round(ln(
        |      (CAST(np + 1 AS DOUBLE) / CAST(tp + 4096 AS DOUBLE))
        |      / (CAST(nq + 1 AS DOUBLE) / CAST(tq + 4096 AS DOUBLE))
        |    ) * 1000000.0) AS BIGINT) AS llr_micro
        |  FROM cnt CROSS JOIN tot)
        |SELECT b.doc_id, COUNT(*) AS n_features,
        |  CAST(SUM(llr_micro) AS BIGINT) AS score_micro
        |FROM b JOIN llr USING (bucket)
        |GROUP BY b.doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 120""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w)-3)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
        |e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
        |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter, n_a + n_b - n_inter AS n_union,
        |  CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
        |FROM i
        |JOIN (SELECT doc_id, n_sh AS n_a FROM sz) sa ON i.id_a = sa.doc_id
        |JOIN (SELECT doc_id, n_sh AS n_b FROM sz) sb ON i.id_b = sb.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "q_topk_similar" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding,
        |           y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.nv, c.nv), x -> x[1] * x[2])) AS cos
        |  FROM n q, n c WHERE q.vec_id < 10 AND q.vec_id != c.vec_id)
        |SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        |FROM p QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_kmeans" -> kmeansOracleSql(k = 8, iters = 3),
    "q_cluster_sample" -> clusterSampleOracleSql(k = 8, iters = 2, cap = 40),
    "q_pq" -> pqOracleSql(k = 8, iters = 2, d = 64),
    "q_pq_recall" -> pqRecallOracleSql(k = 8, iters = 2, d = 64),
    "q_embed_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) / sqrt(list_sum(list_transform(embedding,
        |           y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.nv, b.nv), x -> x[1] * x[2])) AS cos
        |  FROM n a, n b WHERE a.vec_id < b.vec_id)
        |WHERE cos > 0.45 ORDER BY id_a, id_b""".stripMargin,
    "q_sliding" ->
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT value, unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                        time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS win_start
        |  FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,
    "q_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha,
        |  'unknown' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    // Salting routes rows without changing the join's row set, so the
    // oracle is the PLAIN join the salted plan accelerates.
    "q_salted_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
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
    "q_profile" ->
      """SELECT 'l_discount' AS col_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  COUNT(DISTINCT l_discount) AS n_distinct,
        |  CAST(min(l_discount) AS VARCHAR) AS min_value, CAST(max(l_discount) AS VARCHAR) AS max_value
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linenumber', COUNT(*),
        |  CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_linenumber),
        |  CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', COUNT(*),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_quantity),
        |  CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', COUNT(*),
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT l_returnflag),
        |  min(l_returnflag), max(l_returnflag)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  c.click_id AS asof_click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_join" ->
      """WITH flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |intervals AS (
        |  SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end
        |  FROM sess GROUP BY user_id, sid),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(i.s_start, '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM p JOIN intervals i
        |  ON p.user_id = i.user_id AND i.s_start <= p.ts AND p.ts < i.s_end
        |ORDER BY p.event_id""".stripMargin,
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
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  GROUPING_ID(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
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
    "q_joinsize_bound" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_rolling_active" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS p
        |  FROM events),
        |mx AS (SELECT max(p) AS pm FROM a),
        |t AS (
        |  SELECT user_id, p + i AS tp
        |  FROM a CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i))
        |SELECT strftime(make_timestamp(tp * 86400000000), '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_active
        |FROM t, mx WHERE tp <= pm GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_conversion_lag" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS from_ts
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, f.from_ts, min(e.ts) AS to_ts
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND f.from_ts IS NOT NULL
        |    AND e.ts >= f.from_ts
        |  GROUP BY e.user_id, f.from_ts)
        |SELECT user_id,
        |  strftime(from_ts, '%Y-%m-%d %H:%M:%S') AS from_ts,
        |  strftime(to_ts, '%Y-%m-%d %H:%M:%S') AS to_ts,
        |  epoch_us(to_ts) - epoch_us(from_ts) AS lag_us
        |FROM c ORDER BY user_id""".stripMargin,
    "q_span_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sp AS (
        |  SELECT doc_id, array_to_string(ts[i:i+5], ' ') AS span
        |  FROM tok CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(ts) - 5)) AS i))
        |SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM sp GROUP BY span HAVING count(*) >= 2
        |ORDER BY span""".stripMargin,
    // Replays the mask by span STRING (the operator's xxhash64 grouping is
    // internal; a 64-bit collision is the only divergence mode): covered
    // positions from frequent-span starts, rebuild by ordered string_agg.
    "q_span_mask" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sp AS (
        |  SELECT doc_id, unnest([{'s': i, 'sp': array_to_string(w[i:i+5], ' ')}
        |    FOR i IN range(1, len(w) - 4)]) AS u
        |  FROM w),
        |s2 AS (SELECT doc_id, u.s AS start, u.sp AS span FROM sp),
        |f AS (
        |  SELECT span FROM s2 GROUP BY 1
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (
        |  SELECT DISTINCT s2.doc_id, s2.start + d.d AS pos
        |  FROM s2 JOIN f USING (span)
        |  CROSS JOIN (SELECT unnest(range(0, 6)) AS d) d),
        |tok AS (
        |  SELECT doc_id, unnest([{'p': i, 't': w[i]}
        |    FOR i IN range(1, len(w) + 1)]) AS u
        |  FROM w),
        |kept AS (
        |  SELECT t.doc_id, string_agg(t.u.t, ' ' ORDER BY t.u.p) AS text_masked,
        |    COUNT(*) AS n_after
        |  FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.pos = t.u.p
        |  WHERE cov.pos IS NULL GROUP BY t.doc_id)
        |SELECT w.doc_id, len(w.w) AS n_before,
        |  COALESCE(k.n_after, 0) AS n_after,
        |  md5(COALESCE(k.text_masked, '')) AS masked_md5
        |FROM w LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey % 4 = 0),
        |e AS (
        |  SELECT DISTINCT a.i AS u, b.i AS v
        |  FROM items a JOIN items b ON a.k = b.k AND a.i < b.i)
        |SELECT count(*) AS n_triangles
        |FROM e e1
        |JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |    quantile_cont(o_totalprice, 0.05) AS wlo,
        |    quantile_cont(o_totalprice, 0.95) AS whi
        |  FROM orders GROUP BY o_orderstatus),
        |w AS (
        |  SELECT o.o_orderstatus,
        |    least(greatest(o.o_totalprice, b.wlo), b.whi) AS v
        |  FROM orders o JOIN b USING (o_orderstatus))
        |SELECT o_orderstatus, count(*) AS n, min(v) AS lo, max(v) AS hi,
        |  CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS wmean
        |FROM w GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_ewma" ->
      """WITH d AS (
        |  SELECT user_id,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |i AS (
        |  SELECT user_id, day, cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS t
        |  FROM d),
        |s AS (
        |  SELECT user_id, day, cents, t,
        |    sum(cents * (1::BIGINT << t))
        |      OVER (PARTITION BY user_id ORDER BY t) AS sw
        |  FROM i)
        |SELECT user_id,
        |  strftime(make_timestamp(day * 86400000000), '%Y-%m-%d') AS day,
        |  cents,
        |  CAST(sw AS DOUBLE) /
        |    CAST((1::BIGINT << (t + 1)) - 1 AS DOUBLE) AS ewma
        |FROM s ORDER BY user_id, day""".stripMargin,
    "q_kcore" -> kcoreOracleSql(k = 4, rounds = 9),
    "q_bpe" -> bpeOracleSql(rounds = 8),
    "q_bpe_encode" -> bpeEncodeOracleSql(rounds = 8),
    "q_rolling_hll" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_compact_audit" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_ks" ->
      """WITH u AS (
        |  SELECT o_totalprice AS v,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END AS ib
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |g AS (
        |  SELECT v, CAST(sum(ia) AS BIGINT) AS ca, CAST(sum(ib) AS BIGINT) AS cb
        |  FROM u GROUP BY v),
        |c AS (
        |  SELECT CAST(sum(ca) OVER w AS BIGINT) AS cca,
        |         CAST(sum(cb) OVER w AS BIGINT) AS ccb
        |  FROM g WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |t AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
        |  FROM g)
        |SELECT n_a, n_b,
        |  CAST(max(abs(cca * n_b - ccb * n_a)) AS BIGINT) AS d_num,
        |  CAST(max(abs(cca * n_b - ccb * n_a)) AS DOUBLE) /
        |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,
    "q_table_checksum" ->
      """WITH h AS (
        |  SELECT CAST(('0x' || substr(md5(concat_ws(chr(1),
        |    coalesce(CAST(l_orderkey AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_linenumber AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_partkey AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_suppkey AS VARCHAR), chr(2)),
        |    coalesce(l_returnflag, chr(2)),
        |    coalesce(l_linestatus, chr(2)))), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT count(*) AS n_rows, bit_xor(h) AS xor60,
        |  CAST(sum(h) % 4611686018427387904 AS BIGINT) AS sum60
        |FROM h""".stripMargin,
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
    "q_lsh_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_ann_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_minhash_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_dup_components" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_quantize" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
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
    "q_decontaminate" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w)-3)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |c AS (SELECT doc_id, len(sh) AS n_doc_sh, unnest(sh) AS shingle FROM s),
        |b AS (SELECT doc_id AS bench_id, unnest(sh) AS shingle FROM s
        |      WHERE doc_id % 50 = 0 AND doc_id < 500),
        |j AS (
        |  SELECT c.doc_id, b.bench_id, c.n_doc_sh, COUNT(*) AS n_shared
        |  FROM c JOIN b USING (shingle)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, bench_id, n_shared,
        |  CAST(n_shared AS DOUBLE) / n_doc_sh AS contaminated_frac
        |FROM j WHERE n_shared >= 3 ORDER BY doc_id, bench_id""".stripMargin,
    "q_chunk" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |        unnest(range(0, (greatest(n - 10 - 1, 0) // 30) + 1)) AS chunk_idx
        |      FROM d)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(least(40, n - chunk_idx * 30) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_rolling" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum
        |FROM events ORDER BY event_id""".stripMargin,
    "q_repetition" ->
      """WITH r AS (
        |  SELECT lang,
        |    CASE WHEN len(w) < 3 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct([array_to_string(w[i:i+2], ' ')
        |                FOR i IN range(1, len(w)-1)])) AS DOUBLE) / (len(w) - 2)
        |    END AS rep
        |  FROM (SELECT lang, string_split(text, ' ') AS w FROM documents))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rep > 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
        |  CAST(SUM(CAST(rep AS DECIMAL(18,9))) AS DOUBLE) AS sum_rep
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT lang, bucket, n_tokens,
        |    CAST((SUM(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 AS BIGINT) AS pack_id
        |  FROM d)
        |SELECT lang, bucket, pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_redact" ->
      """WITH inj AS (
        |  SELECT lang,
        |    text || CASE WHEN doc_id % 10 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
        |           || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |      ELSE '' END AS t
        |  FROM documents),
        |red AS (
        |  SELECT lang, t,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS r
        |  FROM inj)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN r != t THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
        |  CAST(SUM(length(t) - length(r)) AS BIGINT) AS chars_removed
        |FROM red GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS exact_orders, true AS approx_within_5pct
        |FROM lineitem""".stripMargin,
    "q_frame_sample" ->
      // The oracle recomputes what the AVI demuxer must report straight
      // from the raw text bytes: nf = ⌊bytes/12⌋ full 2×2 RGB24 frames,
      // sampled at stride 2. The writer converts RGB→BGR, so DIB channel
      // B = source byte ≡ 2 (mod 3) within the frame (G ≡ 1, R ≡ 0), and
      // the image-top-left blue of frame i is source byte 12·i+2 (top
      // source row lands in the LAST bottom-up DIB row — independent
      // index arithmetic, not a replay of the codec). Docs shorter than
      // one frame produce a valid 0-frame AVI → no sampled rows → no
      // group on either side.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, hx, unnest(range(0, nf, 2)) AS i FROM b WHERE nf > 0)
        |SELECT doc_id, COUNT(*) AS n_sampled,
        |  CAST(SUM(list_sum(list_transform(range(2, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_b,
        |  CAST(SUM(list_sum(list_transform(range(1, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_g,
        |  CAST(SUM(list_sum(list_transform(range(0, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_r,
        |  CAST(SUM(CAST(('0x' || substr(hx, 2*(12*i+2)+1, 2)) AS BIGINT)) AS BIGINT) AS top_b
        |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_decode" ->
      // The oracle rebuilds what the PPM decoder must report, straight
      // from the raw text bytes: h = ⌊bytes/12⌋ rows of 4 RGB pixels;
      // channel c's sum = bytes at data positions ≡ c (mod 3), extracted
      // via hex-substr. coalesce: DuckDB list_sum([]) is NULL, the
      // decoder's empty-image fold is 0.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS h
        |  FROM documents)
        |SELECT doc_id, 4 AS width, CAST(h AS INTEGER) AS height,
        |  255 AS maxval, CAST(4 * h AS BIGINT) AS n_pixels,
        |  coalesce(CAST(list_sum(list_transform(range(0, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_r,
        |  coalesce(CAST(list_sum(list_transform(range(1, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_g,
        |  coalesce(CAST(list_sum(list_transform(range(2, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_token_budget" ->
      // quality formula mirrors q_doc_quality's exactly; the negated sort
      // key on the Spark side is ORDER BY quality DESC here (doubles
      // compare identically — the formula is bit-replicated)
      """WITH q AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |    0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
        |    + 0.4 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |    + 0.2 * (len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS qual
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY qual DESC, doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM q)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tok
        |FROM c WHERE cum <= 10000 ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      // Same synthesis (10-token lines), then the reference logic with
      // line STRINGS end to end: cross-doc distinct counts, >= 3 docs is
      // boilerplate, survivors re-join in position order. string_agg is
      // NULL for all-boilerplate docs; coalesce matches concat_ws's ''.
      """WITH tok AS (
        |  SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS w
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, pos, array_to_string(w[pos*10+1 : pos*10+10], ' ') AS line
        |  FROM (SELECT doc_id, w,
        |          unnest(range(0, CAST(ceil(len(w)/10.0) AS BIGINT))) AS pos
        |        FROM tok)),
        |boiler AS (
        |  SELECT line FROM (
        |    SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        |  WHERE df >= 3)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE line NOT IN (SELECT line FROM boiler)), '')) AS sig,
        |  COUNT(*) FILTER (WHERE line NOT IN (SELECT line FROM boiler)) AS n_kept,
        |  COUNT(*) FILTER (WHERE line IN (SELECT line FROM boiler)) AS n_dropped
        |FROM lines GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_resize" ->
      // The resized 2×h image keeps source pixels at even columns:
      // out(x,y) = src(2x, y), so channel c of out pixel i (row-major,
      // i = 2y+x) is source byte (4*(i//2) + 2*(i%2))*3 + c — recomputed
      // here by hex-substr straight from the raw text, independent of
      // both the resizer and the decoder.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS h
        |  FROM documents)
        |SELECT doc_id, 2 AS width, CAST(h AS INTEGER) AS height,
        |  CAST(2 * h AS BIGINT) AS n_pixels,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 0)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_r,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 1)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_g,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 2)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_wav" ->
      // The oracle reassembles what the WAV decoder must report straight
      // from the raw text bytes: mono 16-bit LE PCM, so frame i's sample
      // is byte(2i) | byte(2i+1)<<8, sign-extended — built here by hex
      // substring concatenation (high byte first makes the '0x' literal),
      // minus 65536 when the 16-bit pattern is negative. The rate mirrors
      // the per-row synthesis arithmetic.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS nf
        |  FROM documents)
        |SELECT doc_id, 1 AS n_channels,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |  16 AS bits, CAST(nf AS BIGINT) AS n_frames,
        |  coalesce(CAST(list_sum(list_transform(range(0, nf), i ->
        |    CAST(('0x' || substr(hx, 4*i+3, 2) || substr(hx, 4*i+1, 2)) AS BIGINT)
        |    - CASE WHEN CAST(('0x' || substr(hx, 4*i+3, 2)) AS BIGINT) >= 128
        |           THEN 65536 ELSE 0 END)) AS BIGINT), 0) AS sum_ch0
        |FROM b ORDER BY doc_id""".stripMargin,
    // mirrors qRetrievalEval CTE-for-CTE; per-term scores quantize to
    // integer nano-units BEFORE the pair sum (round-per-term playbook)
    "q_retrieval_eval" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(range(0, (greatest(len(w) - 8 - 1, 0) // 24) + 1)) AS ci, w
        |  FROM w),
        |c2 AS (
        |  SELECT doc_id * 1000 + ci AS chunk_id, doc_id, ci,
        |    array_to_string(w[ci*24+1:ci*24+32], ' ') AS ctext
        |  FROM ch),
        |q AS (SELECT doc_id AS query_id, ctext AS qtext FROM c2 WHERE doc_id < 20 AND ci = 0),
        |corp AS (SELECT chunk_id, ctext FROM c2 WHERE NOT (doc_id < 20 AND ci = 0)),
        |qt AS (SELECT query_id, unnest(list_distinct(string_split(qtext, ' '))) AS term FROM q),
        |cw AS (SELECT chunk_id, string_split(ctext, ' ') AS w FROM corp),
        |post AS (SELECT chunk_id, len(w) AS dl, unnest(w) AS term FROM cw),
        |tf AS (
        |  SELECT chunk_id, dl, term, COUNT(*) AS tf FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qt)
        |  GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, COUNT(DISTINCT chunk_id) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(len(string_split(ctext, ' '))) AS sum_dl FROM corp),
        |sc AS (
        |  SELECT qt.query_id, f.chunk_id, f.term,
        |    (((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5)
        |       / (CAST(d.df AS DOUBLE) + 0.5))
        |    * ((CAST(f.tf AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(f.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(f.dl AS DOUBLE)
        |            / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS s
        |  FROM tf f JOIN qt USING (term) JOIN dfx d USING (term) CROSS JOIN stats s),
        |tot AS (
        |  SELECT query_id, chunk_id,
        |    SUM(CAST(round(s * 1000000000.0) AS BIGINT)) AS score_nano
        |  FROM sc GROUP BY 1, 2),
        |rk AS (
        |  SELECT query_id, chunk_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_nano DESC, chunk_id) AS rank
        |  FROM tot),
        |top AS (
        |  SELECT query_id, rank,
        |    CASE WHEN chunk_id // 1000 = query_id THEN 1 ELSE 0 END AS hit
        |  FROM rk WHERE rank <= 5),
        |per AS (
        |  SELECT query_id, MAX(CASE WHEN rank = 1 THEN hit ELSE 0 END) AS h1, MAX(hit) AS h5
        |  FROM top GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(h1) AS BIGINT) AS hits_at_1, CAST(SUM(h5) AS BIGINT) AS hits_at_5
        |FROM per""".stripMargin,
    "q_bm25" ->
      // the score expression tree mirrors Rank.bm25Scores operation for
      // operation (rational idf — no ln), so doubles match bit-for-bit
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |posting AS (
        |  SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM tok),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM posting
        |  WHERE term IN ('spark', 'vector', 'stream', 'merge')
        |  GROUP BY doc_id, dl, term),
        |dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(len(w)) AS sum_dl FROM tok),
        |scored AS (
        |  SELECT f.doc_id, f.term,
        |    (((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5)
        |       / (CAST(d.df AS DOUBLE) + 0.5))
        |    * ((CAST(f.tf AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(f.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(f.dl AS DOUBLE)
        |            / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS score
        |  FROM tf f JOIN dfx d USING (term) CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN term = 'spark' THEN score END) AS s_spark,
        |    MAX(CASE WHEN term = 'vector' THEN score END) AS s_vector,
        |    MAX(CASE WHEN term = 'stream' THEN score END) AS s_stream,
        |    MAX(CASE WHEN term = 'merge' THEN score END) AS s_merge
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, s_spark, s_vector, s_stream, s_merge,
        |  COALESCE(s_spark, 0.0) + COALESCE(s_vector, 0.0)
        |    + COALESCE(s_stream, 0.0) + COALESCE(s_merge, 0.0) AS total
        |FROM agg ORDER BY total DESC, doc_id LIMIT 20""".stripMargin,
    "q_upsert" ->
      """WITH base AS (
        |  SELECT *, CAST(1 AS BIGINT) AS version, 0 AS src FROM orders),
        |upd AS (
        |  SELECT * REPLACE ('U' AS o_orderstatus, CAST(2 AS BIGINT) AS version, 1 AS src)
        |  FROM base WHERE o_orderkey % 10 = 0),
        |ins AS (
        |  SELECT * REPLACE (o_orderkey + 100000000 AS o_orderkey, 'I' AS o_orderstatus,
        |                    CAST(2 AS BIGINT) AS version, 1 AS src)
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |u AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, src DESC) AS rn FROM u)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  CAST(SUM(version) AS BIGINT) AS sum_version
        |FROM w WHERE rn = 1
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_bucketed_join" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_funnel" ->
      // independent formulation: iterated first-match-after-(ts,id) via
      // row_number windows — must agree with the Spark greedy fold
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type FROM events),
        |s1 AS (
        |  SELECT user_id, ts AS t1, event_id AS i1 FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM e WHERE event_type = 'view') WHERE rn = 1),
        |s2 AS (
        |  SELECT user_id, ts AS t2, event_id AS i2 FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM e JOIN s1 USING (user_id)
        |    WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (s1.t1, s1.i1))
        |  WHERE rn = 1),
        |s3 AS (
        |  SELECT user_id FROM (
        |    SELECT e.user_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM e JOIN s2 USING (user_id)
        |    WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (s2.t2, s2.i2))
        |  WHERE rn = 1),
        |ms AS (
        |  SELECT u.user_id,
        |    CASE WHEN s3.user_id IS NOT NULL THEN 3
        |         WHEN s2.user_id IS NOT NULL THEN 2
        |         WHEN s1.user_id IS NOT NULL THEN 1
        |         ELSE 0 END AS max_step
        |  FROM (SELECT DISTINCT user_id FROM e) u
        |  LEFT JOIN s1 USING (user_id)
        |  LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id))
        |SELECT v.i AS step, COUNT(*) AS n_users
        |FROM ms JOIN (VALUES (1), (2), (3)) v(i) ON ms.max_step >= v.i
        |GROUP BY v.i ORDER BY step""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN l_extendedprice < 20000.0 THEN -1
        |              WHEN l_extendedprice >= 80000.0 THEN 16
        |              ELSE CAST(least(floor((l_extendedprice - 20000.0)
        |                     / ((80000.0 - 20000.0) / 16)), 15) AS INTEGER)
        |         END AS bin
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT bin, COUNT(*) AS n,
        |  CASE WHEN bin >= 0 AND bin < 16
        |       THEN 20000.0 + bin * ((80000.0 - 20000.0) / 16) END AS bin_lo
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_impute" ->
      """WITH v AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events),
        |f AS (
        |  SELECT user_id, v,
        |    CAST(SUM(CAST(v AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
        |      / COUNT(v) OVER (PARTITION BY user_id) AS fill
        |  FROM v)
        |SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |  MIN(CASE WHEN v IS NULL THEN fill END) AS fill_value,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_present
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_zorder" ->
      s"""WITH g AS (
         |  SELECT l_partkey % 1024 AS xg, l_suppkey % 1024 AS yg FROM lineitem),
         |z AS (
         |  SELECT xg, yg, (${mortonSql(10, Seq("xg", "yg"))}) AS z FROM g)
         |SELECT z >> 10 AS zbucket, COUNT(*) AS n,
         |  CAST(SUM(xg) AS BIGINT) AS sum_x,
         |  CAST(SUM(yg) AS BIGINT) AS sum_y
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    "q_incremental" ->
      // direct whole-table aggregation: the Spark side merges three
      // disjoint batch states — agreement proves merge = recompute
      """SELECT o_orderpriority, COUNT(o_totalprice) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  MIN(o_totalprice) AS min_total,
        |  MAX(o_totalprice) AS max_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_oov" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (
        |  SELECT w FROM (SELECT w, COUNT(*) AS c FROM tok GROUP BY w
        |                 ORDER BY c DESC, w LIMIT 200)),
        |j AS (
        |  SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tok t LEFT JOIN v ON t.w = v.w)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_normalize" ->
      """WITH m AS (
        |  SELECT lang, text,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN '  ' || upper(text) || chr(9) || 'X' || chr(1) || 'Y  '
        |         ELSE text END AS mtext
        |  FROM documents),
        |n AS (
        |  SELECT lang, text,
        |    trim(regexp_replace(
        |      regexp_replace(lower(mtext), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[\x00-\x1F\x7F]', '', 'g')) AS norm
        |  FROM m)
        |SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(length(norm)) AS BIGINT) AS sum_len,
        |  CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
        |FROM n GROUP BY lang ORDER BY lang""".stripMargin,
    "q_typed_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders WHERE o_totalprice > 150000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_neg_pairs" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bk
        |  FROM documents),
        |reps AS (SELECT bk AS pb, MIN(doc_id) AS neg_id FROM b GROUP BY bk),
        |probes AS (
        |  SELECT doc_id, v.j,
        |    (bk + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |       || CAST(v.j AS VARCHAR)), 1, 8)) AS BIGINT) % 64) % 64 AS pb
        |  FROM b, (VALUES (1), (2)) v(j))
        |SELECT p.doc_id, MIN(p.j) AS j, r.neg_id
        |FROM probes p JOIN reps r USING (pb)
        |WHERE r.neg_id <> p.doc_id
        |GROUP BY p.doc_id, r.neg_id
        |ORDER BY p.doc_id, j""".stripMargin,
    "q_cms" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_interval_join" ->
      // native inequality join — independent of the bucketized plan
      """WITH a AS (
        |  SELECT user_id, ts AS s1, ts + INTERVAL 5 MINUTE AS e1 FROM events),
        |b AS (
        |  SELECT user_id, ts AS s2, ts + INTERVAL 10 MINUTE AS e2 FROM events
        |  WHERE event_type = 'error')
        |SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM a JOIN b ON a.user_id = b.user_id AND a.s1 < b.e2 AND b.s2 < a.e1
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
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
    "q_asof_forward" ->
      // DuckDB ASOF is backward-only: independent inequality-join +
      // row_number spelling (ties: greatest click_id, as the operator)
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.event_id, c.ts AS cts, c.click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts, c.click_id DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(m.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  m.click_id AS asof_click_id
        |FROM p LEFT JOIN (SELECT event_id, cts, click_id FROM j WHERE rn = 1) m
        |  ON p.event_id = m.event_id
        |ORDER BY p.event_id""".stripMargin,
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
    "q_ivf_exact" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_simhash_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_fingerprint_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfx AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term HAVING COUNT(*) >= 2),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |sc AS (
        |  SELECT f.doc_id, f.term, f.tf, d.df,
        |    CAST(f.tf AS DOUBLE) * ((CAST(n.n_docs AS DOUBLE) + 1.0)
        |      / (CAST(d.df AS DOUBLE) + 1.0)) AS score
        |  FROM tf f JOIN dfx d USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT doc_id, rank, term, tf, df, score
        |FROM r WHERE rank <= 3 AND doc_id < 50
        |ORDER BY doc_id, rank""".stripMargin,
    "q_quantile_bound" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_hll_merge" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_weighted_sample" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_retention" ->
      """WITH b AS (
        |  SELECT user_id,
        |    make_timestamp((epoch_us(ts) // 604800000000) * 604800000000) AS bucket
        |  FROM events),
        |c AS (SELECT user_id, min(bucket) AS cohort FROM b GROUP BY user_id)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST((epoch_us(b.bucket) - epoch_us(c.cohort)) // 604800000000 AS BIGINT) AS period,
        |  COUNT(DISTINCT b.user_id) AS n_active
        |FROM b JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_binning" ->
      """WITH b AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ntile(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
        |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        |FROM b GROUP BY l_returnflag, bin
        |ORDER BY l_returnflag, bin""".stripMargin,
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER w AS prev_et,
        |    lag(ts) OVER w AS prev_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT user_id, event_id, ts, event_type FROM o
        |  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et),
        |i AS (
        |  SELECT user_id, event_id, event_type, ts AS eff_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
        |  FROM c)
        |SELECT user_id, event_id, event_type,
        |  strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS effective_from,
        |  strftime(eff_to, '%Y-%m-%d %H:%M:%S') AS effective_to,
        |  eff_to IS NULL AS is_current
        |FROM i ORDER BY user_id, event_id""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |    CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderstatus
        |         ELSE o.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice
        |         ELSE o.o_totalprice END AS o_totalprice,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |         WHEN n.o_orderkey IS NULL THEN 'delete'
        |         WHEN n.o_orderstatus IS NOT DISTINCT FROM o.o_orderstatus
        |          AND n.o_totalprice IS NOT DISTINCT FROM o.o_totalprice
        |           THEN 'unchanged'
        |         ELSE 'update' END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT * FROM d WHERE change_type <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,
    "q_expectations" ->
      """WITH a AS (SELECT
        |  CAST(sum(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |  CAST(sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
        |  CAST(sum(CASE WHEN l_linestatus IS NOT NULL AND NOT regexp_full_match(l_linestatus, '(?:[OF])') THEN 1 ELSE 0 END) AS BIGINT) AS v_match,
        |  CAST(sum(CASE WHEN COALESCE(l_extendedprice >= 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v_sat,
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS v_uni
        | FROM lineitem)
        |SELECT rule, violations, violations = 0 AS passed FROM (
        |  SELECT 'in_range(l_discount,0.0,0.05)' AS rule, v_range AS violations FROM a
        |  UNION ALL SELECT 'in_set(l_returnflag)', v_set FROM a
        |  UNION ALL SELECT 'matches(l_linestatus)', v_match FROM a
        |  UNION ALL SELECT 'non_negative_price', v_sat FROM a
        |  UNION ALL SELECT 'not_null(l_returnflag)', v_null FROM a
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', v_uni FROM a)
        |ORDER BY rule""".stripMargin,
    "q_drift" ->
      """WITH r AS (
        |  SELECT CAST(value >= 25.0 AS INT) + CAST(value >= 50.0 AS INT)
        |       + CAST(value >= 75.0 AS INT) + CAST(value >= 100.0 AS INT)
        |       + CAST(value >= 150.0 AS INT) + CAST(value >= 200.0 AS INT)
        |       + CAST(value >= 250.0 AS INT) + CAST(value >= 300.0 AS INT) AS bin
        |  FROM events WHERE event_type = 'view' AND value IS NOT NULL),
        |c AS (
        |  SELECT CAST(value >= 25.0 AS INT) + CAST(value >= 50.0 AS INT)
        |       + CAST(value >= 75.0 AS INT) + CAST(value >= 100.0 AS INT)
        |       + CAST(value >= 150.0 AS INT) + CAST(value >= 200.0 AS INT)
        |       + CAST(value >= 250.0 AS INT) + CAST(value >= 300.0 AS INT) AS bin
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |bins AS (SELECT CAST(unnest(range(9)) AS INT) AS bin),
        |rc AS (SELECT bin, count(*) AS n FROM r GROUP BY bin),
        |cc AS (SELECT bin, count(*) AS n FROM c GROUP BY bin),
        |j AS (
        |  SELECT b.bin, COALESCE(rc.n, 0) AS ref_n, COALESCE(cc.n, 0) AS cur_n
        |  FROM bins b LEFT JOIN rc ON b.bin = rc.bin LEFT JOIN cc ON b.bin = cc.bin),
        |p AS (
        |  SELECT bin, ref_n, cur_n,
        |    (ref_n + 0.5) / (sum(ref_n) OVER () + 4.5) AS ref_p,
        |    (cur_n + 0.5) / (sum(cur_n) OVER () + 4.5) AS cur_p
        |  FROM j)
        |SELECT bin, ref_n, cur_n,
        |  round((cur_p - ref_p) * ln(cur_p / ref_p), 6) AS psi_term
        |FROM p ORDER BY bin""".stripMargin,
    "q_heavy_hitters" ->
      """WITH k AS (
        |  SELECT CASE WHEN l_orderkey % 4 = 0
        |              THEN 'hot_' || CAST(l_orderkey % 3 AS VARCHAR)
        |              ELSE 'cold_' || CAST(l_orderkey AS VARCHAR) END AS key
        |  FROM lineitem),
        |c AS (SELECT key, count(*) AS cnt FROM k GROUP BY key),
        |t AS (SELECT sum(cnt) AS n FROM c)
        |SELECT key, cnt FROM c, t WHERE cnt * 100 > n ORDER BY key""".stripMargin,
    "q_hh_containment" ->
      "SELECT CAST(0 AS BIGINT) AS n_violations",
    "q_anomaly" ->
      """WITH a AS (
        |  SELECT event_type, event_id, value,
        |    count(value) OVER w AS cnt,
        |    CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value*value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT event_type, event_id, value, cnt,
        |    s1/cnt AS mean,
        |    sqrt(greatest((s2 - s1*s1/cnt)/cnt, 0.0)) AS std
        |  FROM a),
        |c AS (
        |  SELECT event_type, event_id, value,
        |    CASE WHEN cnt >= 10 AND std > 0 THEN (value - mean)/std END AS zscore
        |  FROM b)
        |SELECT event_type, event_id, value, round(zscore, 6) AS zscore FROM c
        |WHERE abs(zscore) > 3.0 ORDER BY event_type, event_id""".stripMargin,
    "q_scale" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s2,
        |    count(l_extendedprice) AS n,
        |    min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, l_orderkey, l_linenumber,
        |  round(CASE WHEN sqrt(greatest((s2 - s1*s1/n)/n, 0.0)) > 0
        |       THEN (l_extendedprice - s1/n) / sqrt(greatest((s2 - s1*s1/n)/n, 0.0))
        |  END, 9) AS z_price,
        |  round(CASE WHEN mx - mn > 0 THEN (l_extendedprice - mn) / (mx - mn) END, 9) AS mm_price
        |FROM lineitem l JOIN s USING (l_returnflag)
        |WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents),
        |bg_tr AS (
        |  SELECT u[1] AS w1, u[2] AS w2
        |  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS u
        |        FROM tok WHERE doc_id % 5 <> 0)),
        |model AS (SELECT w1, w2, count(*) AS c12 FROM bg_tr GROUP BY w1, w2),
        |modelc AS (
        |  SELECT w1, w2, c12, sum(c12) OVER (PARTITION BY w1) AS c1 FROM model),
        |bg_cand AS (
        |  SELECT doc_id, u[1] AS w1, u[2] AS w2
        |  FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS u
        |        FROM tok WHERE doc_id % 5 = 0)),
        |uni AS (SELECT DISTINCT w1, c1 FROM modelc),
        |j AS (
        |  SELECT b.doc_id, COALESCE(m.c12, 0) AS c12, COALESCE(u.c1, 0) AS c1
        |  FROM bg_cand b
        |  LEFT JOIN modelc m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  LEFT JOIN uni u ON b.w1 = u.w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |  CAST(sum(c12) AS BIGINT) AS sum_c12,
        |  CAST(sum(c1) AS BIGINT) AS sum_c1
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cooccur" ->
      """WITH items AS (SELECT DISTINCT user_id, event_type FROM events),
        |m AS (SELECT event_type, count(*) AS n FROM items GROUP BY 1),
        |ne AS (SELECT count(DISTINCT user_id) AS n_entities FROM items),
        |p AS (
        |  SELECT a.event_type AS item_a, b.event_type AS item_b, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, n_ab, ma.n AS n_a, mb.n AS n_b,
        |  (CAST(n_ab AS DOUBLE) * CAST(n_entities AS DOUBLE)) /
        |    (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)) AS lift
        |FROM p JOIN m ma ON p.item_a = ma.event_type
        |       JOIN m mb ON p.item_b = mb.event_type, ne
        |ORDER BY item_a, item_b""".stripMargin,
    "q_pagerank" -> pagerankOracleSql,
    // The oracle MATERIALIZES the join the operator only predicts.
    "q_joinsize" ->
      """WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1),
        |actual AS (
        |  SELECT count(*) AS cnt
        |  FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey)
        |SELECT CAST(cnt AS BIGINT) AS n_pairs,
        |  (SELECT count(*) FROM c) AS n_keys_matched,
        |  CAST((SELECT max(n*n) FROM c) AS BIGINT) AS max_key_pairs
        |FROM actual""".stripMargin,
    "q_ab_ci" ->
      """WITH g AS (
        |  SELECT CAST(user_id % 2 AS INT) AS variant, count(*) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT variant, n, x,
        |    x / CAST(n AS DOUBLE) AS p,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM g)
        |SELECT variant, n, x,
        |  p AS p_hat,
        |  greatest((p + (1.96*1.96)/(2.0*nd) -
        |    1.96 * sqrt(p*(1.0 - p)/nd + (1.96*1.96)/(4.0*nd*nd)))
        |    / (1.0 + (1.96*1.96)/nd), 0.0) AS ci_lo,
        |  least((p + (1.96*1.96)/(2.0*nd) +
        |    1.96 * sqrt(p*(1.0 - p)/nd + (1.96*1.96)/(4.0*nd*nd)))
        |    / (1.0 + (1.96*1.96)/nd), 1.0) AS ci_hi
        |FROM f ORDER BY variant""".stripMargin,
    "q_diversity" ->
      """SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS ttr,
        |  CASE WHEN len(l) > 1 THEN 1.0 - CAST(s AS DOUBLE) /
        |    (CAST(len(l) AS DOUBLE) * (CAST(len(l) AS DOUBLE) - 1.0)) END AS simpson
        |FROM (
        |  SELECT doc_id, l,
        |    list_sum(list_transform(list_distinct(l),
        |      w -> len(list_filter(l, x -> x = w)) * (len(list_filter(l, x -> x = w)) - 1))) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "q_scd2_lookup" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER w AS prev_et,
        |    row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (
        |  SELECT user_id, event_id AS interval_id, event_type AS state_type,
        |    ts AS eff_from
        |  FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev_et),
        |f AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id,
        |  strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  i.state_type, i.interval_id
        |FROM f ASOF JOIN i ON f.user_id = i.user_id AND f.ts >= i.eff_from
        |ORDER BY f.user_id, f.event_id""".stripMargin,
    "q_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d),
        |s AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_periods
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_group_split" ->
      s"""$semanticComponentsCte,
        |roots AS (SELECT a AS vec_id, min(b) AS root FROM reach GROUP BY a),
        |keyed AS (
        |  SELECT e.vec_id, COALESCE(r.root, e.vec_id) AS gk
        |  FROM embeddings e LEFT JOIN roots r ON e.vec_id = r.vec_id),
        |b AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(gk AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
        |  FROM keyed)
        |SELECT CASE WHEN bucket < 8000 THEN 'train'
        |            WHEN bucket < 9000 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_audio_resample" ->
      // The oracle recomputes the resampled stream straight from the raw
      // text bytes: n_in = ⌊bytes/2⌋ mono 16-bit LE frames at 12 kHz,
      // n_out = 2·n_in//3 at 8 kHz, output frame j picks source frame
      // 3·j//2 — signed 16-bit reassembly by hex substring (high byte
      // first), minus 65536 when negative, summed over the PICKED frames
      // only. A 0-frame input still round-trips a valid container → a
      // 0/0 row on both sides (list_sum([]) is NULL → coalesce).
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS nin
        |  FROM documents)
        |SELECT doc_id, 8000 AS sample_rate,
        |  CAST(nin * 2 // 3 AS BIGINT) AS n_frames,
        |  coalesce(CAST(list_sum(list_transform(range(0, nin * 2 // 3), j ->
        |    CAST(('0x' || substr(hx, 4*(3*j//2)+3, 2) || substr(hx, 4*(3*j//2)+1, 2)) AS BIGINT)
        |    - CASE WHEN CAST(('0x' || substr(hx, 4*(3*j//2)+3, 2)) AS BIGINT) >= 128
        |           THEN 65536 ELSE 0 END)) AS BIGINT), 0) AS sum_ch0
        |FROM b ORDER BY doc_id""".stripMargin,
    // Bloom pruning never changes the result (no false negatives; false
    // positives die in the exact join), so the oracle is the plain semi
    // join the operator accelerates.
    "q_bloom_join" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Blocking is part of the contract: the oracle applies the identical
    // block (nation equality) before the edit-distance predicate.
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_resample" ->
      """WITH e AS (
        |  SELECT user_id,
        |    make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS b, value
        |  FROM events WHERE user_id < 3),
        |obs AS (
        |  SELECT user_id, b,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM e GROUP BY user_id, b),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(b), max(b), INTERVAL 1 HOUR)) AS b
        |  FROM e GROUP BY user_id)
        |SELECT g.user_id, strftime(g.b, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  last_value(o.sv IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
        |  o.sv IS NULL AS is_gap
        |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b
        |ORDER BY g.user_id, bucket""".stripMargin,
    // quantile_cont interpolates lower + (upper-lower)·frac with frac an
    // exact power-of-two fraction here, matching Spark's percentile bit
    // for bit; the fence arithmetic mirrors the operator's expression
    // shape exactly.
    "q_outliers" ->
      """WITH q AS (
        |  SELECT o_orderstatus,
        |    CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS q1,
        |    CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS q3
        |  FROM orders GROUP BY o_orderstatus),
        |b AS (
        |  SELECT o_orderstatus, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT o.o_orderstatus,
        |  CAST(round(b.q1 * 1000000.0) AS BIGINT) AS q1_micro,
        |  CAST(round(b.q3 * 1000000.0) AS BIGINT) AS q3_micro,
        |  CAST(round(b.lo * 1000000.0) AS BIGINT) AS lo_micro,
        |  CAST(round(b.hi * 1000000.0) AS BIGINT) AS hi_micro,
        |  CAST(SUM(CASE WHEN o.o_totalprice < b.lo OR o.o_totalprice > b.hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  COUNT(*) AS n_rows
        |FROM orders o JOIN b ON o.o_orderstatus = b.o_orderstatus
        |GROUP BY o.o_orderstatus, b.q1, b.q3, b.lo, b.hi
        |ORDER BY o.o_orderstatus""".stripMargin,
    // Moments accumulate as exact decimals; only the closed-form r runs
    // in doubles, with the identical expression shape on both engines.
    "q_corr" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100, 0) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p,
        |    CAST(round(l_discount * 100, 0) AS BIGINT) AS d
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_rows,
        |    CAST(SUM(q) AS DOUBLE) AS sq,
        |    CAST(SUM(p) AS DOUBLE) AS sp,
        |    CAST(SUM(d) AS DOUBLE) AS sd,
        |    CAST(SUM(q * p) AS DOUBLE) AS sqp,
        |    CAST(SUM(q * d) AS DOUBLE) AS sqd,
        |    CAST(SUM(p * d) AS DOUBLE) AS spd,
        |    CAST(SUM(q * q) AS DOUBLE) AS sqq,
        |    CAST(SUM(p * p) AS DOUBLE) AS spp,
        |    CAST(SUM(d * d) AS DOUBLE) AS sdd
        |  FROM v GROUP BY l_returnflag)
        |SELECT l_returnflag, x_col, y_col, n_rows AS n,
        |  round(CASE WHEN den <> 0 THEN num / den END, 12) AS corr
        |FROM (
        |  SELECT l_returnflag, 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, n_rows,
        |    n * sqp - sq * sp AS num,
        |    sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp) AS den FROM s
        |  UNION ALL
        |  SELECT l_returnflag, 'l_quantity', 'l_discount', n_rows,
        |    n * sqd - sq * sd, sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd) FROM s
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', 'l_discount', n_rows,
        |    n * spd - sp * sd, sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd) FROM s)
        |ORDER BY l_returnflag, x_col, y_col""".stripMargin,
    "q_consolidate" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  event_type, value
        |FROM (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
        |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id < 20)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Rebuild the SAME duplicate components (transitive closure over the
    // exact cosine pair set) with a recursive CTE, keep each component's
    // minimum id — verifying the grouping semantics of dedupByPairs, not
    // just its pair list.
    "q_semdedup" ->
      s"""$semanticComponentsCte,
        |losers AS (
        |  SELECT a AS vec_id FROM reach GROUP BY a HAVING min(b) <> a)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
        |ORDER BY vec_id""".stripMargin,
    // Recall of the banded-LSH pair source vs the brute-force baseline:
    // the oracle recomputes BOTH pair sets independently (bucketing
    // replicated from embedded plane literals), so the measured recall
    // itself is hash-verified, not self-reported.
    "q_lsh_recall" ->
      s"""WITH $nvCte,
        |$lshPairsCteChain,
        |bp AS (SELECT count(*) AS n_brute FROM ($brutePairsSubquery)),
        |lp AS (SELECT count(*) AS n_lsh FROM pairs)
        |SELECT n_brute, n_lsh,
        |  round(CAST(n_lsh AS DOUBLE) / n_brute, 6) AS recall
        |FROM bp, lp""".stripMargin,
  )
}
