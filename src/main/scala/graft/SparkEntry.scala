package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_agg")(spark, "/root/testdata/sf0.001")

  /** One runnable query per implemented operator — the union of the
    * per-family registries. Families hold their own defs + oracle SQL;
    * `require` guards make a key collision (which `++` would silently
    * resolve last-wins) a construction-time failure instead.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = PriceQueries.queries ++
    StatsQueries.queries ++
    CoreQueries.queries ++
    EventQueries.queries ++
    JoinQueries.queries ++
    TextQueries.queries ++
    DedupQueries.queries ++
    EmbedQueries.queries ++
    GraphQueries.queries ++
    SamplingQueries.queries ++
    MultimodalQueries.queries
    require(merged.size == PriceQueries.queries.size + StatsQueries.queries.size + CoreQueries.queries.size + EventQueries.queries.size + JoinQueries.queries.size + TextQueries.queries.size + DedupQueries.queries.size + EmbedQueries.queries.size + GraphQueries.queries.size + SamplingQueries.queries.size + MultimodalQueries.queries.size,
      "duplicate query name across family registries")
    merged
  }

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
      "q_rolling_hll", "q_compact_audit", "q_lsh_recall", "q_pq_recall",
      "q_sq8_recall")

  /** DuckDB oracle SQL per query — the union of the per-family maps. */
  def oracleSql: Map[String, String] = {
    val merged = PriceQueries.oracleSql ++
    StatsQueries.oracleSql ++
    CoreQueries.oracleSql ++
    EventQueries.oracleSql ++
    JoinQueries.oracleSql ++
    TextQueries.oracleSql ++
    DedupQueries.oracleSql ++
    EmbedQueries.oracleSql ++
    GraphQueries.oracleSql ++
    SamplingQueries.oracleSql ++
    MultimodalQueries.oracleSql
    require(merged.size == PriceQueries.oracleSql.size + StatsQueries.oracleSql.size + CoreQueries.oracleSql.size + EventQueries.oracleSql.size + JoinQueries.oracleSql.size + TextQueries.oracleSql.size + DedupQueries.oracleSql.size + EmbedQueries.oracleSql.size + GraphQueries.oracleSql.size + SamplingQueries.oracleSql.size + MultimodalQueries.oracleSql.size,
      "duplicate oracle name across family registries")
    merged
  }

  /** Forwarder kept for PlanSpec (bucketed-layout fixture). */
  private[graft] def bucketedTables(s: SparkSession, dir: String): (String, String) =
    JoinQueries.bucketedTables(s, dir)
}
