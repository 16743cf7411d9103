package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the link-analysis
  * complement of [[graft.text.Dedup.connectedComponents]] (which handles
  * the undirected reachability case).
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  */
object Graph {

  /** PageRank over a directed edge list, in EXACT integer arithmetic.
    *
    * Ranks live in integer `unit`-ths (default 1e12): iteration t+1 is
    *
    *   r'(v) = ((unit·15) div 100) div N  +  (85 · Σ_{u→v} (r(u) div d(u))) div 100
    *
    * — the damping-0.85 update with every division a truncating integer
    * `div` applied in a fixed order, so the result is bit-identical on
    * any engine and any partitioning (float PageRank never is). The
    * truncated remainders (and dangling-node mass) drain a few units per
    * iteration rather than redistributing — the standard simple variant,
    * stated in the contract.
    *
    * Scale shape: each iteration is one hash join edges⋈ranks on the
    * source (both sides partition by it — at 100 TB pre-partition or
    * bucket the edge list once and every iteration reuses the layout),
    * one map-side-combined aggregation onto the destination, and a left
    * join back onto the node set. State is node-sized, edges never
    * mutate; each iteration's result is localCheckpointed so the plan
    * stays iteration-flat (the lineage would otherwise double per round).
    *
    * @param edges (src, dst) rows; duplicates collapse (unweighted)
    * @return (node, rank) with rank in `unit`-ths; Σ rank <= unit
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, unit: Long = 1000000000000L,
               checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(unit >= 1000000L, "unit too coarse for meaningful ranks")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // each edge carries its source degree from the start: one join paid
    // once instead of per iteration
    val e = e0.join(outdeg, Seq("src")).localCheckpoint(true)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.agg(count(lit(1)).as("n"))
    // all arithmetic stays in columns — N rides a 1-row broadcast, the
    // driver never holds a rank
    var ranks = nodes.crossJoin(broadcast(nNodes))
      .select(col("node"), expr(s"${unit}L div n").as("rank"))
      .localCheckpoint(true)
    val base = s"(${unit}L * 15L div 100L) div n"
    for (i <- 1 to iterations) {
      // node-sized rank state broadcasts; the (frozen, degree-carrying)
      // edge list never re-shuffles — only the dst-keyed partial-agg
      // moves data. (If node state outgrows broadcast at extreme scale,
      // drop the hint and both sides hash on src.)
      val contribs = e
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .select(col("dst").as("node"), expr("rank div d").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(nNodes))
        .select(col("node"),
          expr(s"$base + (85L * coalesce(in_mass, 0L)) div 100L").as("rank"))
      // checkpoint on a cadence: lineage stays bounded (it would double
      // per round) without paying a materialization job every iteration
      ranks = if (i % checkpointEvery == 0 || i == iterations) next.localCheckpoint(true)
        else next
    }
    ranks
  }
}
