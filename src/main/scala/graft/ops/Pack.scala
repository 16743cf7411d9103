package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining data: lay documents out into one
  * concatenated token stream and chunk it into fixed-size context
  * windows. A document's `pack_id` is the window containing its first
  * token — the standard concatenate-then-chunk layout, computed
  * declaratively (exclusive running token sum / window size) instead of
  * driver-side.
  *
  * Scale design: the running sum is windowed per SHARD (e.g. language,
  * split, or a hash bucket) — one shuffle on the shard key, partition-
  * local sort, no single-partition global window (the reference's W1
  * hazard). Pack ids are shard-local; (shard, pack_id) is the global
  * key. Shards are independent, so 1000 executors pack 1000 shards
  * concurrently at any corpus size.
  */
object Pack {

  /** @param shardCols  partition keys; packs never span shards
    * @param orderCols  deterministic layout order within a shard (must be
    *                   a total order — add a unique id as tiebreaker)
    * @param tokensCol  per-document token count
    * @param maxTokens  context window size in tokens
    * @return input plus `pack_id` (0-based within shard) and
    *         `pack_offset` (the document's first-token offset within its
    *         shard's stream)
    */
  def packSequences(df: DataFrame, shardCols: Seq[String], orderCols: Seq[String],
                    tokensCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_offset",
        (sum(col(tokensCol)).over(w) - col(tokensCol)).cast("long"))
      .withColumn("pack_id", (col("pack_offset") / maxTokens).cast("long"))
  }

  /** Pack-level summary: documents and token totals per (shard, pack).
    * Chunks that straddle a window boundary count toward the pack holding
    * their first token, so per-pack totals may exceed `maxTokens` by at
    * most one document's tokens — the training loader splits those at
    * read time (concatenate-then-chunk semantics).
    */
  def packSummary(packed: DataFrame, shardCols: Seq[String], tokensCol: String): DataFrame =
    packed.groupBy((shardCols :+ "pack_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).cast("long").as("n_tokens"))
}
