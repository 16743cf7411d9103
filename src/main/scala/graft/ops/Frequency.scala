package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Frequent-item ("heavy hitter") detection — the key-skew diagnosis a
  * 100 TB pipeline runs BEFORE choosing a partitioning (feed the result
  * to [[Skew]]'s salting), and the corpus-statistics primitive behind
  * boilerplate detection (a crawl's most-repeated lines/hosts).
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  *
  * Two paths:
  *   - [[heavyHitters]] — exact: one hash shuffle on the key (map-side
  *     combined), then a two-row rollup of the ALREADY-AGGREGATED counts
  *     for the total; never a second scan of the base data. Right when
  *     the key cardinality fits a shuffle (it usually does — counts are
  *     8 bytes/key).
  *   - [[misraGries]] — bounded-memory summary: each partition keeps a
  *     `capacity`-entry Misra-Gries sketch (mapPartitions, O(capacity)
  *     state), partials merge by key-sum. Counts are LOWER bounds with
  *     total undercount <= n/(capacity+1) (each decrement event retires
  *     capacity+1 observed weight), so every key with true frequency
  *     > n/(capacity+1) is guaranteed present — the candidate
  *     set for a cheap exact recount when even the per-key count map is
  *     too big to shuffle. The candidate SET depends on partition layout
  *     (any MG merge does); the guarantee does not — q_hh_containment
  *     verifies it against the exact path.
  */
object Frequency {

  /** Exact keys whose frequency exceeds total/k, with their counts.
    * Output: (key as string, cnt), one shuffle + tiny rollup; the total
    * rides a 1-row broadcast cross join, never a single-partition window.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1, "k must exceed 1 (threshold is total/k)")
    val counts = df.select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__hh_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("__hh_total"))
      .select(col("key"), col("cnt"))
  }

  /** Misra-Gries candidate summary: (key, est) lower-bound counts.
    * Every key with true frequency > n/(capacity+1) appears. Partition-
    * local O(capacity) state; one shuffle of at most
    * partitions×capacity rows.
    */
  def misraGries(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    val partials = df.select(col(keyCol).cast("string").as("key"))
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        val counts = mutable.HashMap.empty[String, Long]
        for (key <- it) {
          counts.get(key) match {
            case Some(c) => counts.update(key, c + 1)
            case None if counts.size < capacity => counts.update(key, 1L)
            case None =>
              // Classic MG decrement-all-by-1: the unmatched arrival and
              // one unit of every stored counter cancel. Each event
              // retires capacity+1 observed weight, so there are at most
              // n/(capacity+1) events — O(capacity) each, O(n) amortized
              // — and any key's undercount is at most n/(capacity+1).
              for (k2 <- counts.keysIterator.toList) {
                val c = counts(k2) - 1
                if (c == 0L) counts.remove(k2) else counts.update(k2, c)
              }
          }
        }
        counts.iterator.map { case (k2, c) => (k2, c) }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("key", "est")
    // merged lower bounds stay lower bounds; sum is exact over partials
    partials.groupBy("key").agg(sum(col("est")).as("est"))
  }
}
