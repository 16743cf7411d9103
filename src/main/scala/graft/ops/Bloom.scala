package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns

/** Explicit bloom-filter join pruning.
  *
  * The 100 TB problem this solves: a selective dimension-side predicate
  * (think "orders over 500k") leaves a small key set, but the fact side
  * still shuffles EVERY row to the join — the filter can't reach the fact
  * scan because selectivity lives on the other table. Spark's runtime
  * row-level filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * inject exactly this pattern opportunistically; this operator makes it
  * explicit and deterministic: build a bloom filter over the build-side
  * keys (one aggregation job — only the few-MB sketch ever reaches the
  * driver), ship it to every executor as a literal, and drop fact rows
  * BEFORE the join's Exchange. The probe is Spark's own codegen'd
  * `might_contain` over `xxhash64` — no UDF, no black box.
  *
  * False positives pass the bloom (at ~`fpp` rate) and are removed by the
  * exact join that follows; false negatives cannot happen, so
  * [[bloomSemiJoin]] is EXACTLY a semi join — the bloom only changes how
  * many rows reach the shuffle, never the result.
  */
object Bloom {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (standard bloom sizing: m = -n·ln p / (ln 2)²).
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** Build a serialized bloom filter over `xxhash64(key)` with one
    * aggregation job. Distributed build (per-partition filters OR-merged
    * by the partial aggregate); only the sketch bytes are collected —
    * for 1M keys at 1% fpp that is ~1.2 MB, independent of table size.
    */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY Math.min-clamps both parameters
    // against these session confs (defaults: 4M items, 67,108,864 bits ≈
    // 8 MB) — a clamped sketch quietly degrades fpp to tens of percent
    // and the prune stops pruning exactly at the scale this operator
    // targets. Fail loudly instead and tell the caller which knob to
    // raise ("no silent caps").
    def cap(conf: String, default: Long, requested: Long): Unit = {
      val limit = df.sparkSession.conf.getOption(conf).map(_.toLong).getOrElse(default)
      require(requested <= limit,
        s"requested $requested exceeds $conf=$limit — Spark would silently " +
          s"clamp the bloom filter (degrading fpp); raise the conf or lower expectedItems/fpp")
    }
    cap("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L, expectedItems)
    cap("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L, numBits)
    val agg = new BloomFilterAggregate(
      GraftColumns.exprOf(xxhash64(key)),
      GraftColumns.exprOf(lit(expectedItems)),
      GraftColumns.exprOf(lit(numBits)),
    ).toAggregateExpression()
    df.select(GraftColumns.ofExpr(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Keep only rows whose key MIGHT be in the bloom filter. The filter is
    * a literal, so every executor probes a local deserialized copy —
    * codegen'd, no shuffle, no broadcast join. Rows with a null key are
    * dropped (null never equi-joins, so pruning it is semantics-neutral
    * for the join this guards).
    */
  def pruneByBloom(df: DataFrame, key: Column, bloom: Array[Byte]): DataFrame =
    df.filter(key.isNotNull && GraftColumns.ofExpr(BloomFilterMightContain(
      GraftColumns.exprOf(lit(bloom)), GraftColumns.exprOf(xxhash64(key)))))

  /** Semi join `big` ⋉ `small` with bloom pre-pruning: exact result (the
    * real semi join runs after the prune), but only the ~`fpp` false
    * positives plus true matches ever reach the join's shuffle. Use when
    * `small` is too big to broadcast but its key set fits a bloom filter
    * — the sweet spot where a plain shuffle join moves 100× more fact
    * rows than survive.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    Guards.requireNoReservedNames(big, Seq("__bloom_key"), "bloomSemiJoin")
    val bloom = buildBloom(small, col(smallKey), expectedItems, fpp)
    val pruned = pruneByBloom(big, col(bigKey), bloom)
    val keys = small.select(col(smallKey).as("__bloom_key")).distinct()
    pruned.join(keys, col(bigKey) === col("__bloom_key"), "left_semi")
  }
}
