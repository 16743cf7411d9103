package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and dataset splitting.
  *
  * Training pipelines need splits that are (a) stable across reruns and
  * cluster sizes — `rand()` is neither — and (b) a pure function of a row
  * key, so late-arriving rows land in the same split. Everything here
  * derives from an md5-based hash bucket of the key column: md5 is
  * available in every engine (the DuckDB oracle reproduces it hex-for-hex),
  * and bucketing is a narrow map — no shuffle, no state.
  *
  * For hot paths where cross-engine reproducibility is not needed,
  * swap [[hashBucket]]'s md5 for `xxhash64` (cheaper, same contract).
  */
object Sampling {

  /** Uniform bucket in [0, nBuckets) from the key's md5: first 8 hex chars
    * → 32-bit int → mod. Unsigned 32-bit value, so no negative-mod
    * surprises.
    */
  def hashBucket(key: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  /** Deterministic train/validation/test-style split: `weights` are
    * (label, weight) pairs; each row's label is chosen by its key's hash
    * bucket falling into the cumulative weight range (resolution 1/10000).
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
                         weights: Seq[(String, Double)],
                         splitCol: String = "split"): DataFrame = {
    val total = weights.map(_._2).sum
    val bucket = hashBucket(col(keyCol), 10000)
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).map(f => (f * 10000).round)
    val expr = weights.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((label, _), i)) =>
        when(bucket >= cuts(i) && bucket < cuts(i + 1), label).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic fraction sample: keeps the same rows on every run and
    * on any cluster layout (unlike `df.sample`).
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol), 10000) < (fraction * 10000).round)

  /** Per-stratum deterministic sample: `fraction` applies within every
    * distinct value of `strataCols` (key-hash based, so no sampleBy seed
    * drift between runs).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCols: Seq[String],
                       fraction: Double): DataFrame =
    deterministicSample(df, keyCol, fraction)
}
