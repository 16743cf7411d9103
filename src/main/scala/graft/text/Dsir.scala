package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance-resampling data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every corpus document by how much its hashed n-gram feature
  * distribution looks like a TARGET slice (a trusted language/domain/
  * quality subset) versus the raw corpus, then keep the top-k.
  *
  * Feature space: unigrams + bigrams of the whitespace token stream,
  * hashed into `16^hexChars` buckets by an md5-prefix (hex-string bucket
  * keys so the oracle reproduces the bucketing verbatim — no engine-
  * specific integer hash). Per-bucket importance is the Laplace-smoothed
  * log-likelihood ratio ln(p_target/p_corpus), quantized EARLY to integer
  * micro-nats (round(ln·1e6) — the determinism playbook's round-per-term
  * trick), so per-document scores are exact BIGINT sums with no float
  * summation-order hazard.
  *
  * Scale shape (100 TB corpus): ONE marked counting pass over the corpus
  * (target membership is a predicate column, so target counts piggyback
  * the same map-side-combined aggregation — no second corpus scan), a
  * bucket-space-bounded LLR table (≤16^hexChars rows) that re-joins the
  * scoring explode hint-free (AQE broadcasts it from its measured size),
  * and one doc-keyed aggregation whose partial combine collapses each
  * document's features before the shuffle. Selection is a TakeOrdered
  * top-k, never a global sort. At extreme scale the corpus side of the
  * counting pass can run on a fixed sample — the LLR table is a
  * distribution estimate, not an exact invariant — but the default is
  * the exact single pass.
  */
object Dsir {

  /** Unigram + bigram md5-prefix bucket keys for one document's text.
    * Pure Catalyst HOFs (codegen'd, no shuffle); the token array is
    * bound once via [[graft.functions.ArrayMath.bound]] so the split is
    * not re-evaluated per feature.
    */
  def featureBuckets(text: Column, hexChars: Int): Column =
    graft.functions.ArrayMath.bound(TextStats.tokens(text)) { w =>
      val bigrams = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", try_element_at(w, i), try_element_at(w, i + 1))))
        .otherwise(array().cast("array<string>"))
      transform(concat(w, bigrams),
        f => substring(md5(f.cast("binary")), 1, hexChars))
    }

  /** Per-bucket integer LLR table from ONE counting pass over `corpus`:
    * `(bucket, llr_micro)` where
    * `llr_micro = round(1e6 · ln(((np+1)/(Np+B)) / ((nq+1)/(Nq+B))))`,
    * np/nq = target/corpus occurrence counts, Np/Nq their totals,
    * B = 16^hexChars the smoothing bucket-space size. `isTarget` marks
    * the target slice (e.g. `col("lang") === "en"`); a disjoint external
    * target corpus is the same call on a flagged union. Every bucket the
    * corpus contains appears (nq ≥ 1 by construction), so scoring joins
    * lose no features. The totals attach via 1-row broadcasts.
    */
  def importanceTable(corpus: DataFrame, textCol: String, isTarget: Column,
                      hexChars: Int): DataFrame = {
    val b = math.pow(16, hexChars).toLong
    val counts = corpus
      .select(explode(featureBuckets(col(textCol), hexChars)).as("bucket"),
        isTarget.as("__t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("__nq"), count_if(col("__t")).as("__np"))
    val totals = counts.agg(sum(col("__nq")).as("__tq"), sum(col("__np")).as("__tp"))
    counts.crossJoin(totals)
      .select(col("bucket"),
        // quantize per-bucket, BEFORE any summation: both engines compute
        // identical IEEE ratios from exact integer operands; only the final
        // ln can differ by ulps, absorbed by the 1e-6 grid
        round(log(
          ((col("__np") + lit(1)).cast("double") / (col("__tp") + lit(b)).cast("double")) /
            ((col("__nq") + lit(1)).cast("double") / (col("__tq") + lit(b)).cast("double"))
        ) * lit(1e6), 0).cast("long").as("llr_micro"))
  }

  /** Exact integer importance score per document: the sum of `llr_micro`
    * over every feature OCCURRENCE (occurrences, not distinct buckets —
    * the score is a log-probability ratio of the document under the two
    * hashed-ngram models). One explode + one hint-free bucket join (the
    * LLR side is bucket-space-bounded; AQE broadcasts it) + one doc-keyed
    * map-combined aggregation.
    */
  def scoreDocuments(corpus: DataFrame, idCol: String, textCol: String,
                     llr: DataFrame, hexChars: Int): DataFrame =
    corpus
      .select(col(idCol), explode(featureBuckets(col(textCol), hexChars)).as("bucket"))
      .join(llr, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(col("llr_micro")).as("score_micro"))

  /** Top-k most-target-like documents (TakeOrdered — per-partition k-row
    * state, no global sort), deterministically tie-broken by id.
    */
  def selectTopK(corpus: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, hexChars: Int = 3): DataFrame = {
    val llr = importanceTable(corpus, textCol, isTarget, hexChars)
    scoreDocuments(corpus, idCol, textCol, llr, hexChars)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }
}
