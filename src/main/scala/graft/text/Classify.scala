package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Linear quality-classifier inference — the fastText-style scoring
  * stage every production curation pipeline runs after the heuristic
  * filters (the trained complement of [[TextStats.qualityScore]]):
  * hash word n-grams into D buckets, average the bucket weights, add a
  * bias, squash through a sigmoid.
  *
  * Reference scope note: ons_utils has no classifier stage; this is a
  * north-star LLM-pipeline extension (cf. fastText, Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification" — public paper).
  *
  * Design for 100 TB: the entire scorer is ONE per-row Catalyst
  * expression tree — tokenize, n-gram, hash, weight-lookup and pooling
  * all ride higher-order array functions over a LITERAL weight array
  * (broadcast with the plan, no join, no shuffle, no UDF), so scoring
  * stays inside whole-stage codegen and scales embarrassingly with
  * rows. Weights are micro-quantized longs: the feature sum is exact
  * integer arithmetic, so scores are bit-deterministic and
  * oracle-replayable; the only IEEE steps are the final mean, bias add
  * and sigmoid.
  *
  * Hashing follows the repo's md5-selection convention (first 8 hex
  * chars → long → pmod D) so any engine reproduces bucket ids exactly
  * — the same trick [[graft.ops.Sampling]] uses for splits.
  */
object Classify {

  /** Word-level features: unigrams plus adjacent-pair bigrams
    * (`a_b`), fastText's default n-gram recipe. Pure array ops: the
    * bigram list is the token list zipped against its own tail (the
    * ragged last pair nulls out and filters away).
    */
  def ngramFeatures(text: Column, bigrams: Boolean = true): Column = {
    val toks = TextStats.tokens(text)
    if (!bigrams) toks
    else concat(toks,
      filter(
        zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => when(b.isNotNull, concat_ws("_", a, b))),
        f => f.isNotNull))
  }

  /** Stable feature bucket in [0, dim): md5(seed:feature) hex prefix →
    * long → pmod. Oracle spelling:
    * `CAST(('0x' || substr(md5(seed || ':' || f), 1, 8)) AS BIGINT) % dim`.
    */
  def featureBucket(feature: Column, dim: Int, seed: String): Column = {
    require(dim > 0, s"dim must be positive: $dim")
    pmod(conv(substring(md5(concat(lit(seed + ":"), feature)), 1, 8), 16, 10)
      .cast("long"), lit(dim.toLong))
  }

  /** Pre-sigmoid score z = mean(w[h(f)]) + bias over the document's
    * features, weights in exact micro units (1e-6). The sum
    * accumulates as a long fold over the feature array — exact — and
    * divides once at the end; empty documents score bias alone.
    */
  def linearLogit(text: Column, weightsMicros: Seq[Long], biasMicros: Long,
                  seed: String = "clf", bigrams: Boolean = true): Column = {
    val dim = weightsMicros.size
    require(dim > 0, "need at least one weight")
    val warr = lit(weightsMicros.toArray)
    val feats = ngramFeatures(text, bigrams)
    val sumMicros = aggregate(feats, lit(0L),
      (acc, f) => acc + try_element_at(warr, (featureBucket(f, dim, seed) + lit(1L)).cast("int")))
    val n = size(feats)
    when(n > 0,
      sumMicros.cast("double") / n.cast("double") / lit(1e6)
        + lit(biasMicros.toDouble / 1e6))
      .otherwise(lit(biasMicros.toDouble / 1e6))
  }

  /** Logistic squash: 1 / (1 + e^(−z)). */
  def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full classifier score in [0,1], 6 dp — the number a curation
    * pipeline thresholds on. Same IEEE tree on any engine given the
    * same weights (exact integer feature sums underneath).
    */
  def score(text: Column, weightsMicros: Seq[Long], biasMicros: Long,
            seed: String = "clf", bigrams: Boolean = true): Column =
    round(sigmoid(linearLogit(text, weightsMicros, biasMicros, seed, bigrams)), 6)

  /** Exact decision at threshold 0.5: sigmoid(z) ≥ 0.5 ⟺ z ≥ 0 ⟺
    * Σw + bias·n ≥ 0 — an ALL-INTEGER comparison, no sigmoid, no 6-dp
    * rounding boundary. The selection/fairness contract needs the
    * decision itself to be oracle-exact; thresholding the rounded
    * [[score]] would make documents within half an ulp of 0.5 engine-
    * dependent. Empty documents decide on the bias sign alone (the
    * [[linearLogit]] convention).
    */
  def selectedAtHalf(text: Column, weightsMicros: Seq[Long], biasMicros: Long,
                     seed: String = "clf", bigrams: Boolean = true): Column = {
    val dim = weightsMicros.size
    require(dim > 0, "need at least one weight")
    val warr = lit(weightsMicros.toArray)
    val feats = ngramFeatures(text, bigrams)
    val sumMicros = aggregate(feats, lit(0L),
      (acc, f) => acc + try_element_at(warr, (featureBucket(f, dim, seed) + lit(1L)).cast("int")))
    val n = size(feats)
    when(n > 0, sumMicros + lit(biasMicros) * n >= 0L)
      .otherwise(lit(biasMicros >= 0L))
  }

  /** Deterministic demo weights for a D-bucket model — the fixture
    * both the q_classify query and its DuckDB oracle regenerate from
    * the same closed form (no trained artifact to ship):
    * w[j] = ((j·37 + 11) mod 101 − 50) / 100, in micros.
    */
  def demoWeightsMicros(dim: Int): Seq[Long] =
    (0 until dim).map(j => (((j * 37 + 11) % 101) - 50).toLong * 10000L)
}
