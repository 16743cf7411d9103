package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage — the standard scoring
  * model for "are these two records the same entity?" (deduping customer
  * registers, linking scanner items to catalog entries — the ONS's own
  * record-linkage tradition). Candidate pairs come from a BLOCKED source
  * (an equi-join on block keys, [[graft.text.Fuzzy]]'s signature pairs —
  * never all-pairs); this module turns per-field agreement flags into
  * the composite match weight
  *
  *   W = Σ_i  agreeᵢ ? ln(mᵢ/uᵢ) : ln((1−mᵢ)/(1−uᵢ))
  *
  * with mᵢ = P(field agrees | same entity), uᵢ = P(agrees | different).
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  */
object Linkage {

  /** One comparison field: the agreement expression (boolean Column)
    * plus its m/u probabilities (caller-supplied — in practice from EM
    * or clerical estimates; must lie strictly inside (0,1)).
    */
  final case class Field(agree: Column, m: Double, u: Double)

  /** The two per-field log-weights, nano-quantized ONCE on the driver:
    * every engine then works from the identical integer constants, so
    * no libm-in-the-oracle question ever arises (inline these numbers
    * into replay SQL via [[weightsNano]]).
    */
  private[graft] def weightsNano(f: Field): (Long, Long) = {
    require(f.m > 0 && f.m < 1, s"m must be in (0,1): ${f.m}")
    require(f.u > 0 && f.u < 1, s"u must be in (0,1): ${f.u}")
    (math.round(math.log(f.m / f.u) * 1e9),
      math.round(math.log((1 - f.m) / (1 - f.u)) * 1e9))
  }

  /** Score candidate pairs: appends `score_nano` (exact integer sum of
    * the per-field weights) and `band` — "match" at/above
    * `upperNano`, "non_match" below `lowerNano`, "possible" between
    * (the Fellegi-Sunter three-way decision). Null field values count
    * as DISAGREEMENT (`agree` null-safe-coalesced to false): an absent
    * value is evidence against, never silently dropped.
    *
    * Scale shape: pure per-row arithmetic over the pair stream — zero
    * additional shuffles on top of whatever produced the pairs.
    */
  def score(pairs: DataFrame, fields: Seq[Field],
            lowerNano: Long, upperNano: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(lowerNano <= upperNano, "need lowerNano <= upperNano")
    val total = fields.map { f =>
      val (wa, wd) = weightsNano(f)
      when(coalesce(f.agree, lit(false)), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs
      .withColumn("score_nano", total)
      .withColumn("band",
        when(col("score_nano") >= upperNano, "match")
          .when(col("score_nano") < lowerNano, "non_match")
          .otherwise(lit("possible")))
  }
}
