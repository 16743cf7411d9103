package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the record-linkage /
  * typo-dedup companion to the token-set operators in [[Dedup]].
  *
  * All-pairs Levenshtein is O(n²·len²) and unshippable at corpus scale;
  * the standard fix is BLOCKING: candidate pairs must agree on cheap
  * blocking keys (a column equality, a name prefix, a length bucket),
  * turning the cross product into an equi-join that shuffles once on the
  * block key and compares only within blocks. Blocking is part of the
  * operator's CONTRACT, not an approximation to hide: two strings in
  * different blocks are never compared, and callers pick blocks with the
  * recall/cost trade-off they need (coarser blocks = higher recall =
  * bigger blocks to scan). Within a block, the threshold form of
  * `levenshtein` (Spark ≥3.5) banded-early-exits at `maxDist+1`, so per
  * pair cost is O(maxDist·len), not O(len²).
  *
  * At 100 TB: block sizes are the skew knob. A degenerate block (every
  * row blank) recreates the cross product inside one task — cap block
  * cardinality upstream (e.g. [[graft.ops.Columns.capPerGroup]]) or add
  * a discriminating second key before running corpus-wide.
  */
object Fuzzy {

  /** Candidate pairs within blocks at edit distance ≤ `maxDist`.
    *
    * @param df       input frame
    * @param idCol    unique row id (output pairs are `id_a < id_b`, so
    *                 each unordered pair appears exactly once)
    * @param strCol   string to compare
    * @param blockBy  blocking keys — pairs must match on ALL of them
    * @param maxDist  inclusive Levenshtein threshold
    * @return (id_a, id_b, str_a, str_b, dist)
    */
  def fuzzyDupPairs(df: DataFrame, idCol: String, strCol: String,
                    blockBy: Seq[Column], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val blocks = blockBy.zipWithIndex.map { case (c, i) => c.as(s"__blk_$i") }
    val blockNames = blockBy.indices.map(i => s"__blk_$i")
    val a = df.select((col(idCol).as("id_a") +: col(strCol).as("str_a") +: blocks): _*)
    val b = df.select((col(idCol).as("id_b") +: col(strCol).as("str_b") +: blocks): _*)
    a.join(b, blockNames)
      .filter(col("id_a") < col("id_b"))
      // length pre-filter: |len(a)-len(b)| > maxDist can never pass — a
      // cheap codegen'd compare that skips the Levenshtein DP entirely
      .filter(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 above maxDist
      .drop(blockNames: _*)
  }

  /** Blocked fuzzy join of two frames: rows matching on `blockBy` keys
    * (same expressions applied to each side) with edit distance ≤
    * `maxDist` between `aStr`/`bStr`. Right-side columns keep their
    * names; pass pre-projected frames if names collide.
    */
  def fuzzyJoin(a: DataFrame, b: DataFrame, aStr: String, bStr: String,
                aBlock: Seq[Column], bBlock: Seq[Column], maxDist: Int): DataFrame = {
    require(aBlock.size == bBlock.size, "blocking key lists must align")
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val names = aBlock.indices.map(i => s"__blk_$i")
    val al = aBlock.zip(names).foldLeft(a) { case (d, (c, n)) => d.withColumn(n, c) }
    val bl = bBlock.zip(names).foldLeft(b) { case (d, (c, n)) => d.withColumn(n, c) }
    al.join(bl, names.toSeq)
      .filter(abs(length(col(aStr)) - length(col(bStr))) <= maxDist)
      .withColumn("dist", levenshtein(col(aStr), col(bStr), maxDist))
      .filter(col("dist") >= 0)
      .drop(names: _*)
  }

  /** Keep-one-per-typo-cluster dedup: [[fuzzyDupPairs]] →
    * [[Dedup.dedupByPairs]] connected components, minimum id survives.
    */
  def fuzzyDedupe(df: DataFrame, idCol: String, strCol: String,
                  blockBy: Seq[Column], maxDist: Int): DataFrame =
    Dedup.dedupByPairs(df, idCol,
      fuzzyDupPairs(df, idCol, strCol, blockBy, maxDist))
}
