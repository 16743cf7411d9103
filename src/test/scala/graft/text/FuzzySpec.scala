package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class FuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def names = Seq(
    (1L, "n1", "smith"), (2L, "n1", "smyth"), (3L, "n1", "smithe"),
    (4L, "n1", "jones"), (5L, "n2", "smith"), (6L, "n2", "jones"),
    (7L, "n2", "joness"),
  ).toDF("id", "block", "name")

  /** Naive reference: all pairs within a block at distance <= maxDist. */
  private def naivePairs(maxDist: Int): Set[(Long, Long, Int)] = {
    val rows = names.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2
      d = levenshteinDist(a._3, b._3)
      if d <= maxDist
    } yield (a._1, b._1, d)).toSet
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("fuzzyDupPairs matches the naive blocked all-pairs result") {
    for (maxDist <- Seq(1, 2)) {
      val got = Fuzzy.fuzzyDupPairs(names, "id", "name", Seq(col("block")), maxDist)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == naivePairs(maxDist), s"maxDist=$maxDist")
    }
  }

  test("cross-block near-identical strings are never compared (blocking contract)") {
    // ids 1 (n1) and 5 (n2) are the SAME string but different blocks
    val got = Fuzzy.fuzzyDupPairs(names, "id", "name", Seq(col("block")), 2)
      .filter(col("id_a") === 1L && col("id_b") === 5L)
    assert(got.count() == 0)
  }

  test("fuzzyJoin links two frames within shared blocks") {
    val clean = Seq(("smith", "n1"), ("jones", "n2")).toDF("canon", "blk")
    val dirty = Seq(("smyth", "n1"), ("joness", "n2"), ("smyth", "n2")).toDF("raw", "blk2")
    val got = Fuzzy.fuzzyJoin(clean, dirty, "canon", "raw",
        Seq(col("blk")), Seq(col("blk2")), maxDist = 1)
      .select("canon", "raw").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // smyth in n2 has no n2-blocked canon within distance 1
    assert(got == Set(("smith", "smyth"), ("jones", "joness")))
  }

  test("fuzzyDedupe keeps each typo-cluster's minimum id plus all singletons") {
    val got = Fuzzy.fuzzyDedupe(names, "id", "name", Seq(col("block")), 1)
      .select("id").as[Long].collect().toSet
    // n1: {smith,smyth} cluster -> 1 survives, 2 dies; smithe is dist 1
    // from smith -> same component, dies; jones singleton survives.
    // n2: {jones,joness} -> 6 survives, 7 dies; smith singleton survives.
    assert(got == Set(1L, 4L, 5L, 6L))
  }

  test("quadratic fallback (maxDist >= 3) agrees with the naive result too") {
    val got = Fuzzy.fuzzyDupPairs(names, "id", "name", Seq(col("block")), 3)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == naivePairs(3))
  }

  test("signature path works with NO blocking keys (corpus-wide search)") {
    val got = Fuzzy.fuzzyDupPairs(names, "id", "name", Nil, 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same as naive without the block constraint
    val rows = names.collect().map(r => (r.getLong(0), r.getString(2)))
    val want = (for {
      a <- rows; b <- rows if a._1 < b._1
      if levenshteinDist(a._2, b._2) <= 1
    } yield (a._1, b._1)).toSet
    assert(got == want)
  }

  test("deletion signatures: sharing a signature is necessary for lev <= k") {
    import spark.implicits._
    val pairsToCheck = Seq(("smith", "smyth"), ("smith", "mith"), ("smith", "smiths"),
      ("abc", "cba"), ("kitten", "sitting"), ("", "a"), ("ab", "ba"))
    for (k <- Seq(1, 2); (a, b) <- pairsToCheck) {
      val Seq(sa, sb) = Seq(a, b).toDF("s")
        .select(Fuzzy.deletionSigs(col("s"), k)).as[Seq[String]].collect().toSeq
      val shares = sa.toSet.intersect(sb.toSet).nonEmpty
      if (levenshteinDist(a, b) <= k)
        assert(shares, s"lev($a,$b) <= $k must share a signature")
    }
  }

  test("both paths emit the same schema; no internal columns leak") {
    val sig = Fuzzy.fuzzyDupPairs(names, "id", "name", Seq(col("block")), 1)
    val quad = Fuzzy.fuzzyDupPairs(names, "id", "name", Seq(col("block")), 3)
    assert(sig.columns.toSeq == Seq("id_a", "str_a", "id_b", "str_b", "dist"))
    assert(sig.columns.toSeq == quad.columns.toSeq)
  }

  test("maxDist=0 degenerates to exact match within block") {
    val dup = Seq((1L, "b", "x"), (2L, "b", "x"), (3L, "b", "y")).toDF("id", "block", "name")
    val got = Fuzzy.fuzzyDupPairs(dup, "id", "name", Seq(col("block")), 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
