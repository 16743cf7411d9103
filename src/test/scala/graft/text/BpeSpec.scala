package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus(lines: String*) =
    createDf(spark, "text string", lines.map(l => Seq[Any](l)))

  private def merges(rounds: Int, lines: String*): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(corpus(lines: _*), "text", rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)

  test("merge order: counts first, lexicographic (left, right) tiebreak") {
    // vocab: aaab×2, abab×1
    // round 1 pairs: (a,a)=4, (a,b)=4, (b,a)=1 — tie broken toward (a,a)
    // round 2 (after aaab→[aa,a,b]): (a,b)=4 wins over (aa,a)=2
    // round 3: aaab→[aa,ab], abab→[ab,ab]: (aa,ab)=2 over (ab,ab)=1
    val got = merges(3, "aaab aaab", "abab")
    assert(got == Seq(
      (1, "a", "a", 4L), (2, "a", "b", 4L), (3, "aa", "ab", 2L)))
  }

  test("greedy-left within runs: lllll merges to [ll, ll, l], not [ll, l, ll]") {
    val got = merges(2, "lllll")
    assert(got.head == ((1, "l", "l", 4L)))
    // [ll, ll, l] yields pairs (ll,ll) and (ll,l); tiebreak picks (ll,l).
    // A wrong fold ([ll, l, ll]) would surface (l,ll) instead.
    assert(got(1) == ((2, "ll", "l", 1L)))
  }

  test("single-symbol vocabulary dries out early with a stable schema") {
    val out = Bpe.trainMerges(corpus("a b a"), "text", rounds = 5)
    assert(out.columns.toSeq == Seq("round", "left", "right", "n"))
    assert(out.count() == 0)
  }

  test("word counts weight pair counts (frequency, not document presence)") {
    // "xy" appears 3 times across 2 docs: (x,y) = 3
    val got = merges(1, "xy xy", "xy z")
    assert(got == Seq((1, "x", "y", 3L)))
  }

  test("merged symbols participate in later rounds (multi-char pairs)") {
    val got = merges(3, "abc abc abc")
    // (a,b) and (b,c) tie at 3 → (a,b); then (ab,c)=3
    assert(got.take(2) == Seq((1, "a", "b", 3L), (2, "ab", "c", 3L)))
    assert(got.size == 2) // fully merged: no pairs remain for round 3
  }
}
