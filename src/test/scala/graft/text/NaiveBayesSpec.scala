package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) =
    createDf(spark, "doc_id bigint, lang string, text string",
      rows.map { case (i, l, t) => Seq[Any](i, l, t) })

  test("hand-checked two-class scores: exact nano arithmetic end to end") {
    // class a: tokens {x:2, y:1}, Nc=3; class b: {z:2}, Nc=2; V=3, D=2
    val d = docs((1L, "a", "x x y"), (2L, "b", "z z"))
    val model = NaiveBayes.trainModel(d, col("lang"), col("text"))
    val scored = NaiveBayes.scoreWith(model, d, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    def nanos(v: Double): Long = math.round(v * 1e9)
    // doc1 in a: prior ln(1/2) + 3·(−ln 6) + 2·ln 3 + ln 2 (each term rounded to nanos)
    val d1a = (nanos(math.log(1)) - nanos(math.log(2))) +
      3L * -nanos(math.log(6)) + 2L * nanos(math.log(3)) + nanos(math.log(2))
    assert(scored(1L) == (("a", d1a)))
    assert(scored(2L)._1 == "b")
  }

  test("confusion on separable data is diagonal; resubstitution accuracy 100%") {
    val d = docs(
      (1L, "en", "the cat sat"), (2L, "en", "the dog ran"), (3L, "en", "the bird"),
      (4L, "de", "der hund lief"), (5L, "de", "der vogel"), (6L, "de", "der igel"))
    val conf = NaiveBayes.confusion(d, "doc_id", col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == Map(("en", "en") -> 3L, ("de", "de") -> 3L))
  }

  test("OOV-only documents fall back to prior + default likelihood, deterministically") {
    val train = docs((1L, "a", "x x x x"), (2L, "b", "z"), (3L, "b", "z"))
    val model = NaiveBayes.trainModel(train, col("lang"), col("text"))
    val test = docs((10L, "?", "unseen tokens only here"))
    val r = NaiveBayes.scoreWith(model, test, "doc_id", col("text")).head()
    // b has the larger prior (2 of 3 docs) AND smaller Nc -> larger default ll
    assert(r.getString(1) == "b")
  }

  test("scoring is partitioning-invariant (exact integer scores)") {
    val d = docs((1L to 40L).map(i =>
      (i, if (i % 2 == 0) "ev" else "od", s"tok${i % 7} tok${i % 5} common")): _*)
    val model = NaiveBayes.trainModel(d, col("lang"), col("text"))
    def run(frame: org.apache.spark.sql.DataFrame) =
      NaiveBayes.scoreWith(model, frame, "doc_id", col("text"))
        .orderBy(col("doc_id")).collect().toSeq
    assert(run(d) == run(d.repartition(7)))
  }
}
