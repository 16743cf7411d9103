package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    createDf(spark, "doc_id bigint, text string",
      rows.map { case (i, t) => Seq[Any](i, t) })

  test("ngramFeatures: unigrams + adjacent bigrams, 2n-1 features, order preserved") {
    val d = docs(1L -> "a b c", 2L -> "solo")
    val out = d.select(col("doc_id"), Classify.ngramFeatures(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a", "b", "c", "a_b", "b_c"))
    assert(out(2L) == Seq("solo"))
  }

  test("featureBucket lands in [0, dim) and is deterministic across partitionings") {
    val d = docs((1L to 50L).map(i => i -> s"tok$i"): _*)
    def byDoc(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Classify.featureBucket(col("text"), 16, "clf").as("b"))
      .orderBy(col("doc_id")).collect().map(_.getLong(1)).toSeq
    val vals = byDoc(d)
    assert(vals.forall(v => v >= 0 && v < 16))
    assert(vals == byDoc(d.repartition(7)))
  }

  test("linearLogit: hand-checked single-bucket model; empty features score bias") {
    // dim=1: every feature hits bucket 0, so z = w0 + bias exactly
    val d = docs(1L -> "x y z")
    val z = d.select(Classify.linearLogit(col("text"), Seq(250000L), 100000L).as("z"))
      .head().getDouble(0)
    assert(math.abs(z - 0.35) < 1e-12)
  }

  test("score is sigmoid(logit), in (0,1), and keep-threshold consistent") {
    val w = Classify.demoWeightsMicros(64)
    val d = docs(1L -> "the quick brown fox", 2L -> "lorem ipsum dolor sit amet")
    val rows = d.select(
      Classify.linearLogit(col("text"), w, -50000L).as("z"),
      Classify.score(col("text"), w, -50000L).as("s")).collect()
    rows.foreach { r =>
      val (z, sc) = (r.getDouble(0), r.getDouble(1))
      assert(sc > 0.0 && sc < 1.0)
      val expect = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sc - expect) <= 1e-6)
    }
  }

  test("law: monotone weight scaling preserves document ranking") {
    val w = Classify.demoWeightsMicros(32)
    val w2 = w.map(_ * 3L)
    val d = docs((1L to 20L).map(i =>
      i -> s"doc $i has words w${i % 5} w${i % 7} w${i % 3} filler text"): _*)
    def ranking(ws: Seq[Long], bias: Long) = d
      .select(col("doc_id"), Classify.score(col("text"), ws, bias).as("s"))
      .orderBy(col("s").desc, col("doc_id")).collect().map(_.getLong(0)).toSeq
    // scaling weights AND bias by the same positive factor preserves order
    assert(ranking(w, -50000L) == ranking(w2, -150000L))
  }

  test("demoWeightsMicros is the documented closed form") {
    val w = Classify.demoWeightsMicros(64)
    assert(w.size == 64)
    assert(w.zipWithIndex.forall { case (v, j) =>
      v == (((j * 37 + 11) % 101) - 50).toLong * 10000L })
  }
}
