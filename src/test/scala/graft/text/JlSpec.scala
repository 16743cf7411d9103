package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class JlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("randomProjection replays the sign-fold closed form; wrong-length vectors null out") {
    val df = createDf(spark, "id int, v array<double>", Seq(
      Seq[Any](1, Seq(1.0, 2.0, 3.0)),
      Seq[Any](2, Seq(0.5, -0.5)))) // wrong length
    val got = Similarity.randomProjection(col("v"), outDim = 2, inDim = 3)
    val rows = df.select(col("id"), got.as("p")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    val signs = Similarity.jlSigns(2, 3, "jl")
    val x = Seq(1.0, 2.0, 3.0).map(v => math.round(v * 1e6))
    val expect = (0 until 2).map { j =>
      val s = x.zip(signs(j)).map { case (xi, si) => xi * si }.sum
      s.toDouble / math.sqrt(2.0) / 1e6 // exact quotient, no 6-dp round
    }
    assert(rows(1) == expect)
    assert(rows(2) == null)
  }

  test("signs are +-1 and deterministic across calls") {
    val a = Similarity.jlSigns(4, 8, "jl")
    val b = Similarity.jlSigns(4, 8, "jl")
    assert(a == b)
    assert(a.flatten.forall(s => s == 1L || s == -1L))
    // seed changes the matrix
    assert(Similarity.jlSigns(4, 8, "other") != a)
  }

  test("JL property: squared norms are preserved on average (k=16 from d=32)") {
    val vecs = (1 to 200).map { i =>
      Seq[Any](i, (0 until 32).map(d => ((i * 31 + d * 7) % 13 - 6) / 3.0))
    }
    val df = createDf(spark, "id int, v array<double>", vecs)
    val projected = df.select(col("v"),
      Similarity.randomProjection(col("v"), 16, 32).as("p"))
    val ratios = projected.select(
        (aggregate(col("p"), lit(0.0), (a, x) => a + x * x) /
          aggregate(col("v"), lit(0.0), (a, x) => a + x * x)).as("r"))
      .collect().map(_.getDouble(0))
    val meanRatio = ratios.sum / ratios.length
    assert(meanRatio > 0.75 && meanRatio < 1.25, s"mean norm ratio $meanRatio")
  }

  test("linearity: projecting 2x doubles the projection (up to 6-dp rounding)") {
    val df = createDf(spark, "v array<double>",
      Seq(Seq[Any](Seq(0.25, -1.5, 2.0, 0.125))))
    val r = df.select(
      Similarity.randomProjection(col("v"), 4, 4).as("p1"),
      Similarity.randomProjection(transform(col("v"), _ * 2.0), 4, 4).as("p2"))
      .head()
    val p1 = r.getSeq[Double](0); val p2 = r.getSeq[Double](1)
    p1.zip(p2).foreach { case (a, b) => assert(math.abs(b - 2 * a) < 2e-6) }
  }
}
