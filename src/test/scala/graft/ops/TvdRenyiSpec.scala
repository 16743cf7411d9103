package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf
import graft.text.TextStats

/** Hand-checked values for total variation distance and Rényi-2
  * diversity.
  */
class TvdRenyiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def toks(vs: String*) =
    createDf(spark, "v string", vs.map(v => Seq[Any](v)))

  test("totalVariation: identical distributions 0, disjoint 1, half-shift 0.5") {
    val a = toks("x", "x", "y", "y")
    assert(Drift.totalVariation(a, toks("x", "y"), "v")
      .collect().head.getDouble(3) == 0.0)
    assert(Drift.totalVariation(a, toks("z", "w"), "v")
      .collect().head.getDouble(3) == 1.0)
    // a: {x:1/2, y:1/2}; b: {x:1}: ½(|1/2−1| + |1/2−0|) = 1/2
    val r = Drift.totalVariation(a, toks("x", "x"), "v").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.5)
  }

  test("renyiDiversity: uniform tokens hit eff_vocab = V; a dominant token craters it") {
    val uni = createDf(spark, "g string, t string",
      Seq("a", "b", "c", "d").map(t => Seq[Any]("g", t)))
    val ru = TextStats.renyiDiversity(uni, Seq("g"), col("t")).collect().head
    assert(ru.getLong(1) == 4L && ru.getLong(2) == 4L)
    assert(ru.getDouble(4) == 4.0) // 16/4
    // 7 of one token + 1 other: N²/Σc² = 64/50 = 1.28
    val skew = createDf(spark, "g string, t string",
      (Seq.fill(7)("a") :+ "b").map(t => Seq[Any]("g", t)))
    val rs = TextStats.renyiDiversity(skew, Seq("g"), col("t")).collect().head
    assert(rs.getLong(2) == 2L)
    assert(rs.getDouble(4) == 1.28)
    assert(rs.getDouble(3) < ru.getDouble(3)) // Rényi-2 entropy drops with skew
  }
}
