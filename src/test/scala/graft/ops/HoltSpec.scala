package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class HoltSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def series(xs: Seq[Double], g: Int = 1) =
    createDf(spark, "g int, t int, x double",
      xs.zipWithIndex.map { case (x, i) => Seq[Any](g, i + 1, x) })

  private def run(xs: Seq[Double]) =
    Timeseries.holtLinear(series(xs), Seq("g"), col("t"), col("x"),
        alpha = 0.25, beta = 0.125)
      .orderBy(col("idx")).collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("hand-checked recursion: alpha=1/4, beta=1/8") {
    val got = run(Seq(100.0, 104.0, 108.0))
    assert(got(0) == ((1, 100.0, 100.0, 0.0, 100.0)))
    // l2 = .25*104 + .75*100 = 101; b2 = .125*1 = 0.125
    assert(got(1) == ((2, 104.0, 101.0, 0.125, 101.125)))
    // l3 = .25*108 + .75*101.125 = 102.84375
    // b3 = .125*(l3-101) + .875*0.125 = 0.33984375
    assert(got(2)._3 == 102.84375)
    assert(got(2)._4 == 0.33984375)   // exact nano state, no 6-dp round
    assert(got(2)._5 == 103.18359375) // level+trend at nano precision
  }

  test("constant series keeps level = x and zero trend; 1-point series emits its init row") {
    val const = run(Seq(7.0, 7.0, 7.0, 7.0))
    assert(const.forall { case (_, x, l, b, f) => x == 7.0 && l == 7.0 && b == 0.0 && f == 7.0 })
    val one = run(Seq(42.0))
    assert(one.toSeq == Seq((1, 42.0, 42.0, 0.0, 42.0)))
  }

  test("linear trend: the trend state converges toward the true slope") {
    val got = run((1 to 40).map(_ * 3.0))
    val lastTrend = got.last._4
    assert(lastTrend > 2.5 && lastTrend < 3.5, s"trend should approach 3, got $lastTrend")
    // forecast tracks the next point within the smoothing lag
    assert(math.abs(got.last._5 - 123.0) < 6.0)
  }

  test("partitioning-invariant (integer state re-rounded each step)") {
    val df = createDf(spark, "g int, t int, x double",
      (1 to 50).map(i => Seq[Any](i % 3, i, (i % 11) * 2.5)))
    def fold(d: org.apache.spark.sql.DataFrame) =
      Timeseries.holtLinear(d, Seq("g"), col("t"), col("x"), 0.25, 0.125)
        .orderBy(col("g"), col("idx")).collect().toSeq
    assert(fold(df) == fold(df.repartition(7)))
  }

  test("maxLength makes the bounded-series contract loud; non-binary alpha rejected") {
    intercept[Exception] {
      Timeseries.holtLinear(series((1 to 20).map(_.toDouble)), Seq("g"),
        col("t"), col("x"), 0.25, 0.125, maxLength = 10).collect()
    }
    intercept[IllegalArgumentException] {
      Timeseries.holtLinear(series(Seq(1.0)), Seq("g"), col("t"), col("x"),
        alpha = 0.3, beta = 0.125)
    }
  }
}
