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

  private def hwReplica(xs: Seq[Double], a: Double, b0: Double, g: Double,
                        m: Int): Seq[(Int, Long, Long, Long, Long)] = {
    def rnd(v: Double): Long =
      java.math.BigDecimal.valueOf(v).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    var l = 0.0; var bb = 0.0
    val seas = Array.fill(m)(0.0)
    xs.zipWithIndex.map { case (xv, n) =>
      val x = rnd(xv * 1e9).toDouble
      val slot = n % m
      val sOld = seas(slot)
      val lN = if (n == 0) x else rnd(a * (x - sOld) + (1.0 - a) * (l + bb)).toDouble
      val bN = if (n == 0) 0.0 else rnd(b0 * (lN - l) + (1.0 - b0) * bb).toDouble
      val sN = rnd(g * (x - lN) + (1.0 - g) * sOld).toDouble
      seas(slot) = sN
      l = lN; bb = bN
      val fc = lN + bN + seas((n + 1) % m)
      (n + 1, lN.toLong, bN.toLong, sN.toLong, fc.toLong)
    }
  }

  test("holtWinters replays the scala recursion exactly (integer state each step)") {
    val xs = Seq(10.0, 20.0, 10.0, 20.0, 11.0, 21.0, 9.5, 19.5)
    val got = Timeseries.holtWinters(series(xs), Seq("g"), col("t"), col("x"),
        alpha = 0.25, beta = 0.125, gamma = 0.25, period = 2)
      .orderBy(col("idx")).collect()
      .map(r => (r.getInt(1), math.round(r.getDouble(3) * 1e9),
        math.round(r.getDouble(4) * 1e9), math.round(r.getDouble(5) * 1e9),
        math.round(r.getDouble(6) * 1e9)))
    val expect = hwReplica(xs, 0.25, 0.125, 0.25, 2)
    assert(got.toSeq == expect)
  }

  test("holtWinters: the seasonal state learns a pure period-2 pattern (forecast error shrinks)") {
    val xs = (1 to 40).map(i => if (i % 2 == 0) 20.0 else 10.0)
    val got = Timeseries.holtWinters(series(xs), Seq("g"), col("t"), col("x"),
        0.25, 0.125, 0.25, period = 2)
      .orderBy(col("idx")).collect()
    // forecast at idx i predicts x at idx i+1
    val lateErr = (30 until 39).map(i =>
      math.abs(got(i).getDouble(6) - got(i + 1).getDouble(2))).max
    val earlyErr = math.abs(got(1).getDouble(6) - got(2).getDouble(2))
    assert(lateErr < 1.5, s"late forecast error $lateErr")
    assert(lateErr < earlyErr, "learning must reduce the forecast error")
  }

  test("holtWinters: constant series keeps level = x, zero trend and seasonals") {
    val got = Timeseries.holtWinters(series(Seq.fill(10)(5.0)), Seq("g"),
        col("t"), col("x"), 0.25, 0.125, 0.25, period = 3)
      .collect()
    assert(got.forall(r => r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0 && r.getDouble(6) == 5.0))
  }

  test("holtWinters is partitioning-invariant") {
    val df = createDf(spark, "g int, t int, x double",
      (1 to 60).map(i => Seq[Any](i % 2, i, ((i % 7) + i / 10).toDouble)))
    def run(d: org.apache.spark.sql.DataFrame) =
      Timeseries.holtWinters(d, Seq("g"), col("t"), col("x"), 0.25, 0.125, 0.25, 7)
        .orderBy(col("g"), col("idx")).collect().toSeq
    assert(run(df) == run(df.repartition(5)))
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
