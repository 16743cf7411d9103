package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Behavioral checks for the periodogram and seasonal strength: known
  * cycles must light up the right frequency / bucket.
  */
class SpectralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def series(xs: Seq[Double]) =
    createDf(spark, "g string, t int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v) })

  test("periodogram: a pure period-8 cosine over 32 points peaks at freq 4") {
    val xs = (0 until 32).map(t => 50.0 + 10.0 * math.cos(2 * math.Pi * t / 8.0))
    val out = Timeseries.periodogram(series(xs), Seq("g"), col("t"), col("v"),
        maxFreq = 16)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val peak = out.maxBy(_._2)._1
    assert(peak == 4L) // n/period = 32/8
    // the peak carries essentially all the power
    assert(out(4L) > 10.0 * out.filterKeys(_ != 4L).values.max)
  }

  test("periodogram: under-resolved series nulls power; period_len is n/f") {
    val out = Timeseries.periodogram(series((1 to 10).map(_.toDouble)),
      Seq("g"), col("t"), col("v"), maxFreq = 16).collect()
    assert(out.forall(_.isNullAt(4))) // n = 10 < 2·16
    assert(out.find(_.getLong(1) == 5L).get.getDouble(3) == 2.0)
  }

  test("seasonalStrength: a weekly sawtooth is strongly seasonal") {
    // x = t mod 7 has cov(t, x) = Var(x) > 0, so OLS detrending tilts
    // the pattern slightly — the bucket means absorb the rest
    val xs = (0 until 28).map(t => 100.0 + 10.0 * (t % 7))
    val df = createDf(spark, "g string, t int, v double, b int",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v, i % 7) })
    val r = Timeseries.seasonalStrength(df, Seq("g"), col("t"), col("v"),
      bucket = col("b")).collect().head
    assert(r.getLong(1) == 28L && r.getLong(2) == 7L)
    assert(r.getDouble(5) == 0.938697) // replica-pinned
  }

  test("seasonalStrength: a pure trend has zero detrended variance — null") {
    val df = createDf(spark, "g string, t int, v double, b int",
      (0 until 28).map(t => Seq[Any]("g", 100 + t, 5.0 * t, t % 7)))
    val r = Timeseries.seasonalStrength(df, Seq("g"), col("t"), col("v"),
      bucket = col("b")).collect().head
    assert(r.isNullAt(3) && r.isNullAt(5)) // nothing left to explain
  }
}
