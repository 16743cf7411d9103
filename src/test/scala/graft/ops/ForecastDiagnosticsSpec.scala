package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Replica-checked values for PACF (Durbin-Levinson), the theta
  * forecast, and the Poisson rate-ratio test.
  */
class ForecastDiagnosticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val noise = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0)

  private def series(xs: Seq[Double]) =
    createDf(spark, "g string, t int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v) })

  test("pacf: 12-point series matches the Durbin-Levinson replica at all 3 lags") {
    val out = Timeseries.pacf(series(noise), Seq("g"), col("t"), col("v"))
      .orderBy("lag").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(out(0).getDouble(3) == -0.077044)
    assert(out(1).getDouble(3) == -0.094547)
    assert(out(2).getDouble(3) == 0.26277)
  }

  test("pacf: lag 1 equals the plain ACF; constant series nulls all lags") {
    val acf = Timeseries.autocorrelation(series(noise), Seq("g"), col("t"),
      col("v"), maxLag = 1).collect().head.getDouble(3)
    assert(acf == -0.077044) // φ₁₁ = ρ₁ by construction
    val const = Timeseries.pacf(series(Seq.fill(8)(2.0)), Seq("g"), col("t"),
      col("v")).collect()
    assert(const.forall(_.isNullAt(3)))
  }

  test("thetaForecast: 12-point series matches the replica at h = 1, 2, 3") {
    val out = Timeseries.thetaForecast(series(noise), Seq("g"), col("t"),
        col("v"), trailing = 32, horizons = Seq(1, 2, 3))
      .orderBy("h").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getDouble(3) == 6.602218)
    assert(out(1).getDouble(3) == 6.777044)
    assert(out(2).getDouble(3) == 6.951869)
  }

  test("thetaForecast: a pure trend forecasts the trend line exactly") {
    // x = t: trend fits perfectly, theta(2)-line = trend, SES of it ends
    // at the last value's neighborhood; combination continues the line
    val xs = (1 to 10).map(_.toDouble)
    val out = Timeseries.thetaForecast(series(xs), Seq("g"), col("t"),
        col("v"), trailing = 32, horizons = Seq(1))
      .collect().head
    // trend says 11; SES of the theta2 line (= x itself) lags slightly below 10
    assert(out.getDouble(3) > 10.0 && out.getDouble(3) < 11.0)
  }

  test("poissonRateRatio: 8-of-4 vs 3-of-3 gives RR 2 and the integer-log z") {
    // arm A: users 1,2 (+3,4 inactive) with 8 purchases over 4 users;
    // arm B: 3 purchases over 3 users
    val rows =
      (1 to 8).map(i => Seq[Any](2L * (i % 4), "purchase")) ++
        (1 to 3).map(i => Seq[Any](2L * i + 1L, "purchase")) ++
        Seq(Seq[Any](6L, "click"), Seq[Any](3L, "click")) // non-purchase activity
    val df = createDf(spark, "user_id bigint, event_type string", rows)
    val r = Stats.poissonRateRatio(df,
      pmod(col("user_id"), lit(2)) === 0, pmod(col("user_id"), lit(2)) === 1,
      col("event_type") === "purchase", col("user_id")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((8L, 4L, 3L, 3L)))
    assert(r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 1.023846)
  }
}
