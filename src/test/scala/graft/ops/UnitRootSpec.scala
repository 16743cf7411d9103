package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Replica-checked values for the unit-root family: KPSS level
  * stationarity, the closed-form Dickey-Fuller regression, and the
  * Lo-MacKinlay variance ratio. Expected numbers come from an exact
  * integer-arithmetic replica of each published formula (micro
  * quantization included), evaluated independently of Spark.
  */
class UnitRootSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def series(xs: Seq[Double]) =
    createDf(spark, "g string, t int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v) })

  private val trend = (1 to 20).map(_.toDouble)
  private val alt = Seq.fill(10)(Seq(0.0, 10.0)).flatten
  private val noise = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0)

  test("kpss: trending series scores far above an alternating stationary one") {
    val kTrend = Timeseries.kpssTest(series(trend), Seq("g"), col("t"),
      col("v"), maxLag = 2).collect().head
    assert(kTrend.getLong(1) == 20L)
    assert(kTrend.getDouble(2) == 86.483333) // lrv of the trend
    assert(kTrend.getDouble(3) == 0.770857)
    val kAlt = Timeseries.kpssTest(series(alt), Seq("g"), col("t"),
      col("v"), maxLag = 2).collect().head
    assert(kAlt.getDouble(3) == 0.075)
  }

  test("kpss: null statistic when the series is too short or constant") {
    val short = Timeseries.kpssTest(series(Seq(1.0, 2.0, 3.0)), Seq("g"),
      col("t"), col("v"), maxLag = 2).collect().head
    assert(short.isNullAt(3)) // n = 3 <= maxLag + 1
    val const = Timeseries.kpssTest(series(Seq.fill(10)(4.0)), Seq("g"),
      col("t"), col("v"), maxLag = 2).collect().head
    assert(const.isNullAt(3)) // zero long-run variance
  }

  test("dickey-fuller: exact-fit series give the closed-form slope with null t") {
    // pure trend: Δx constant, zero covariance with the level — β = 0
    val dfTrend = Timeseries.dickeyFullerTest(series(trend), Seq("g"),
      col("t"), col("v")).collect().head
    assert(dfTrend.getLong(1) == 19L)
    assert(dfTrend.getDouble(2) == 0.0 && dfTrend.isNullAt(3))
    // perfect alternation: Δx = 10 − 2x exactly — β = −2, SSE = 0
    val dfAlt = Timeseries.dickeyFullerTest(series(alt), Seq("g"),
      col("t"), col("v")).collect().head
    assert(dfAlt.getDouble(2) == -2.0 && dfAlt.isNullAt(3))
  }

  test("dickey-fuller: noisy mean-reverting series matches the replica") {
    val out = Timeseries.dickeyFullerTest(series(noise), Seq("g"),
      col("t"), col("v")).collect().head
    assert(out.getLong(1) == 11L)
    assert(out.getDouble(2) == -1.089286)
    assert(out.getDouble(3) == -2.959427)
  }

  test("variance ratio: alternation collapses VR(2); a constant-step trend is null") {
    val vAlt = Timeseries.varianceRatio(series(alt), Seq("g"), col("t"),
      col("v"), q = 2).collect().head
    assert(vAlt.getLong(1) == 19L)
    assert(vAlt.getDouble(2) == 0.005556) // 2-step moves cancel; only qμ² survives
    assert(vAlt.getDouble(3) == -4.334683)
    val vTrend = Timeseries.varianceRatio(series(trend), Seq("g"), col("t"),
      col("v"), q = 2).collect().head
    assert(vTrend.isNullAt(2)) // one-step returns constant: var1 = 0
  }

  test("variance ratio: noisy series matches the replica and is partitioning-invariant") {
    val df = series(noise)
    val out = Timeseries.varianceRatio(df, Seq("g"), col("t"), col("v"), q = 2)
      .collect().head
    assert(out.getDouble(2) == 0.485391)
    assert(out.getDouble(3) == -1.706764)
    val rep = Timeseries.varianceRatio(df.repartition(7), Seq("g"), col("t"),
      col("v"), q = 2).collect().head
    assert(rep.getDouble(2) == 0.485391 && rep.getDouble(3) == -1.706764)
  }
}
