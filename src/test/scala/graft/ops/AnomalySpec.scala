package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def series(vals: Seq[(String, Int, Double)]) =
    createDf(spark, "s string, t int, v double",
      vals.map { case (s, t, v) => Seq[Any](s, t, v) })

  test("constant series never flags (zero variance -> null z)") {
    val df = series((1 to 10).map(i => ("a", i, 5.0)))
    val got = Timeseries.flagAnomalies(df, Seq("s"), Seq("t"), col("v"), n = 5, z = 2.0)
    assert(got.filter(col("is_anomaly")).count() == 0)
    assert(got.filter(col("zscore").isNotNull).count() == 0)
  }

  test("a spike against a stable baseline flags, and only the spike") {
    val df = series((1 to 9).map(i => ("a", i, 10.0 + (i % 2))) :+ (("a", 10, 100.0)))
    val got = Timeseries.flagAnomalies(df, Seq("s"), Seq("t"), col("v"), n = 10, z = 2.0)
    val flagged = got.filter(col("is_anomaly")).select("t").collect().map(_.getInt(0))
    assert(flagged.toSeq == Seq(10))
  }

  test("rows below minPeriods never flag") {
    val df = series(Seq(("a", 1, 0.0), ("a", 2, 1000.0), ("a", 3, 0.0)))
    val got = Timeseries.flagAnomalies(df, Seq("s"), Seq("t"), col("v"),
      n = 5, z = 1.0, minPeriods = 4)
    assert(got.filter(col("is_anomaly")).count() == 0)
  }

  test("series are isolated: a spike in one never flags the other") {
    val a = (1 to 9).map(i => ("a", i, 1.0 + (i % 3))) :+ (("a", 10, 50.0))
    val b = (1 to 10).map(i => ("b", i, 1.0 + (i % 3)))
    val got = Timeseries.flagAnomalies(series(a ++ b), Seq("s"), Seq("t"),
      col("v"), n = 10, z = 2.0)
    assert(got.filter(col("is_anomaly")).select("s").collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("z matches the closed-form population z of the trailing window") {
    // window = [1, 2, 3, 4, 10]: mean 4, var (9+4+1+0+36)/5 = 10, std sqrt(10)
    val df = series(Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("a", 4, 4.0), ("a", 5, 10.0)))
    val got = Timeseries.flagAnomalies(df, Seq("s"), Seq("t"), col("v"), n = 5, z = 1.5)
      .filter(col("t") === 5).select("zscore").head().getDouble(0)
    assert(math.abs(got - (10.0 - 4.0) / math.sqrt(10.0)) < 1e-12)
  }

  test("null values pass through unflagged and are excluded from the baseline") {
    val df = createDf(spark, "s string, t int, v double",
      Seq(Seq[Any]("a", 1, 1.0), Seq[Any]("a", 2, null), Seq[Any]("a", 3, 2.0),
        Seq[Any]("a", 4, 1.5), Seq[Any]("a", 5, 1.0)))
    val got = Timeseries.flagAnomalies(df, Seq("s"), Seq("t"), col("v"), n = 5, z = 3.0)
    assert(got.filter(col("t") === 2 && col("is_anomaly")).count() == 0)
    // count at t=5 is 4 non-null observations
    assert(got.count() == 5)
  }
}
