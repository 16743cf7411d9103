package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class SeasonalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def factors(rows: Seq[(String, Int, Double)]) = {
    val df = createDf(spark, "series string, b int, v double",
      rows.map { case (s, b, v) => Seq[Any](s, b, v) })
    Timeseries.seasonalFactors(df, Seq("series"), col("b"), col("v"))
  }

  test("uniform values give factor 1.0 in every bucket") {
    val out = factors(for (b <- 0 to 3; _ <- 1 to 2) yield ("s", b, 5.0))
    assert(out.count() == 4)
    assert(out.collect().forall(r =>
      r.getAs[Double]("factor") == 1.0 && r.getAs[Double]("bucket_mean") == 5.0))
  }

  test("a hot bucket's factor is its mean over the series mean") {
    // series mean = (10+10+40)/3 = 20; bucket 1 mean 40 -> factor 2.0
    val out = factors(Seq(("s", 0, 10.0), ("s", 0, 10.0), ("s", 1, 40.0)))
      .orderBy("bucket").collect()
    assert(out(0).getAs[Double]("factor") == 0.5)
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(1).getAs[Double]("factor") == 2.0)
  }

  test("series are independent (no cross-series leakage into the mean)") {
    val out = factors(Seq(("a", 0, 1.0), ("a", 1, 3.0), ("b", 0, 100.0), ("b", 1, 300.0)))
      .orderBy("series", "bucket").collect()
    // both series have the same shape, so identical factors despite 100x levels
    assert(out(0).getAs[Double]("factor") == out(2).getAs[Double]("factor"))
    assert(out(1).getAs[Double]("factor") == out(3).getAs[Double]("factor"))
    assert(out(0).getAs[Double]("factor") == 0.5)
  }

  test("result is invariant to partitioning (integer bucket sums)") {
    val rows = (0 until 300).map(i => ("s", i % 7, 1.0 + (i % 13) * 0.17))
    val df = createDf(spark, "series string, b int, v double",
      rows.map { case (s, b, v) => Seq[Any](s, b, v) })
    val one = Timeseries.seasonalFactors(df.coalesce(1), Seq("series"), col("b"), col("v"))
      .orderBy("b").collect().toSeq
    val many = Timeseries.seasonalFactors(df.repartition(13), Seq("series"), col("b"), col("v"))
      .orderBy("b").collect().toSeq
    assert(one == many)
  }
}
