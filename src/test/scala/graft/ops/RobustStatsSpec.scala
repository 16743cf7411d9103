package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Replica-checked values for Welch's ANOVA, the negative-binomial
  * moment fit, and the stratified ATE.
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("welchAnova: 3 unequal-variance groups match the replica") {
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0).map(v => Seq[Any]("a", v)) ++
        Seq(10.0, 12.0, 14.0).map(v => Seq[Any]("b", v)) ++
        Seq(5.0, 5.5, 6.0, 6.5, 7.0).map(v => Seq[Any]("c", v))
    val df = createDf(spark, "g string, v double", rows)
    val r = Stats.welchAnova(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 12L)
    assert(r.getDouble(2) == 23.619381)
    assert(r.getDouble(3) == 4.038996)
  }

  test("welchAnova: a constant group nulls the statistic (infinite weight)") {
    val rows = Seq(Seq[Any]("a", 1.0), Seq[Any]("a", 2.0),
      Seq[Any]("b", 5.0), Seq[Any]("b", 5.0))
    val r = Stats.welchAnova(createDf(spark, "g string, v double", rows),
      col("g"), col("v")).collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("negBinomialFit: bursty counts {1,2,3,10} give r ≈ 1.263") {
    val df = createDf(spark, "g string, c int",
      Seq(1, 2, 3, 10).map(c => Seq[Any]("g", c)))
    val r = Stats.negBinomialFit(df, Seq("g"), col("c")).collect().head
    assert(r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == 16.666667)
    assert(r.getDouble(4) == 1.263158)
    assert(r.getDouble(5) == 0.24)
  }

  test("negBinomialFit: underdispersed counts null the fit") {
    val df = createDf(spark, "g string, c int",
      Seq(3, 3, 4, 4).map(c => Seq[Any]("g", c)))
    val r = Stats.negBinomialFit(df, Seq("g"), col("c")).collect().head
    assert(!r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("stratifiedAte: two strata match the replica; one-armed strata drop") {
    val rows = Seq(
      // stratum A: treat 10,12 / ctrl 8,9 — diff 2.5
      Seq[Any]("A", true, 10.0), Seq[Any]("A", true, 12.0),
      Seq[Any]("A", false, 8.0), Seq[Any]("A", false, 9.0),
      // stratum B: treat 20,22 / ctrl 15,17 — diff 5
      Seq[Any]("B", true, 20.0), Seq[Any]("B", true, 22.0),
      Seq[Any]("B", false, 15.0), Seq[Any]("B", false, 17.0),
      // stratum C: control only — must drop
      Seq[Any]("C", false, 99.0), Seq[Any]("C", false, 98.0))
    val df = createDf(spark, "s string, t boolean, v double", rows)
    val r = Stats.stratifiedAte(df, col("s"), col("t"), col("v"))
      .collect().head
    assert(r.getLong(0) == 2L)                    // stratum C dropped
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 3.75)                // (2.5 + 5)/2, equal weights
    assert(r.getDouble(4) == 0.901388)
    assert(r.getDouble(5) == 4.160251)
  }
}
