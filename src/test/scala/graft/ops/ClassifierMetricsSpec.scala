package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for the thresholded confusion readout, log
  * loss, and the Wilcoxon signed-rank test.
  */
class ClassifierMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("confusionStats: 5-row hand table gives exact cells and MCC 1/6") {
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](true, 0.9), Seq[Any](true, 0.4), Seq[Any](false, 0.6),
        Seq[Any](false, 0.2), Seq[Any](true, 0.5)))
    val r = Calibration.confusionStats(df, col("y"), col("s")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 1L, 1L))) // tp fp fn tn; 0.5 lands on the >= side
    assert(r.getDouble(5) == 0.6)      // accuracy
    assert(r.getDouble(6) == 0.666667) // precision
    assert(r.getDouble(7) == 0.666667) // recall
    assert(r.getDouble(8) == 0.666667) // f1
    assert(r.getDouble(9) == 0.166667) // (2·1 − 1·1)/√(3·3·2·2)
  }

  test("confusionStats: degenerate single-class input nulls the unfed ratios") {
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](false, 0.1), Seq[Any](false, 0.2)))
    val r = Calibration.confusionStats(df, col("y"), col("s")).collect().head
    assert(r.getLong(4) == 2L)                    // all tn
    assert(r.getDouble(5) == 1.0)                 // accuracy
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(9)) // precision/recall/mcc
  }

  test("logLoss: symmetric 0.8-confidence pair matches −ln 0.8; clamp bounds ±∞") {
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](true, 0.8), Seq[Any](false, 0.2)))
    val r = Calibration.logLoss(df, col("y"), col("s")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.223144)
    // a hard-wrong 0.0 on a positive clamps to 1e-6, not −∞
    val bad = createDf(spark, "y boolean, s double", Seq(Seq[Any](true, 0.0)))
    val rb = Calibration.logLoss(bad, col("y"), col("s")).collect().head
    assert(rb.getDouble(2) == 13.815511) // −ln(1e-6), nano-quantized
  }

  test("wilcoxonSignedRank: textbook 7-diff set (one zero, one tie pair)") {
    val diffs = Seq(1.5, -2.0, 3.0, -1.5, 2.5, 0.0, 4.0)
    val df = createDf(spark, "g string, d double",
      diffs.map(v => Seq[Any]("g", v)))
    val r = Stats.wilcoxonSignedRank(df, Seq("g"), col("d")).collect().head
    assert(r.getLong(1) == 6L)      // zero diff dropped
    assert(r.getLong(2) == 33L)     // 2·W⁺ = 2·(1.5 + 4 + 5 + 6)
    assert(r.getLong(3) == 6L)      // one tie pair: 2³ − 2
    assert(r.getDouble(4) == 1.261412)
  }

  test("wilcoxonSignedRank: partitioning-invariant and null z for n < 2") {
    val diffs = Seq(1.5, -2.0, 3.0, -1.5, 2.5, 0.0, 4.0)
    val df = createDf(spark, "g string, d double",
      diffs.map(v => Seq[Any]("g", v))).repartition(5)
    val r = Stats.wilcoxonSignedRank(df, Seq("g"), col("d")).collect().head
    assert(r.getLong(2) == 33L && r.getDouble(4) == 1.261412)
    val one = createDf(spark, "g string, d double", Seq(Seq[Any]("g", 2.0)))
    assert(Stats.wilcoxonSignedRank(one, Seq("g"), col("d"))
      .collect().head.isNullAt(4))
  }
}
