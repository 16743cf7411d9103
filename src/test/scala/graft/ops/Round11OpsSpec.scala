package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for the round-11 operators: 1-Wasserstein,
  * energy distance, group fairness, vocabulary coverage, and the
  * exact classifier decision.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("wasserstein1: {0,2} vs {1,3} is a unit shift; identical samples are 0") {
    val rows = Seq[(String, String, Double)](
      ("g", "a", 0.0), ("g", "a", 2.0), ("g", "b", 1.0), ("g", "b", 3.0),
      ("h", "a", 5.0), ("h", "a", 7.0), ("h", "b", 5.0), ("h", "b", 7.0))
    val df = createDf(spark, "g string, side string, v double",
      rows.map { case (g, s, v) => Seq[Any](g, s, v) })
    val out = Drift.wasserstein1Grouped(df, Seq("g"),
        col("side") === "a", col("side") === "b", col("v"))
      .orderBy("g").collect()
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 1.0) // mass moves exactly 1 unit
    assert(out(1).getDouble(3) == 0.0) // identical distributions
  }

  test("wasserstein1 is symmetric in the two samples") {
    val rows = Seq[(String, Double)](("a", 0.0), ("a", 0.5), ("a", 9.25),
      ("b", 1.0), ("b", 1.0), ("b", 4.75))
    val df = createDf(spark, "g string, side string, v double",
      rows.map { case (s, v) => Seq[Any]("g", s, v) })
    def w1(x: String, y: String): Double =
      Drift.wasserstein1Grouped(df, Seq("g"),
        col("side") === x, col("side") === y, col("v"))
        .collect().head.getDouble(3)
    assert(w1("a", "b") == w1("b", "a"))
    assert(w1("a", "b") > 0.0)
  }

  test("energy distance: point masses at 0 and 1 give E=2; identical samples give 0") {
    val rows = Seq[(String, String, Double)](
      ("g", "a", 0.0), ("g", "b", 1.0),
      ("h", "a", 0.0), ("h", "a", 1.0), ("h", "b", 0.0), ("h", "b", 1.0))
    val df = createDf(spark, "g string, side string, v double",
      rows.map { case (g, s, v) => Seq[Any](g, s, v) })
    val out = Drift.energyDistanceGrouped(df, Seq("g"),
        col("side") === "a", col("side") === "b", col("v"))
      .orderBy("g").collect()
    // g: E|X-Y|=1, within means 0 -> E = 2
    assert(out(0).getDouble(3) == 1.0)   // mean_cross
    assert(out(0).getDouble(4) == 0.0)   // mean_within_a
    assert(out(0).getDouble(6) == 2.0)   // energy
    // h: identical two-point distributions -> E = 0 (cross 0.5, within 0.5)
    assert(out(1).getDouble(3) == 0.5)
    assert(out(1).getDouble(4) == 0.5)
    assert(out(1).getDouble(6) == 0.0)
  }

  test("group fairness: hand-counted rates, null rates on empty denominators") {
    // group g: 4 rows, 2 pos; selected = {pos1, neg1} -> sel_rate .5,
    // tpr .5, fpr .5, precision .5. group h: all positive, none selected.
    val rows = Seq[(String, Boolean, Boolean)](
      ("g", true, true), ("g", true, false), ("g", false, true), ("g", false, false),
      ("h", true, false), ("h", true, false))
    val df = createDf(spark, "g string, y boolean, s boolean",
      rows.map { case (g, y, s) => Seq[Any](g, y, s) })
    val out = graft.ops.Calibration.groupFairness(df, Seq("g"), col("y"), col("s"))
      .orderBy("g").collect()
    val g = out(0)
    assert(g.getLong(1) == 4L && g.getLong(2) == 2L && g.getLong(3) == 2L && g.getLong(4) == 1L)
    assert(g.getDouble(5) == 0.5 && g.getDouble(6) == 0.5)
    assert(g.getDouble(7) == 0.5 && g.getDouble(8) == 0.5)
    val h = out(1)
    assert(h.getLong(3) == 0L)
    assert(h.getDouble(5) == 0.0)      // sel_rate 0
    assert(h.getDouble(6) == 0.0)      // tpr 0
    assert(h.isNullAt(7))              // fpr: no negatives
    assert(h.isNullAt(8))              // precision: nothing selected
  }

  test("vocab coverage: hand-counted top-k shares with k past the vocab size") {
    // tokens: a x4, b x2, c x1, d x1 -> total 8
    val docs = createDf(spark, "text string",
      Seq(Seq[Any]("a a b c"), Seq[Any]("a b d A")))
    val out = graft.text.Rank.vocabCoverage(docs, col("text"), Seq(1, 2, 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out(0) == ((1L, 1L, 4L, 8L, 0.5)))
    assert(out(1) == ((2L, 2L, 6L, 8L, 0.75)))
    assert(out(2) == ((10L, 4L, 8L, 8L, 1.0))) // vocab smaller than k
  }

  test("selectedAtHalf agrees with thresholding the score away from the boundary") {
    val w = graft.text.Classify.demoWeightsMicros(64)
    val docs = graft.sources.Sources.readTable(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull).limit(200)
    val scored = docs.select(
      graft.text.Classify.score(col("text"), w, biasMicros = -50000L).as("sc"),
      graft.text.Classify.selectedAtHalf(col("text"), w, biasMicros = -50000L).as("sel"))
    // away from the 6-dp rounding boundary the two must agree exactly
    val disagree = scored
      .filter(abs(col("sc") - lit(0.5)) > lit(1e-5))
      .filter((col("sc") >= 0.5) =!= col("sel")).count()
    assert(disagree == 0L)
    // and the decision actually splits the sample (non-degenerate)
    val sels = scored.agg(sum(when(col("sel"), 1L).otherwise(0L))).collect().head.getLong(0)
    assert(sels > 0L && sels < 200L)
  }
}
