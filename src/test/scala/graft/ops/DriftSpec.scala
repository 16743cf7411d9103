package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def frame(vs: Seq[Double]) =
    createDf(spark, "v double", vs.map(v => Seq[Any](v)))

  test("binIndex: strict lower edge, inclusive upper edge, tails") {
    val df = frame(Seq(-1.0, 0.0, 0.5, 1.0, 2.0, 99.0))
      .select(col("v"), Drift.binIndex(col("v"), Seq(0.0, 1.0, 2.0)).as("b"))
    assert(df.collect().map(r => (r.getDouble(0), r.getInt(1))).toMap ==
      Map(-1.0 -> 0, 0.0 -> 1, 0.5 -> 1, 1.0 -> 2, 2.0 -> 3, 99.0 -> 3))
  }

  test("binIndex: null values get a null bin, never bin 0") {
    val df = createDf(spark, "v double", Seq(Seq[Any](null), Seq[Any](-5.0)))
      .select(Drift.binIndex(col("v"), Seq(0.0)).as("b"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.count(r => !r.isNullAt(0) && r.getInt(0) == 0) == 1)
  }

  test("identical distributions: psi ~ 0, every bin present") {
    val a = frame(Seq(0.1, 0.5, 1.5, 2.5, 2.5))
    val got = Drift.psi(a, a, "v", Seq(1.0, 2.0))
    val rows = got.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getDouble(5)).forall(math.abs(_) < 1e-12))
  }

  test("disjoint distributions: large psi, empty bins survive smoothing") {
    val ref = frame(Seq.fill(100)(0.5))
    val cur = frame(Seq.fill(100)(5.0))
    val got = Drift.psi(ref, cur, "v", Seq(1.0, 2.0)).collect()
    val total = got.map(_.getDouble(5)).sum
    assert(total > 1.0, s"psi=$total") // severe drift
    assert(got.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("moderate shift lands between the rules of thumb") {
    val ref = frame((1 to 100).map(_.toDouble / 10))
    val cur = frame((1 to 100).map(i => i.toDouble / 10 + 1.5))
    val total = Drift.psi(ref, cur, "v", (1 to 9).map(_.toDouble))
      .agg(sum("psi_term")).head().getDouble(0)
    assert(total > 0.1 && total < 3.0, s"psi=$total")
  }

  test("psiPerDim: only the shifted dimension drifts; stable dims stay ~0") {
    def vecs(shift: Double, n: Int) = createDf(spark, "v array<double>",
      (1 to n).map(i => Seq[Any](Seq((i % 7) / 10.0, (i % 7) / 10.0 + shift))))
    val r = Drift.psiPerDim(vecs(0.0, 70), vecs(0.5, 70), "v",
        cutpoints = Seq(0.1, 0.3, 0.5, 0.7, 0.9))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(r.keySet == Set(0, 1))
    assert(math.abs(r(0)) < 0.01, s"dim 0 identical, psi ${r(0)}")   // untouched dim
    assert(r(1) > 0.5, s"dim 1 shifted by 0.5, psi ${r(1)}")          // drifted dim
    // per-dim counts are the vector counts
    val counts = Drift.psiPerDim(vecs(0.0, 70), vecs(0.5, 30), "v",
        cutpoints = Seq(0.5)).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(counts == Set((70L, 30L)))
  }

  test("psiCategorical: reference top-N + OTHER, churned categories drift") {
    def side(tokens: Seq[String]) =
      createDf(spark, "k string", tokens.map(t => Seq[Any](t)))
    val ref = side(Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
    val cur = side(Seq.fill(50)("a") ++ Seq.fill(50)("z")) // b,c gone; z new
    val r = Drift.psiCategorical(ref, cur, "k", topN = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // top-2 of ref = a, b; c and z both land in OTHER
    assert(r.keySet == Set("a", "b", "__OTHER__"))
    assert(r("a")._1 == 50L && r("a")._2 == 50L)
    assert(r("b")._2 == 0L && r("b")._3 > 0.1)          // vanished category drifts
    assert(r("__OTHER__") == ((20L, 50L, r("__OTHER__")._3)))
    assert(r("__OTHER__")._3 > 0.05)                     // churned tail drifts
    // identical populations → every term ~0
    val same = Drift.psiCategorical(ref, ref, "k", topN = 2)
      .collect().map(_.getDouble(3))
    assert(same.forall(t => math.abs(t) < 1e-9))
  }

  test("nulls excluded; proportions still sum to ~1 per side") {
    val ref = createDf(spark, "v double",
      Seq(Seq[Any](0.5), Seq[Any](null), Seq[Any](1.5)))
    val got = Drift.psi(ref, ref, "v", Seq(1.0))
    val sums = got.agg(sum("ref_p"), sum("cur_p")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-12)
    assert(got.agg(sum("ref_n")).head().getLong(0) == 2L)
  }

  test("plan: per-side bin counts partial-aggregate before any join") {
    val a = frame(Seq(0.1)); val b = frame(Seq(0.2))
    val plan = Drift.psi(a, b, "v", Seq(1.0)).queryExecution.executedPlan.toString
    // both sides reduce via HashAggregate; no cross/nested-loop join shape
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct"))
  }

  private def ks(as: Seq[Double], bs: Seq[Double]) =
    Drift.ksStatistic(frame(as), frame(bs), "v").head()

  test("ksStatistic: identical samples give 0, disjoint give 1") {
    val same = ks(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    val far = ks(Seq(1.0, 2.0), Seq(10.0, 11.0, 12.0))
    assert(far.getDouble(3) == 1.0)
  }

  test("ksStatistic: known small case — a={1,2}, b={2,3} has D = 1/2") {
    val r = ks(Seq(1.0, 2.0), Seq(2.0, 3.0))
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 2L)        // max |Ca·nb − Cb·na| at v=1: |1·2−0·2|
    assert(r.getDouble(3) == 0.5)
  }

  test("ksStatistic: duplicates weight the CDF; nulls are excluded") {
    // a = {1,1,1,5}: F_a(1)=3/4; b = {5}: F_b(1)=0 → D=3/4
    val a = createDf(spark, "v double",
      Seq(Seq[Any](1.0), Seq[Any](1.0), Seq[Any](1.0), Seq[Any](5.0), Seq[Any](null)))
    val r = Drift.ksStatistic(a, frame(Seq(5.0)), "v").head()
    assert(r.getLong(0) == 4L) // the null row never counts
    assert(r.getDouble(3) == 0.75)
  }
}
