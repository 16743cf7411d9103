package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Round-13 additions: the covariance participation-ratio audit
  * ([[graft.text.Similarity.effectiveRank]]) and the structural
  * literal-axis grid spine in
  * [[graft.ops.Survival.concordanceIndex]].
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def erank(rows: Seq[Seq[Double]]) =
    graft.text.Similarity.effectiveRank(
      createDf(spark, "id bigint, v array<double>",
        rows.zipWithIndex.map { case (v, i) => Seq[Any](i.toLong, v) }),
      "id", "v").head()

  test("effectiveRank: isotropic 2-dim cross hits PR = d = 2, diag_mass = 1") {
    // mean 0, C = diag(1/2, 1/2): tr = 1, ||C||_F^2 = 1/2 -> PR = 2
    val r = erank(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, -1.0)))
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-5, "trace")
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-4, "participation ratio")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-5, "diag mass")
  }

  test("effectiveRank: rank-collapsed store hits PR = 1") {
    // all variance on axis 1: C = diag(5, 0) -> PR = 25/25 = 1
    val r = erank(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(3.0, 0.0), Seq(-3.0, 0.0)))
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-5, "trace")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4, "collapsed PR")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-5, "diagonal-only mass")
  }

  test("effectiveRank: perfectly correlated dims show in diag_mass, not PR") {
    // C = [[1,1],[1,1]]: tr = 2, fro = 4 -> PR = 1 (rank 1), diag 2/4
    val r = erank(Seq(Seq(1.0, 1.0), Seq(-1.0, -1.0)))
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-5, "trace")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4, "rank-1 PR")
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-5,
      "half the Frobenius mass is off-diagonal correlation")
  }

  test("effectiveRank: constant store nulls both ratios") {
    val r = erank(Seq(Seq(2.0, 3.0), Seq(2.0, 3.0), Seq(2.0, 3.0)))
    assert(r.isNullAt(3) && r.isNullAt(4), "zero covariance -> null ratios")
    assert(math.abs(r.getDouble(2)) < 1e-6, "zero trace")
  }

  private def mmd(a: Seq[Seq[Double]], b: Seq[Seq[Double]]) =
    graft.text.Similarity.mmdMoment(
      createDf(spark, "id bigint, v array<double>, lbl int",
        (a.map(v => (v, 1)) ++ b.map(v => (v, 0))).zipWithIndex.map {
          case ((v, g), i) => Seq[Any](i.toLong, v, g)
        }),
      "id", "v", col("lbl") === 1).head()

  test("mmdMoment: identical populations score zero on both kernels") {
    val p = Seq(Seq(1.0, 2.0), Seq(-1.0, 0.5))
    val r = mmd(p, p)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("mmdMoment: hand-computed mean shift hits both kernels") {
    // A: mu=(1,0), M=[[1,0],[0,0]]; B: mu=(0,1), M=[[0,0],[0,1]]
    // linear = 1+1 = 2; quadratic = 1+0+0+1 = 2
    val r = mmd(Seq(Seq(1.0, 0.0), Seq(1.0, 0.0)),
      Seq(Seq(0.0, 1.0), Seq(0.0, 1.0)))
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-5, "mmd2_linear")
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-5, "mmd2_quadratic")
  }

  test("mmdMoment: covariance rotation with IDENTICAL marginals — only the quadratic kernel sees it") {
    // A = {(1,1),(-1,-1)}, B = {(1,-1),(-1,1)}: same per-dim marginals
    // ({-1,1} each), same means (0), M_a=[[1,1],[1,1]], M_b=[[1,-1],[-1,1]]
    // -> linear 0, quadratic = 2*(1-(-1))^2 = 8 (the per-dim-PSI blind spot)
    val r = mmd(Seq(Seq(1.0, 1.0), Seq(-1.0, -1.0)),
      Seq(Seq(1.0, -1.0), Seq(-1.0, 1.0)))
    assert(r.getDouble(3) == 0.0, "marginal view is blind")
    assert(math.abs(r.getDouble(4) - 8.0) < 1e-5, "second moments see the rotation")
  }

  test("mmdMoment: an empty side nulls both statistics") {
    val r = mmd(Seq(Seq(1.0, 2.0)), Seq.empty)
    assert(r.getLong(1) == 0L && r.isNullAt(3) && r.isNullAt(4))
  }

  test("positivityAudit: counts partition the arms; shares are micro-exact; bins in range") {
    val df = createDf(spark, "t boolean, x double",
      (1 to 40).map(i => Seq[Any](i % 3 == 0, (i % 7).toDouble)))
    val rows = Regression.positivityAudit(df, col("t"), col("x"), bins = 20)
      .collect()
    val nt = rows.map(_.getLong(1)).sum
    val nc = rows.map(_.getLong(2)).sum
    assert(nt == (1 to 40).count(_ % 3 == 0).toLong)
    assert(nc == 40L - nt)
    assert(rows.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 19L))
    // integral-division shares per arm re-sum to 1e6 within bins/2 micros
    val st = rows.map(_.getLong(3)).sum
    val sc = rows.map(_.getLong(4)).sum
    assert(math.abs(st - 1000000L) <= rows.length.toLong
      && math.abs(sc - 1000000L) <= rows.length.toLong)
    // min share never exceeds either arm share
    assert(rows.forall(r => r.getLong(5) <= r.getLong(3)
      && r.getLong(5) <= r.getLong(4)))
  }

  test("positivityAudit: a constant covariate is a contract error, not a clean bill") {
    val df = createDf(spark, "t boolean, x double",
      (1 to 10).map(i => Seq[Any](i % 2 == 0, 1.0)))
    intercept[IllegalArgumentException] {
      Regression.positivityAudit(df, col("t"), col("x")).collect()
    }
  }

  test("covariateBalance: identically distributed covariate has |SMD| ~ 0; a shifted one does not") {
    // x drives treatment; cov "same" is iid noise across arms (period-4
    // pattern independent of i % 3), cov "shift" adds +10 to treated
    val rows = (1 to 120).map { i =>
      val t = i % 3 == 0
      Seq[Any](t, (i % 5).toDouble, (i % 4).toDouble,
        (i % 4).toDouble + (if (t) 10.0 else 0.0))
    }
    val df = createDf(spark, "t boolean, x double, same double, shift double", rows)
    val r = Regression.covariateBalance(df, col("t"), col("x"),
        Seq("a_same" -> col("same"), "b_shift" -> col("shift")))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("a_same").getDouble(3)) < 0.2, "raw SMD near 0")
    assert(r("b_shift").getDouble(3) > 2.0, "a +10 shift on sd~1 screams")
    // weighting can't fix a covariate the model never saw: still large
    assert(r("b_shift").getDouble(4) > 2.0)
    assert(r("a_same").getLong(1) == 40L && r("a_same").getLong(2) == 80L)
  }

  test("covariateBalance: constant covariate in both arms nulls the SMDs") {
    val df = createDf(spark, "t boolean, x double, c double",
      (1 to 30).map(i => Seq[Any](i % 2 == 0, (i % 5).toDouble, 7.0)))
    val r = Regression.covariateBalance(df, col("t"), col("x"),
      Seq("konst" -> col("c"))).head()
    assert(r.isNullAt(3) && r.isNullAt(4), "zero pooled variance -> null")
  }

  private def truss(edges: Seq[(Long, Long)], k: Int) =
    graft.ops.Graph.kTruss(
      createDf(spark, "a bigint, b bigint",
        edges.map { case (x, y) => Seq[Any](x, y) }),
      "a", "b", k)

  test("kTruss: K4 survives 4-truss with support 2 per edge; pendant edge dies") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = truss(k4 :+ (4L, 9L), 4).collect().map(r0 =>
      (r0.getLong(0), r0.getLong(1), r0.getLong(2))).sorted
    assert(r.length == 6, "exactly the clique's edges survive")
    assert(r.forall(_._3 == 2L), "every K4 edge closes 2 triangles")
    assert(!r.exists(t => t._1 == 9L || t._2 == 9L), "pendant edge peeled")
  }

  test("kTruss: a bridge between two cliques is peeled, both cliques survive") {
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c2 = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val r = truss(c1 ++ c2 :+ (4L, 5L), 4).collect()
    assert(r.length == 12, "both cliques, no bridge")
    assert(!r.exists(x => x.getLong(0) == 4L && x.getLong(1) == 5L))
  }

  test("kTruss: k above the clique's truss number empties the graph") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(truss(k4, 5).count() == 0L, "K4 has truss number 4")
  }

  test("kTruss: idempotent at the fixpoint (confluence contract)") {
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 5L), (3L, 5L))
    val once = truss(c1, 4)
    val again = graft.ops.Graph.kTruss(
      once.select(col("u").as("a"), col("v").as("b")), "a", "b", 4)
    assert(once.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
  }

  test("concordanceIndex: literal-axis spine preserves the hand-computed C") {
    // same fixture family as Round12OpsSpec's concordance test: subjects
    // (t, e, s) = (1,1,30), (2,1,20), (3,0,10)
    // comparable: (1,2): 30>20 concordant; (1,3): 30>10 concordant;
    //             (2,3): 20>10 concordant -> C = 1
    val df = createDf(spark, "t bigint, e bigint, s bigint",
      Seq(Seq[Any](1L, 1L, 30L), Seq[Any](2L, 1L, 20L), Seq[Any](3L, 0L, 10L)))
    val r = Survival.concordanceIndex(df, col("t"), col("e"), col("s")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L, "comparable pairs")
    assert(r.getLong(3) == 3L, "concordant pairs")
    assert(r.getLong(5) == 1000000000L, "C = 1 in nano units")
  }

  test("concordanceIndex: the grid spine's broadcast side is a LocalTableScan") {
    val df = createDf(spark, "t bigint, e bigint, s bigint",
      (1 to 20).map(i => Seq[Any](i.toLong % 5, i.toLong % 2, i.toLong % 7)))
    val plan = Survival.concordanceIndex(df, col("t"), col("e"), col("s"))
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.nonEmpty, "cross spine plans a nested-loop join")
    assert(bnlj.forall { j =>
      val side = if (j.buildSide == BuildLeft) j.left else j.right
      side.collectFirst { case _: LocalTableScanExec => () }.isDefined
    }, "every spine broadcast side is a literal frame, cache-state-free")
  }
}
