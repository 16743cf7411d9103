package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Round-12 hardening: the gammaOrdinal tie-term fix (ADVICE r11 high),
  * the hard bounded-panel guards on bradleyTerry/stationaryDistribution,
  * the frequentSequences null-type fix, and the BFS early exit.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gammaOrdinal: hand-computed asymmetric ties (the ADVICE r11 case)") {
    // cells (1,1),(2,1),(3,2), one observation each:
    //   (1,1)-(2,1): x differs, y equal  -> tied on y ONLY
    //   (1,1)-(3,2): concordant
    //   (2,1)-(3,2): concordant
    // C=2 D=0 T_x_only=0 T_y_only=1
    //   gamma = 2/2 = 1
    //   d_yx  = (C-D)/(C+D+T_y_only) = 2/3   (r11 wrongly returned 1)
    //   tau_b = 2/sqrt(2*3) = 0.816497
    val df = createDf(spark, "x int, y int",
      Seq(Seq[Any](1, 1), Seq[Any](2, 1), Seq[Any](3, 2)))
    val r = Stats.gammaOrdinal(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 2L, "c_pairs")
    assert(r.getLong(2) == 0L, "d_pairs")
    assert(r.getLong(3) == 0L, "tx_pairs = tied on x only")
    assert(r.getLong(4) == 1L, "ty_pairs = tied on y only")
    assert(r.getDouble(5) == 1.0, "gamma")
    assert(math.abs(r.getDouble(6) - 2.0 / 3.0) < 1e-5, "somers_d_yx")
    assert(math.abs(r.getDouble(7) - 2.0 / math.sqrt(6.0)) < 1e-5, "tau_b")
  }

  test("gammaOrdinal: transposed roles move the tie to the other margin") {
    // cells (1,1),(1,2),(2,3): the (1,1)-(1,2) pair is tied on x ONLY,
    // so d_yx's denominator ignores it: d_yx = 2/2 = 1, tau_b unchanged
    // by symmetry of the two cases
    val df = createDf(spark, "x int, y int",
      Seq(Seq[Any](1, 1), Seq[Any](1, 2), Seq[Any](2, 3)))
    val r = Stats.gammaOrdinal(df, col("x"), col("y")).head()
    assert(r.getLong(3) == 1L, "tx_pairs")
    assert(r.getLong(4) == 0L, "ty_pairs")
    assert(r.getDouble(6) == 1.0, "somers_d_yx ignores tied-on-x pairs")
    assert(math.abs(r.getDouble(7) - 2.0 / math.sqrt(6.0)) < 1e-5, "tau_b")
  }

  test("bradleyTerry: panel cap is a contract error, not an OOM") {
    val df = createDf(spark, "w string, l string",
      Seq(Seq[Any]("a", "b"), Seq[Any]("b", "c"), Seq[Any]("c", "a")))
    val e = intercept[IllegalArgumentException] {
      Regression.bradleyTerry(df, col("w"), col("l"), maxItems = 2).collect()
    }
    assert(e.getMessage.contains("distinct items"))
  }

  test("bradleyTerry: tolUnits early-exits and reports the actual sweep count") {
    val df = createDf(spark, "w string, l string",
      (1 to 3).map(_ => Seq[Any]("a", "b")) :+ Seq[Any]("b", "a"))
    val fixed = Regression.bradleyTerry(df, col("w"), col("l"), iterations = 16)
    assert(fixed.select("iters_run").head().getLong(0) == 16L)
    val tol = Regression.bradleyTerry(df, col("w"), col("l"), iterations = 16,
      tolUnits = 1000000L)
    val run = tol.select("iters_run").head().getLong(0)
    assert(run < 16L && run >= 1L, s"expected early exit, ran $run")
    // converged thetas match the fixed-sweep answer at 6 dp
    val a = fixed.orderBy("item").select("theta").collect().map(_.getDouble(0))
    val b = tol.orderBy("item").select("theta").collect().map(_.getDouble(0))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4) }
  }

  test("stationaryDistribution: state cap is a contract error, not an OOM") {
    val rows = Seq(("u", 1L, 1L, "a"), ("u", 2L, 2L, "b"), ("u", 3L, 3L, "c"))
    val df = createDf(spark, "u string, ts bigint, id bigint, et string",
      rows.map { case (u, t, i, e) => Seq[Any](u, t, i, e) })
    val e = intercept[IllegalArgumentException] {
      Funnel.stationaryDistribution(df, "u", "ts", "id", "et",
        iterations = 4, maxStates = 2).collect()
    }
    assert(e.getMessage.contains("distinct states"))
  }

  test("frequentSequences: null types drop from the timeline, never shorten a pattern") {
    // r11 bug: a null mid-window made concat_ws emit 'b>c' from the
    // length-3 window (b, null, c) — a 2-step string counted as a
    // 3-pattern. r12 drops null-type events BEFORE windowing, so the
    // timeline is a,b,c,d and the 3-patterns are exactly a>b>c, b>c>d.
    val rows = Seq(("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, null),
      ("u", 4L, "c"), ("u", 5L, "d"))
    val df = createDf(spark, "u string, ts bigint, et string",
      rows.map { case (u, t, e) => Seq[Any](u, t, e) })
    val pats = Funnel.frequentSequences(df, "u", "ts", "ts", "et", len = 3)
      .select("pattern").collect().map(_.getString(0)).toSet
    assert(pats == Set("a>b>c", "b>c>d"))
  }

  test("bfsDistances: early exit leaves the fixpoint intact on a short chain") {
    val edges = createDf(spark, "s string, d string",
      Seq(Seq[Any]("a", "b"), Seq[Any]("b", "c")))
    val seeds = createDf(spark, "n string", Seq(Seq[Any]("a")))
    // maxHops far beyond the diameter: the r12 early exit must stop at
    // the empty frontier without changing the result
    val out = Graph.bfsDistances(edges, "s", "d", seeds, "n", maxHops = 16)
      .orderBy("node").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("closenessCentrality: early exit matches the hand-computed star") {
    // star s -> {a,b,c}: n_reached 4, sum_dist 3, harmonic 3, closeness 1
    val edges = createDf(spark, "s string, d string",
      Seq(Seq[Any]("s", "a"), Seq[Any]("s", "b"), Seq[Any]("s", "c")))
    val seeds = createDf(spark, "n string", Seq(Seq[Any]("s")))
    val r = Graph.closenessCentrality(edges, "s", "d", seeds, "n", maxHops = 16)
      .head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 1.0)
  }
}
