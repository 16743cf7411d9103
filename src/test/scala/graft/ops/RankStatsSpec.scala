package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Rank-based statistics: Mann-Whitney U, Spearman rho, and the ACF's
  * integer formulation.
  */
class RankStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mwu(a: Seq[Double], b: Seq[Double]) = {
    val df = createDf(spark, "k int, g string, v double",
      a.map(v => Seq[Any](1, "a", v)) ++ b.map(v => Seq[Any](1, "b", v)))
    Stats.mannWhitneyU(df, Seq("k"), col("g") === "a", col("g") === "b", col("v"))
      .head()
  }

  test("mannWhitneyU hand-checked, no ties: a=[1,2,3] b=[4,5,6,7]") {
    // every b beats every a: U_a = 0
    val r = mwu(Seq(1, 2, 3), Seq(4, 5, 6, 7))
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 0L)  // u_a_twice
    assert(r.getLong(4) == 0L)  // no ties
    // z = (0 - 6) / sqrt(3*4*8/12) = -6 / sqrt(8) = -2.121320
    assert(r.getDouble(5) == -2.12132)
  }

  test("mannWhitneyU: interleave a-first — a wins 0+1+2+3 of the 16 pairs") {
    val r = mwu(Seq(1, 3, 5, 7), Seq(2, 4, 6, 8))
    assert(r.getLong(3) == 12L) // U_a = 6 -> 2U = 12
    // z = (6 - 8) / sqrt(4*4*9/12) = -2 / sqrt(12) = -0.577350
    assert(r.getDouble(5) == -0.57735)
  }

  test("mannWhitneyU: ties get average ranks and the tie correction term") {
    // a=[1,2], b=[2,3]: the tied pair at 2 shares rank 2.5
    // R_a = 1 + 2.5 = 3.5 -> 2R_a = 7; 2U_a = 7 - 2*3 = 1
    val r = mwu(Seq(1, 2), Seq(2, 3))
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == 6L) // one tie group of 2: 2^3 - 2
  }

  test("mannWhitneyU is symmetric: U_a + U_b = n_a·n_b") {
    val a = Seq(1.0, 4.0, 4.0, 9.0); val b = Seq(2.0, 4.0, 7.0)
    val df = createDf(spark, "k int, g string, v double",
      a.map(v => Seq[Any](1, "a", v)) ++ b.map(v => Seq[Any](1, "b", v)))
    val ua = Stats.mannWhitneyU(df, Seq("k"),
      col("g") === "a", col("g") === "b", col("v")).head().getLong(3)
    val ub = Stats.mannWhitneyU(df, Seq("k"),
      col("g") === "b", col("g") === "a", col("v")).head().getLong(3)
    assert(ua + ub == 2 * a.size * b.size)
  }

  private def rho(xy: Seq[(Double, Double)]): Option[Double] = {
    val df = createDf(spark, "k int, x double, y double",
      xy.map { case (x, y) => Seq[Any](1, x, y) })
    val r = Stats.spearman(df, Seq("k"), col("x"), col("y")).head()
    if (r.isNullAt(2)) None else Some(r.getDouble(2))
  }

  test("spearman: any monotone map is rho = 1; reversal is -1") {
    assert(rho(Seq(1.0 -> 1.0, 2.0 -> 100.0, 3.0 -> 101.5)) == Some(1.0))
    assert(rho(Seq(1.0 -> 9.0, 2.0 -> 4.0, 3.0 -> 1.0)) == Some(-1.0))
  }

  test("spearman hand-checked with a tie: x=[1,2,2,4] vs y=[1,3,2,4]") {
    // rows pair as (2rx, 2ry): (2,2) (5,6) (5,4) (8,8)
    // sx=sy=20, sxy=118, sxx=118, syy=120
    // num = 4·118−400 = 72; dx = 72; dy = 80 -> 72/sqrt(72·80) = 0.948683
    val got = rho(Seq(1.0 -> 1.0, 2.0 -> 3.0, 2.0 -> 2.0, 4.0 -> 4.0)).get
    val exp = BigDecimal(72.0 / math.sqrt(72.0 * 80.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == exp)
  }

  test("spearman: constant column has no rank variance -> null rho") {
    assert(rho(Seq(1.0 -> 5.0, 2.0 -> 5.0, 3.0 -> 5.0)).isEmpty)
  }

  test("spearman is rank-invariant: squashing x through exp() changes nothing") {
    val base = Seq(1.0 -> 4.0, 2.0 -> 1.0, 3.0 -> 9.0, 5.0 -> 2.0)
    val squashed = base.map { case (x, y) => math.exp(x) / 100.0 -> y }
    assert(rho(base) == rho(squashed))
  }

  private def acf(vals: Seq[Double], maxLag: Int) = {
    val df = createDf(spark, "k int, t int, v double",
      vals.zipWithIndex.map { case (v, i) => Seq[Any](1, i, v) })
    Timeseries.autocorrelation(df, Seq("k"), col("t"), col("v"), maxLag)
      .orderBy(col("lag"))
      .collect().map(r => (r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
  }

  test("autocorrelation: alternating series has acf(1) < 0 and acf(2) > 0") {
    val r = acf(Seq(1, 9, 1, 9, 1, 9, 1, 9, 1, 9), 2)
    assert(r(0)._1 == 1 && r(0)._2 == 9L && r(0)._3 < -0.8)
    assert(r(1)._1 == 2 && r(1)._2 == 8L && r(1)._3 > 0.7)
  }

  test("autocorrelation hand-checked: [1,2,3,4] lag 1") {
    // x̄=2.5; num = (2-2.5)(1-2.5)+(3-2.5)(2-2.5)+(4-2.5)(3-2.5) = 1.25
    // den = 5; acf(1) = 0.25
    val r = acf(Seq(1, 2, 3, 4), 1)
    assert(r(0)._2 == 3L && r(0)._3 == 0.25)
  }

  test("autocorrelation: lags past the series length emit n_pairs = 0, null acf") {
    val r = acf(Seq(1, 2, 3), 5)
    assert(r.length == 5)
    assert(r(4)._2 == 0L && r(4)._3.isNaN)
  }

  private def quants(vals: Seq[Double], qs: (Int, Int)*): Map[(Int, Int), Double] = {
    val df = createDf(spark, "g int, v double",
      vals.map(v => Seq[Any](1, v)))
    Stats.exactQuantiles(df, Seq("g"), col("v"), qs)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
  }

  test("exactQuantiles: the quantile_cont convention, hand-checked") {
    // sorted [10,20,30,40]: h(p) = 3p
    val r = quants(Seq(40, 10, 30, 20), (1, 4), (1, 2), (3, 4))
    assert(r(1 -> 4) == 17.5)  // h=0.75: 10 + 0.75*10
    assert(r(1 -> 2) == 25.0)  // h=1.5
    assert(r(3 -> 4) == 32.5)  // h=2.25
  }

  test("exactQuantiles: endpoints, single element, and exact-rank hits") {
    val r = quants(Seq(5, 1, 9), (0, 1), (1, 2), (1, 1))
    assert(r(0 -> 1) == 1.0 && r(1 -> 2) == 5.0 && r(1 -> 1) == 9.0)
    val single = quants(Seq(7.25), (1, 2), (19, 20))
    assert(single(1 -> 2) == 7.25 && single(19 -> 20) == 7.25)
  }

  test("exactQuantiles: p95 on 21 points lands on the exact rank") {
    // m=20, h = 20*19/20 = 19 exactly -> the 20th sorted value
    val vals = (0 to 20).map(_ * 1.5)
    val r = quants(vals, (19, 20))
    assert(r(19 -> 20) == 19 * 1.5)
  }

  test("exactQuantiles is partitioning-invariant") {
    val vals = Seq(3.25, 1.5, 4.75, 1.25, 5.5, 9.0, 2.5)
    val df = createDf(spark, "g int, v double", vals.map(v => Seq[Any](1, v)))
    val a = Stats.exactQuantiles(df, Seq("g"), col("v"), Seq((1, 3), (2, 3)))
      .orderBy(col("p_num")).collect().toSeq
    val b = Stats.exactQuantiles(df.repartition(5), Seq("g"), col("v"), Seq((1, 3), (2, 3)))
      .orderBy(col("p_num")).collect().toSeq
    assert(a == b)
  }

  private def wq(rows: Seq[(Double, Double)], qs: (Int, Int)*): Map[(Int, Int), Option[Double]] = {
    val df = createDf(spark, "g int, v double, w double",
      rows.map { case (v, w) => Seq[Any](1, v, w) })
    Stats.weightedQuantiles(df, Seq("g"), col("v"), col("w"), qs)
      .collect().map(r => (r.getInt(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
  }

  test("weightedQuantiles: weight mass moves the median where ranks would not") {
    // values 1,2,3 with weights 1,1,8: 80% of mass sits at 3
    val r = wq(Seq(1.0 -> 1.0, 2.0 -> 1.0, 3.0 -> 8.0), (1, 2), (1, 10))
    assert(r(1 -> 2) == Some(3.0))  // weighted median
    assert(r(1 -> 10) == Some(1.0)) // 10th pct still in the light tail
    // unit weights degrade to the "lower" unweighted quantile
    val u = wq(Seq(10.0 -> 1.0, 20.0 -> 1.0, 30.0 -> 1.0, 40.0 -> 1.0), (1, 2))
    assert(u(1 -> 2) == Some(20.0)) // cumW hits exactly n/2 at the 2nd row
  }

  test("weightedQuantiles: p=1 returns the max; zero-weight rows are invisible") {
    val r = wq(Seq(5.0 -> 2.0, 7.0 -> 3.0, 99.0 -> 0.0), (1, 1))
    assert(r(1 -> 1) == Some(7.0)) // the zero-weight 99 never wins
  }

  test("trimmedMean: hand-checked 1/4-trim drops one from each tail") {
    val df = createDf(spark, "g int, v double",
      Seq(0.0, 10.0, 20.0, 1000.0).map(v => Seq[Any](1, v)))
    val r = Stats.trimmedMean(df, Seq("g"), col("v"), 1, 4).head()
    // n=4, k=1: keep [10, 20] -> 15; the outlier 1000 never leaks in
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 15.0)
    // f=0 keeps everything: plain mean
    val all = Stats.trimmedMean(df, Seq("g"), col("v"), 0, 4).head()
    assert(all.getLong(3) == 4L && all.getDouble(4) == 257.5)
  }

  private def ts2(xy: Seq[(Double, Double)]) = {
    val df = createDf(spark, "g int, x double, y double",
      xy.map { case (x, y) => Seq[Any](1, x, y) })
    Stats.theilSen(df, Seq("g"), col("x"), col("y")).head()
  }

  test("theilSen: exact line recovered; one wild outlier cannot move the slope") {
    val clean = ts2(Seq(1.0 -> 12.0, 2.0 -> 14.0, 3.0 -> 16.0, 4.0 -> 18.0))
    assert(clean.getDouble(3) == 2.0 && clean.getDouble(4) == 10.0)
    // y(5) jumps to 1000: the 6 clean pair slopes (all 2) still hold the
    // median of the 10; OLS would swing hard
    val dirty = ts2(Seq(1.0 -> 12.0, 2.0 -> 14.0, 3.0 -> 16.0, 4.0 -> 18.0,
      5.0 -> 1000.0))
    assert(dirty.getDouble(3) == 2.0)
  }

  test("theilSen: even pair count interpolates the midpoint; x-constant group nulls out") {
    // 3 points -> 3 pair slopes [1, 2, 3]... use 3 points with slopes 1,3,2:
    // (0,0),(1,1),(2,4): slopes (0,1)=1, (0,2)=2, (1,2)=3 -> median 2
    val r = ts2(Seq(0.0 -> 0.0, 1.0 -> 1.0, 2.0 -> 4.0))
    assert(r.getLong(2) == 3L && r.getDouble(3) == 2.0)
    // all x equal: no valid pair
    val v = ts2(Seq(5.0 -> 1.0, 5.0 -> 2.0))
    assert(v.getLong(2) == 0L && v.isNullAt(3) && v.isNullAt(4))
  }

  private def tau(xy: Seq[(Double, Double)]): Option[Double] = {
    val df = createDf(spark, "g int, x double, y double",
      xy.map { case (x, y) => Seq[Any](1, x, y) })
    val r = Stats.kendallTau(df, Seq("g"), col("x"), col("y")).head()
    if (r.isNullAt(4)) None else Some(r.getDouble(4))
  }

  test("kendallTau: perfect monotone = 1, reversal = -1, hand-checked mix") {
    assert(tau(Seq(1.0 -> 2.0, 2.0 -> 5.0, 3.0 -> 9.0)) == Some(1.0))
    assert(tau(Seq(1.0 -> 9.0, 2.0 -> 5.0, 3.0 -> 2.0)) == Some(-1.0))
    // (1,1) (2,3) (3,2): pairs (1,2)C (1,3)C (2,3)D -> (2-1)/3
    val got = tau(Seq(1.0 -> 1.0, 2.0 -> 3.0, 3.0 -> 2.0)).get
    assert(got == BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("kendallTau: tau-b tie correction, hand-checked") {
    // x=[1,1,2], y=[1,2,3]: pairs: (1,2) x-tie; (1,3) C; (2,3) C
    // C-D = 2; n0=3, n1=1 (x ties), n2=0 -> 2/sqrt(2*3) = 0.816497
    val got = tau(Seq(1.0 -> 1.0, 1.0 -> 2.0, 2.0 -> 3.0)).get
    assert(got == BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant y: every pair y-tied -> denominator 0 -> null
    assert(tau(Seq(1.0 -> 5.0, 2.0 -> 5.0, 3.0 -> 5.0)).isEmpty)
  }

  test("poissonBootstrapMeanCI: CI brackets the point estimate and shrinks with n") {
    val small = createDf(spark, "g int, k int, v double",
      (1 to 30).map(i => Seq[Any](1, i, 50.0 + (i % 7))))
    val big = createDf(spark, "g int, k int, v double",
      (1 to 480).map(i => Seq[Any](1, i, 50.0 + (i % 7))))
    def row(df: org.apache.spark.sql.DataFrame) =
      Stats.poissonBootstrapMeanCI(df, Seq("g"), "k", col("v"), replicates = 32).head()
    val s = row(small); val b = row(big)
    for (r <- Seq(s, b)) {
      assert(r.getDouble(4) > 0.0)                       // boot_se
      assert(r.getDouble(5) < r.getDouble(3))            // ci_lo < mean
      assert(r.getDouble(6) > r.getDouble(3))            // ci_hi > mean
      assert(r.getDouble(3) > 50.0 && r.getDouble(3) < 57.0)
    }
    assert(b.getDouble(4) < s.getDouble(4)) // 16x the data -> tighter SE
  }

  test("poissonBootstrapMeanCI is partitioning-invariant (seeded hash, exact moments)") {
    val df = createDf(spark, "g int, k int, v double",
      (1 to 60).map(i => Seq[Any](i % 2, i, i * 1.5)))
    val a = Stats.poissonBootstrapMeanCI(df, Seq("g"), "k", col("v"), 16)
      .orderBy(col("g")).collect().toSeq
    val b = Stats.poissonBootstrapMeanCI(df.repartition(7), Seq("g"), "k", col("v"), 16)
      .orderBy(col("g")).collect().toSeq
    assert(a == b)
  }

  test("twoProportionZ: hand-checked pooled z; equal rates give 0; one-sided variance nulls") {
    def tp(a: Seq[Int], b: Seq[Int]) = {
      val df = createDf(spark, "g string, s int",
        a.map(v => Seq[Any]("a", v)) ++ b.map(v => Seq[Any]("b", v)))
      Stats.twoProportionZ(df, col("g") === "a", col("g") === "b", col("s") === 1)
        .head()
    }
    // a: 3/4, b: 1/4 -> pooled 0.5, var = 0.25*(1/4+1/4) = 0.125
    // z = 0.5/sqrt(0.125) = 1.414214
    val r = tp(Seq(1, 1, 1, 0), Seq(1, 0, 0, 0))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 4L, 1L)))
    assert(r.getDouble(6) == 1.414214)
    assert(tp(Seq(1, 0), Seq(1, 0)).getDouble(6) == 0.0)
    assert(tp(Seq(1, 1), Seq(1, 1)).isNullAt(6)) // all success: no variance
  }

  test("chiSquareResiduals: independence gives 0 residuals; association flags the diagonal") {
    val indep = createDf(spark, "a string, b string",
      (for { a <- Seq("x", "y"); b <- Seq("u", "v") } yield Seq[Any](a, b)))
    val i = Stats.chiSquareResiduals(indep, col("a"), col("b")).collect()
    assert(i.forall(r => r.getDouble(4) == 0.0 || r.getDouble(4) == -0.0))
    // strong diagonal: 9 agree per class, 1 disagrees
    val rows = Seq.fill(9)(Seq[Any]("x", "u")) ++ Seq.fill(9)(Seq[Any]("y", "v")) ++
      Seq(Seq[Any]("x", "v"))
    val dep = createDf(spark, "a string, b string", rows)
    val d = Stats.chiSquareResiduals(dep, col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(d(("x", "u")) > 2.0 && d(("y", "v")) > 2.0) // diagonal enriched
    assert(d(("x", "v")) < 0.0) // off-diagonal depleted vs expectation
  }

  test("chiSquareResiduals: a single-category margin has no variance -> null resid") {
    val df = createDf(spark, "a string, b string",
      Seq(Seq[Any]("k", "u"), Seq[Any]("k", "v")))
    val r = Stats.chiSquareResiduals(df, col("a"), col("b")).collect()
    assert(r.length == 2 && r.forall(_.isNullAt(4)))
  }

  test("mutualInformation: identical columns give MI = H and NMI = 1; independence gives 0") {
    val ident = createDf(spark, "a string, b string",
      Seq("x" -> "x", "y" -> "y", "x" -> "x", "y" -> "y")
        .map { case (a, b) => Seq[Any](a, b) })
    val r = Stats.mutualInformation(ident, col("a"), col("b")).head()
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L && r.getDouble(1) == ln2 && r.getDouble(3) == ln2)
    assert(r.getDouble(4) == 1.0)
    // exact 2x2 independence: every cell N/4
    val indep = createDf(spark, "a string, b string",
      (for { a <- Seq("x", "y"); b <- Seq("u", "v") } yield Seq[Any](a, b)))
    val i = Stats.mutualInformation(indep, col("a"), col("b")).head()
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0)
  }

  test("mutualInformation: a constant column has H = 0 and null NMI") {
    val df = createDf(spark, "a string, b string",
      Seq(Seq[Any]("k", "u"), Seq[Any]("k", "v")))
    val r = Stats.mutualInformation(df, col("a"), col("b")).head()
    assert(r.getDouble(1) == 0.0 && r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("anovaOneWay: hand-checked F for three separated groups") {
    // a=[1,2,3], b=[4,5,6], c=[7,8,9]: means 2,5,8; grand 5
    // SSB = 3*(9+0+9) = 54; SSW = 3 groups * 2 each = 6
    // F = (54/2)/(6/6) = 27
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5, "b" -> 6,
        "c" -> 7, "c" -> 8, "c" -> 9).map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.anovaOneWay(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L)
    assert(r.getDouble(2) == 54.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 27.0)
    assert(r.getDouble(5) == 0.9) // eta² = 54/60: grouping explains 90%
  }

  test("anovaOneWay: identical group means give F = 0; constant data nulls F") {
    val same = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 3, "b" -> 1, "b" -> 3)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    assert(Stats.anovaOneWay(same, col("g"), col("v")).head().getDouble(4) == 0.0)
    val const = createDf(spark, "g string, v double",
      Seq("a" -> 2, "a" -> 2, "b" -> 2, "b" -> 2)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    assert(Stats.anovaOneWay(const, col("g"), col("v")).head().isNullAt(4)) // ssw=0
  }

  test("benjaminiHochberg: hand-checked step-up with the suffix-min monotone fix") {
    // p = [0.01, 0.02, 0.04, 0.8], m=4:
    //   raw q = [0.04, 0.04, 0.0533.., 0.8]; suffix-min = same (monotone)
    val df = createDf(spark, "id int, p double", Seq(
      Seq[Any](1, 0.01), Seq[Any](2, 0.02), Seq[Any](3, 0.04), Seq[Any](4, 0.8)))
    val got = Stats.benjaminiHochberg(df, col("p"), alpha = 0.05, Seq(col("id")))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(3), r.getDouble(2), r.getBoolean(4)))).toMap
    assert(got(1) == ((1L, 0.04, true)))
    assert(got(2) == ((2L, 0.04, true)))
    assert(got(3)._2 == 0.053333 && !got(3)._3)
    assert(got(4) == ((4L, 0.8, false)))
  }

  test("benjaminiHochberg: a later small p pulls earlier q down (the step-up)") {
    // p = [0.03, 0.031]: raw q = [0.06, 0.062]... then p3 = 0.001 at rank 1
    // p sorted [0.001, 0.03, 0.031]: raw [0.003, 0.045, 0.031] -> suffix-min
    // gives q2 = min(0.045, 0.031) = 0.031: rank-2 q is PULLED DOWN by rank 3
    val df = createDf(spark, "id int, p double", Seq(
      Seq[Any](1, 0.03), Seq[Any](2, 0.031), Seq[Any](3, 0.001)))
    val got = Stats.benjaminiHochberg(df, col("p"), alpha = 0.05, Seq(col("id")))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(3) == 0.003 && got(1) == 0.031 && got(2) == 0.031)
  }

  test("benjaminiHochberg: null p-values are not hypotheses — excluded from m, null outputs") {
    // 2 real tests + 1 null-p row: m must be 2 (not 3), the null row gets
    // null (rank, q, reject), and the real tests' q values match the m=2 run
    val withNull = createDf(spark, "id int, p double", Seq(
      Seq[Any](1, 0.01), Seq[Any](2, 0.04), Seq[Any](3, null)))
    val got = Stats.benjaminiHochberg(withNull, col("p"), alpha = 0.05, Seq(col("id")))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(3).isNullAt(2) && got(3).isNullAt(3) && got(3).isNullAt(4))
    val clean = createDf(spark, "id int, p double", Seq(
      Seq[Any](1, 0.01), Seq[Any](2, 0.04)))
    val ref = Stats.benjaminiHochberg(clean, col("p"), alpha = 0.05, Seq(col("id")))
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getDouble(2), r.getBoolean(4)))).toMap
    for (id <- Seq(1, 2))
      assert((got(id).getLong(3), got(id).getDouble(2), got(id).getBoolean(4)) == ref(id))
  }

  test("kendallTau: a 1-row group still emits its row (n, 0, 0, null tau)") {
    val df = createDf(spark, "g int, x double, y double", Seq(
      Seq[Any](1, 1.0, 2.0), Seq[Any](1, 2.0, 3.0), Seq[Any](1, 3.0, 5.0),
      Seq[Any](2, 7.0, 7.0)))
    val got = Stats.kendallTau(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(1, 2))
    assert(got(1).getLong(1) == 3L && got(1).getDouble(4) == 1.0)
    assert(got(2).getLong(1) == 1L && got(2).getLong(2) == 0L &&
      got(2).getLong(3) == 0L && got(2).isNullAt(4))
  }

  private def jsd(a: Seq[String], b: Seq[String]) = {
    val ra = createDf(spark, "v string", a.map(v => Seq[Any](v)))
    val rb = createDf(spark, "v string", b.map(v => Seq[Any](v)))
    Drift.jsDivergence(ra, rb, "v").head()
  }

  test("jsDivergence: identical distributions give 0; disjoint supports give ln 2 (norm 1)") {
    val same = jsd(Seq("x", "x", "y"), Seq("x", "x", "y"))
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0)
    val disjoint = jsd(Seq("x", "x"), Seq("y", "z"))
    assert(disjoint.getDouble(4) == 1.0) // maximal divergence
    assert(disjoint.getDouble(3) == BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("jsDivergence is symmetric and rate-invariant (sample size cancels)") {
    val a = Seq("x", "x", "x", "y")
    val b = Seq("x", "y", "y", "y")
    val ab = jsd(a, b); val ba = jsd(b, a)
    assert(ab.getDouble(3) == ba.getDouble(3))
    // doubling one sample leaves its distribution (and JSD) unchanged
    val scaled = jsd(a ++ a, b)
    assert(scaled.getDouble(3) == ab.getDouble(3))
  }

  test("ksStatisticGrouped: identical samples give d = 0; disjoint give d = n_a·n_b") {
    val df = createDf(spark, "g int, t string, v double",
      // g=1: identical; g=2: disjoint ranges
      Seq(Seq[Any](1, "a", 1.0), Seq[Any](1, "b", 1.0),
        Seq[Any](1, "a", 2.0), Seq[Any](1, "b", 2.0),
        Seq[Any](2, "a", 1.0), Seq[Any](2, "a", 2.0),
        Seq[Any](2, "b", 5.0), Seq[Any](2, "b", 6.0)))
    val got = Drift.ksStatisticGrouped(df, Seq("g"),
        col("t") === "a", col("t") === "b", col("v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1) == ((0L, 0.0)))
    assert(got(2)._1 == 4L && got(2)._2 == 1.0) // full separation
  }

  test("concentration: monopoly gives hhi = top_share = 1; uniform gives 1/n, gini 0") {
    val mono = createDf(spark, "g int, e int, v double",
      Seq(Seq[Any](1, 1, 100.0)))
    val m = Stats.concentration(mono, Seq("g"), "e", col("v")).head()
    assert(m.getLong(1) == 1L && m.getDouble(3) == 1.0 && m.getDouble(4) == 1.0)
    assert(m.getDouble(5) == 0.0) // one entity: no inequality to measure
    val unif = createDf(spark, "g int, e int, v double",
      (1 to 4).map(i => Seq[Any](1, i, 25.0)))
    val u = Stats.concentration(unif, Seq("g"), "e", col("v")).head()
    assert(u.getLong(1) == 4L && u.getDouble(2) == 100.0)
    assert(u.getDouble(3) == 0.25 && u.getDouble(4) == 0.25)
    assert(u.getDouble(5) == 0.0) // perfectly equal shares
  }

  test("concentration: hand-checked gini on shares (0.1, 0.2, 0.3, 0.4)") {
    val df = createDf(spark, "g int, e int, v double",
      Seq(Seq[Any](1, 1, 10.0), Seq[Any](1, 2, 20.0),
        Seq[Any](1, 3, 30.0), Seq[Any](1, 4, 40.0)))
    val r = Stats.concentration(df, Seq("g"), "e", col("v")).head()
    // sorted x = [10,20,30,40]: num = Σ(2i-5)x = -30-20+30+120 = 100
    // gini = 100 / (4·100) = 0.25
    assert(r.getDouble(5) == 0.25)
  }

  private def conc(startEnd: (Int, Int)*) = {
    val df = createDf(spark, "s int, e int",
      startEnd.map { case (a, b) => Seq[Any](a, b) })
    RangeJoin.maxConcurrency(df, col("s"), col("e")).head()
  }

  test("maxConcurrency: hand-checked overlap, earliest argmax reported") {
    // [1,5) [2,6) [3,4): all three open on [3,4)
    val r = conc(1 -> 5, 2 -> 6, 3 -> 4)
    assert(r.getLong(0) == 3L && r.getInt(1) == 3)
    // plateau: [1,3) [2,4) peak 2 first at t=2 (also 2 at t=3 after -1/+1? no)
    val p = conc(1 -> 3, 2 -> 4)
    assert(p.getLong(0) == 2L && p.getInt(1) == 2)
  }

  test("maxConcurrency: half-open — back-to-back intervals never overlap") {
    // [1,2) then [2,3): end processes before start at t=2
    val r = conc(1 -> 2, 2 -> 3)
    assert(r.getLong(0) == 1L && r.getInt(1) == 1)
  }

  test("maxConcurrency: zero-length intervals drop; grouped variant per key") {
    val df = createDf(spark, "g int, s int, e int", Seq(
      Seq[Any](1, 1, 4), Seq[Any](1, 2, 3), Seq[Any](1, 5, 5), // zero-length
      Seq[Any](2, 1, 2)))
    val got = RangeJoin.maxConcurrency(df, col("s"), col("e"), Seq("g"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(1) == ((2L, 2)) && got(2) == ((1L, 1)))
  }

  test("maxConcurrency is partitioning-invariant on the global path") {
    val iv = Seq(1 -> 9, 2 -> 5, 3 -> 8, 5 -> 7, 6 -> 10, 2 -> 3)
    val df = createDf(spark, "s int, e int", iv.map { case (a, b) => Seq[Any](a, b) })
    val a = RangeJoin.maxConcurrency(df, col("s"), col("e")).head()
    val b = RangeJoin.maxConcurrency(df.repartition(7), col("s"), col("e")).head()
    assert(a == b)
  }

  test("concentration: hand-checked skewed shares; per-entity rows pre-aggregate") {
    // entity 1 split across two rows: shares (0.6, 0.3, 0.1)
    val df = createDf(spark, "g int, e int, v double", Seq(
      Seq[Any](1, 1, 40.0), Seq[Any](1, 1, 20.0),
      Seq[Any](1, 2, 30.0), Seq[Any](1, 3, 10.0)))
    val r = Stats.concentration(df, Seq("g"), "e", col("v")).head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(3) == 0.46) // 0.36 + 0.09 + 0.01
    assert(r.getDouble(4) == 0.6)
  }

  private def cusumRows(vals: Seq[Double], k: Double, h: Double) = {
    val df = createDf(spark, "g int, t int, v double",
      vals.zipWithIndex.map { case (v, i) => Seq[Any](1, i, v) })
    Timeseries.cusum(df, Seq("g"), col("t"), col("v"), k, h)
      .orderBy(col("t"))
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
  }

  test("cusum: flat series stays at exact zero, no alarms") {
    val r = cusumRows(Seq(5, 5, 5, 5, 5), k = 0.0, h = 1.0)
    assert(r.forall { case (p, m, a) => p == 0.0 && m == 0.0 && !a })
  }

  test("cusum hand-checked: level shift accumulates and alarms") {
    // mean of [0,0,0,4,4,4] is 2; k=0:
    //   S+ walks 0,0,0 then +2 per step: 2,4,6
    //   S- walks 2,4,6 then recedes: 4,2,0
    val r = cusumRows(Seq(0, 0, 0, 4, 4, 4), k = 0.0, h = 5.0)
    assert(r.map(_._1).toSeq == Seq(0.0, 0.0, 0.0, 2.0, 4.0, 6.0))
    assert(r.map(_._2).toSeq == Seq(2.0, 4.0, 6.0, 4.0, 2.0, 0.0))
    assert(r.map(_._3).toSeq == Seq(false, false, true, false, false, true))
  }

  test("cusum: the allowance k absorbs drift below it") {
    // same shift, k=2 swallows the +/-2 deviations entirely
    val r = cusumRows(Seq(0, 0, 0, 4, 4, 4), k = 2.0, h = 1.0)
    assert(r.forall { case (p, m, a) => p == 0.0 && m == 0.0 && !a })
  }

  test("cusum matches the sequential recursion on an arbitrary series") {
    val vals = Seq(3.25, 1.5, 4.75, 1.25, 5.5, 9.0, 2.5, 6.25, 0.75, 4.0)
    val k = 0.5
    val mean = vals.sum / vals.size
    var sp = 0.0; var sm = 0.0
    val exp = vals.map { x =>
      sp = math.max(0.0, sp + (x - mean - k))
      sm = math.max(0.0, sm + (mean - x - k))
      (BigDecimal(sp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(sm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = cusumRows(vals, k, h = 2.0).map(r => (r._1, r._2)).toSeq
    exp.zip(got).foreach { case ((ep, em), (gp, gm)) =>
      assert(math.abs(ep - gp) < 2e-6 && math.abs(em - gm) < 2e-6)
    }
  }

  test("autocorrelation is partitioning-invariant (integer formulation)") {
    val vals = Seq(3.25, 1.5, 4.75, 1.25, 5.5, 9.0, 2.5, 6.25)
    val df = createDf(spark, "k int, t int, v double",
      vals.zipWithIndex.map { case (v, i) => Seq[Any](1, i, v) })
    val a = Timeseries.autocorrelation(df, Seq("k"), col("t"), col("v"), 3)
      .orderBy(col("lag")).collect().toSeq
    val b = Timeseries.autocorrelation(df.repartition(7), Seq("k"), col("t"), col("v"), 3)
      .orderBy(col("lag")).collect().toSeq
    assert(a == b)
  }

  test("benjaminiYekutieli: harmonic inflation — q = BH q x H(m); single test equal") {
    // p = (0.02, 0.04): BH q = (0.04, 0.04); H(2) = 1.5 -> BY q = (0.06, 0.06)
    val df = createDf(spark, "id int, p double",
      Seq(Seq[Any](1, 0.02), Seq[Any](2, 0.04)))
    val by = Stats.benjaminiHochberg(df, col("p"), alpha = 0.1, Seq(col("id")),
        yekutieli = true)
      .orderBy(col("id")).collect()
    assert(by.map(_.getAs[Double]("bh_q")).toSeq == Seq(0.06, 0.06))
    val one = createDf(spark, "id int, p double", Seq(Seq[Any](1, 0.03)))
    val bh1 = Stats.benjaminiHochberg(one, col("p"), 0.1, Seq(col("id"))).head()
    val by1 = Stats.benjaminiHochberg(one, col("p"), 0.1, Seq(col("id")),
      yekutieli = true).head()
    assert(bh1.getAs[Double]("bh_q") == by1.getAs[Double]("bh_q"))
  }

  test("rankBiserial: separation maps to +1/-1, balanced interleave to 0") {
    def rb(pairs: Seq[(String, Double)]): Double = {
      val df = createDf(spark, "g string, v double",
        pairs.map { case (g, v) => Seq[Any](g, v) }).withColumn("k", lit(0))
      Stats.rankBiserial(df, Seq("k"), col("g") === "a", col("g") === "b",
        col("v")).head().getDouble(3)
    }
    assert(rb(Seq("a" -> 3.0, "a" -> 4.0, "b" -> 1.0, "b" -> 2.0)) == 1.0)
    assert(rb(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 3.0, "b" -> 4.0)) == -1.0)
    assert(rb(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 1.0, "b" -> 2.0)) == 0.0)
  }

  test("seasonalMannKendall: hand-checked pooled S/variance over two weekday series") {
    // season A: 1,2,3 rising (S=3, var18=66); B: 5,4 falling (S=-1, var18=18)
    // S=2, Var=84/18 -> z = 1/sqrt(4.6667) = 0.46291
    val df = createDf(spark, "g string, se string, o int, v double",
      Seq(("A", 1, 1.0), ("A", 3, 2.0), ("A", 5, 3.0), ("B", 2, 5.0), ("B", 4, 4.0))
        .map { case (se, o, v) => Seq[Any]("s", se, o, v) })
    val r = Stats.seasonalMannKendall(df, Seq("g"), col("se"), col("o"),
      col("v")).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 5L)
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.46291)
  }

  test("seasonalMannKendall: all-tied seasons contribute nothing; invariant to partitioning") {
    val tied = createDf(spark, "g string, se string, o int, v double",
      (1 to 4).map(o => Seq[Any]("s", "A", o, 7.0)))
    val r = Stats.seasonalMannKendall(tied, Seq("g"), col("se"), col("o"),
      col("v")).head()
    assert(r.getLong(3) == 0L && r.isNullAt(4))
    val rows = (0 until 120).map(i =>
      Seq[Any](s"g${i % 2}", s"se${i % 7}", i, ((i * 13) % 31).toDouble))
    val df = createDf(spark, "g string, se string, o int, v double", rows)
    val one = Stats.seasonalMannKendall(df.coalesce(1), Seq("g"), col("se"),
      col("o"), col("v")).orderBy(col("g")).collect().toSeq
    val many = Stats.seasonalMannKendall(df.repartition(11), Seq("g"), col("se"),
      col("o"), col("v")).orderBy(col("g")).collect().toSeq
    assert(one == many)
  }
}
