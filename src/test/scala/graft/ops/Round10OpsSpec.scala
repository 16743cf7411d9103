package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for the round-10 operators: graph metrics
  * (assortativity, local clustering, reciprocity), inequality indices
  * (Theil/Atkinson, Lorenz deciles), restricted mean survival time,
  * AR(2) Yule-Walker, and the Poisson dispersion test.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edges(pairs: Seq[(Int, Int)]) =
    createDf(spark, "a int, b int",
      pairs.map { case (u, v) => Seq[Any](u, v) })

  test("degree assortativity of the 4-path is exactly -1/2") {
    // P4: 1-2-3-4; degrees 1,2,2,1 — a textbook disassortative graph
    val out = Graph.degreeAssortativity(edges(Seq(1 -> 2, 2 -> 3, 3 -> 4)),
      "a", "b").collect().head
    assert(out.getLong(0) == 4L)          // nodes
    assert(out.getLong(1) == 3L)          // edges
    assert(out.getDouble(2) == -0.5)      // (6*2*8-100)/(6*18-100) = -4/8
  }

  test("assortativity is null on a degree-regular graph (zero variance)") {
    // triangle: all degrees 2
    val out = Graph.degreeAssortativity(edges(Seq(1 -> 2, 2 -> 3, 1 -> 3)),
      "a", "b").collect().head
    assert(out.isNullAt(2))
  }

  test("local clustering: triangle corners 1.0, hub with pendant 1/3") {
    // K3 on {1,2,3} plus pendant 4 on 3
    val out = Graph.localClustering(
        edges(Seq(1 -> 2, 1 -> 3, 2 -> 3, 3 -> 4)), "a", "b")
      .orderBy("node").collect()
    val byNode = out.map(r => r.getInt(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byNode.keySet == Set(1, 2, 3)) // node 4 has degree 1: excluded
    assert(byNode(1) == ((2L, 1L, 1.0)))
    assert(byNode(2) == ((2L, 1L, 1.0)))
    assert(byNode(3) == ((3L, 1L, 0.333333))) // 2*1/(3*2)
  }

  test("reciprocity counts mutual pairs once and drops loops/duplicates") {
    val e = createDf(spark, "s int, d int",
      Seq(Seq[Any](1, 2), Seq[Any](2, 1), Seq[Any](1, 3), Seq[Any](3, 4),
        Seq[Any](4, 3), Seq[Any](5, 5), Seq[Any](1, 2)))
    val out = Graph.reciprocity(e, "s", "d").collect().head
    assert(out.getLong(0) == 5L)     // distinct non-loop directed edges
    assert(out.getLong(1) == 2L)     // {1,2} and {3,4}
    assert(out.getDouble(2) == 0.8)  // 2*2/5
  }

  test("inequality: equal incomes give zero indices; 1-vs-3 matches hand values") {
    val df = createDf(spark, "g string, e int, v double",
      Seq(Seq[Any]("a", 1, 5.0), Seq[Any]("a", 2, 5.0), Seq[Any]("a", 3, 5.0),
        Seq[Any]("b", 1, 1.0), Seq[Any]("b", 2, 3.0)))
    val out = Stats.inequality(df, Seq("g"), "e", col("v"))
      .orderBy("g").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 3L && a.getDouble(2) == 15.0)
    assert(a.getDouble(3) == 0.0 && a.getDouble(4) == 0.0 && a.getDouble(5) == 0.0)
    // group b: ratios 0.5 and 1.5 about the mean of 2
    assert(b.getDouble(3) == 0.130812) // (0.5 ln0.5 + 1.5 ln1.5)/2
    assert(b.getDouble(4) == 0.143841) // (-ln0.5 - ln1.5)/2
    assert(b.getDouble(5) == 0.133975) // 1 - sqrt(0.75)
  }

  test("lorenz deciles of incomes 1..10: cumulative triangular shares over 55") {
    val df = createDf(spark, "g string, e int, v double",
      (1 to 10).map(i => Seq[Any]("g", i, i.toDouble)))
    val out = Stats.lorenzDeciles(df, Seq("g"), "e", col("v"))
      .orderBy("decile").collect()
    assert(out.length == 10)
    val shares = out.map(_.getDouble(3)).toSeq
    val want = (1 to 10).map(i => BigDecimal(i * (i + 1) / 2.0 / 55.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(shares == want)
    assert(out.map(_.getLong(1)).toSeq == (1L to 10L)) // deciles 1..10
  }

  test("rmst integrates the KM steps: textbook curve gives 4.5 at tau=10") {
    val subj = createDf(spark, "t int, e int",
      Seq(Seq[Any](1, 1), Seq[Any](2, 1), Seq[Any](2, 0),
        Seq[Any](3, 1), Seq[Any](4, 0)))
    val out = Survival.rmst(subj, col("t"), col("e"), tau = 10L).collect().head
    assert(out.getLong(0) == 10L && out.getLong(1) == 5L)
    // 1*1 + 0.8*1 + 0.6*1 + 0.3*1 + 0.3*6
    assert(out.getDouble(2) == 4.5)
    val early = Survival.rmst(subj, col("t"), col("e"), tau = 2L).collect().head
    assert(early.getDouble(2) == 1.8) // 1*1 + 0.8*(2-1)
  }

  test("ar2 yule-walker on 1..5: r1=0.4, r2=-0.1, phi from the closed form") {
    val df = createDf(spark, "g string, o int, v double",
      (1 to 5).map(i => Seq[Any]("g", i, i.toDouble)))
    val out = Timeseries.ar2YuleWalker(df, Seq("g"), col("o"), col("v"))
      .collect().head
    assert(out.getLong(1) == 5L)
    assert(out.getDouble(2) == 0.4)       // 100/250
    assert(out.getDouble(3) == -0.1)      // -25/250
    assert(out.getDouble(4) == 0.52381)   // 0.4*1.1/0.84
    assert(out.getDouble(5) == -0.309524) // -0.26/0.84
  }

  test("poisson dispersion: counts 1,2,3 give D=0.5, chi2=1") {
    val df = createDf(spark, "g string, c int",
      Seq(Seq[Any]("g", 1), Seq[Any]("g", 2), Seq[Any]("g", 3)))
    val out = Stats.poissonDispersion(df, Seq("g"), col("c")).collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == 2.0)
    assert(out.getDouble(3) == 0.5) // under-dispersed: var 1 vs mean 2
    assert(out.getDouble(4) == 1.0)
  }

  test("holm step-down: prefix max of (m-i+1)p, capped at 1, nulls excluded") {
    val df = createDf(spark, "id int, p double",
      Seq(Seq[Any](1, 0.01), Seq[Any](2, 0.04), Seq[Any](3, 0.03),
        Seq[Any](4, null)))
    val out = Stats.holmBonferroni(df, col("p"), alpha = 0.05,
        tieBreak = Seq(col("id")))
      .orderBy("id").collect()
    // columns: id, p, holm_adj, holm_rank, holm_reject
    val adj = out.map(r => r.getInt(0) ->
      (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(adj(1) == 0.03) // 3*0.01
    assert(adj(2) == 0.06) // max(0.03, 2*0.03, 1*0.04) at rank 3
    assert(adj(3) == 0.06) // max(0.03, 2*0.03)
    assert(adj(4) == null) // null p is not a hypothesis
    val rej = out.map(r => r.getInt(0) ->
      (if (r.isNullAt(4)) null else r.getBoolean(4))).toMap
    assert(rej(1) == true && rej(2) == false && rej(3) == false)
  }

  test("icc one-way: two groups {1,2,3},{4,5,6} give 12.5/15.5") {
    val df = createDf(spark, "g string, v double",
      Seq(1, 2, 3).map(i => Seq[Any]("a", i.toDouble)) ++
        Seq(4, 5, 6).map(i => Seq[Any]("b", i.toDouble)))
    val out = Stats.iccOneWay(df, col("g"), col("v")).collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 6L)
    assert(out.getDouble(2) == 3.0)      // k0: equal sizes of 3
    assert(out.getDouble(3) == 13.5)     // MSB = SSB/(G-1) = 13.5/1
    assert(out.getDouble(4) == 1.0)      // MSW = 4/4
    assert(out.getDouble(5) == 0.806452) // 12.5/15.5
  }

  test("gumbel fit on maxima 1,2,3: sd 1, hand-checked beta/mu/return level") {
    val df = createDf(spark, "g string, v double",
      Seq(1, 2, 3).map(i => Seq[Any]("g", i.toDouble)))
    val out = Stats.gumbelFit(df, Seq("g"), col("v"), returnPeriod = 30)
      .collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == 2.0)       // mean
    assert(out.getDouble(3) == 1.0)       // sd
    assert(out.getDouble(4) == 0.779697)  // sqrt(6)/pi
    assert(out.getDouble(5) == 1.549947)  // 2 - gamma*beta
    assert(out.getDouble(6) == 4.18867)   // mu - beta*ln(-ln(29/30))
  }

  test("gumbel fit: constant maxima null out the fit columns") {
    val df = createDf(spark, "g string, v double",
      Seq.fill(3)(Seq[Any]("g", 5.0)))
    val out = Stats.gumbelFit(df, Seq("g"), col("v"), returnPeriod = 30)
      .collect().head
    assert(out.getDouble(2) == 5.0 && out.isNullAt(3) && out.isNullAt(6))
  }

  test("cramer-von mises: {1,2} vs {2,3} gives U=12 -> 12/256") {
    val df = createDf(spark, "s string, v double",
      Seq(Seq[Any]("a", 1.0), Seq[Any]("a", 2.0),
        Seq[Any]("b", 2.0), Seq[Any]("b", 3.0)))
    val out = Drift.cramerVonMisesGrouped(
        df.withColumn("seg", lit(0)), Seq("seg"),
        col("s") === "a", col("s") === "b", col("v"))
      .collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 0.046875)
  }

  test("log-log ols recovers the power law y = x^2 exactly at 6 dp") {
    val df = createDf(spark, "g string, x double, y double",
      Seq(2.0, 4.0, 8.0).map(x => Seq[Any]("g", x, x * x)))
    val out = Regression.groupOlsLogLog(df, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == 2.0) // elasticity
    assert(out.getDouble(3) == 0.0) // intercept
    assert(out.getDouble(4) == 1.0) // r2
    // non-positive rows drop rather than poison the logs
    val withZero = df.union(createDf(spark, "g string, x double, y double",
      Seq(Seq[Any]("g", 0.0, 5.0))))
    val out2 = Regression.groupOlsLogLog(withZero, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(out2.getLong(1) == 3L)
  }

  test("croston: sizes/gaps smooth separately; demands 4,6,8,10 at days 0,2,6,7") {
    // first nonzero has no gap and drops; trailing window covers the rest
    val df = createDf(spark, "g string, d int, z int",
      Seq(Seq[Any]("g", 0, 4), Seq[Any]("g", 2, 6), Seq[Any]("g", 6, 8),
        Seq[Any]("g", 7, 10), Seq[Any]("g", 9, 0))) // zero demand: not an arrival
    val out = Timeseries.croston(df, Seq("g"), col("d"), col("z")).collect().head
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == 8.857143) // (6 + 8*2 + 10*4)/7
    assert(out.getDouble(3) == 2.0)      // (2 + 4*2 + 1*4)/7
    assert(out.getDouble(4) == 4.428571) // z/p
  }

  test("capture-recapture: n1=3, n2=3, m=2 gives Chapman 4.33 +- 0.67") {
    val df = createDf(spark, "id int, s1 int, s2 int",
      Seq(Seq[Any](1, 1, 1), Seq[Any](2, 1, 0), Seq[Any](3, 0, 1),
        Seq[Any](4, 1, 1), Seq[Any](5, 0, 0),
        Seq[Any](1, 1, 1))) // duplicate sightings collapse per id
    val out = Stats.captureRecapture(df, col("id"),
      col("s1") === 1, col("s2") === 1).collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 3L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 4.333333) // (4*4)/3 - 1
    assert(out.getDouble(4) == 0.666667) // sqrt(16/36)
  }

  test("g-test on the 10/10/10/20 table: hand-checked G, dof 1") {
    val rows =
      Seq.fill(10)(Seq[Any]("a1", "b1")) ++ Seq.fill(10)(Seq[Any]("a1", "b2")) ++
        Seq.fill(10)(Seq[Any]("a2", "b1")) ++ Seq.fill(20)(Seq[Any]("a2", "b2"))
    val df = createDf(spark, "a string, b string", rows)
    val out = Stats.gTest(df, col("a"), col("b")).collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L && out.getLong(2) == 50L)
    assert(out.getLong(3) == 1L)
    assert(out.getDouble(4) == 1.384429)
  }

  test("stationary distribution: 2 exact integer power-iteration rounds") {
    // one user, sequence A A B A B B -> counts A->A 1, A->B 2, B->A 1, B->B 1
    val types = Seq("A", "A", "B", "A", "B", "B")
    val df = createDf(spark, "u int, ts int, id int, et string",
      types.zipWithIndex.map { case (t, i) => Seq[Any](1, i, i, t) })
    val out = graft.ops.Funnel.stationaryDistribution(df, "u", "ts", "id", "et",
        iterations = 2)
      .orderBy("state").collect()
    val byState = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byState("A") == 430555555554L) // trunc-div replay by hand
    assert(byState("B") == 569444444442L)
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.430556, 0.569444))
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L)) // tol=0: pays all rounds
  }

  test("stationary distribution convergence law: early exit = truncated full run") {
    val types = Seq("A", "A", "B", "A", "B", "B", "A", "C", "C", "A")
    val df = createDf(spark, "u int, ts int, id int, et string",
      types.zipWithIndex.map { case (t, i) => Seq[Any](1, i, i, t) })
    def run(iters: Int, tol: Long) =
      graft.ops.Funnel.stationaryDistribution(df, "u", "ts", "id", "et",
        iterations = iters, tolUnits = tol).orderBy("state").collect()
    val early = run(32, 1000L)
    val k = early.head.getLong(3).toInt
    assert(k < 32) // the chain must actually converge inside the budget
    // the early-exited vector IS the full run truncated at k rounds
    val replay = run(k, 0L)
    assert(early.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      replay.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // and one more round moves every state by < tol
    val next = run(k + 1, 0L)
    val prevBy = early.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(next.forall(r => math.abs(r.getLong(1) - prevBy(r.getString(0))) < 1000L))
  }

  test("granger lag-1: hand-checked closed-form b, c, F") {
    val y = Seq(1, 2, 1, 3, 2, 4).map(_.toDouble)
    val x = Seq(5, 1, 6, 1, 7, 2).map(_.toDouble)
    val df = createDf(spark, "k string, o int, y double, x double",
      y.indices.map(i => Seq[Any]("all", i, y(i), x(i))))
    val out = Timeseries.grangerLag1(df, Seq("k"), col("o"), col("y"), col("x"))
      .collect().head
    assert(out.getLong(1) == 5L)
    assert(out.getDouble(2) == 0.873134)  // b_y1
    assert(out.getDouble(3) == 0.507463)  // b_x1
    assert(out.getDouble(4) == 69.533835) // F(1, 2)
  }

  test("davies-bouldin: two 1-d clusters at 0/8 with spreads 1 and 3 give 0.5") {
    val df = createDf(spark, "id int, v array<long>",
      Seq(Seq[Any](1, Seq(0L)), Seq[Any](2, Seq(2L)),
        Seq[Any](3, Seq(10L)), Seq[Any](4, Seq(12L))))
    val out = graft.text.Cluster.daviesBouldin(df, "id", "v", k = 2, iters = 1)
      .collect().head
    assert(out.getLong(0) == 2L)
    assert(out.getDouble(1) == 0.5) // (1+3)/8 both ways
  }

  test("chow test: slopes 1.5/-0.5 around the break, hand-checked F") {
    val pts = Seq((1, 1.0), (2, 2.0), (3, 4.0), (4, 6.0), (5, 5.0), (6, 5.0))
    val df = createDf(spark, "g string, x int, y double",
      pts.map { case (x, y) => Seq[Any]("g", x, y) })
    val out = Timeseries.chowTest(df, Seq("g"), col("x"), col("y"),
      breakAt = 4L).collect().head
    assert(out.getLong(1) == 3L && out.getLong(2) == 3L)
    assert(out.getDouble(3) == 1.5)
    assert(out.getDouble(4) == -0.5)
    assert(out.getDouble(5) == 14.314286)
  }

  test("chow test: a perfect two-segment fit nulls F (no residual)") {
    val pts = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 6.0), (5, 5.0), (6, 4.0))
    val df = createDf(spark, "g string, x int, y double",
      pts.map { case (x, y) => Seq[Any]("g", x, y) })
    val out = Timeseries.chowTest(df, Seq("g"), col("x"), col("y"),
      breakAt = 4L).collect().head
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == -1.0)
    assert(out.isNullAt(5))
  }

  test("centroid silhouette: 1-d clusters at 0/8 give 0.833 and 0.733") {
    val df = createDf(spark, "id int, v array<long>",
      Seq(Seq[Any](1, Seq(0L)), Seq[Any](2, Seq(2L)),
        Seq[Any](3, Seq(10L)), Seq[Any](4, Seq(12L))))
    val out = graft.text.Cluster.centroidSilhouette(df, "id", "v", k = 2, iters = 1)
      .orderBy("cluster").collect()
    // centers after 1 round: [0] and [8]
    // cluster 0: s(0)=(8-0)/8=1, s(2)=(6-2)/6 -> mean 0.833333
    // cluster 1: s(10)=(10-2)/10, s(12)=(12-4)/12 -> mean 0.733333
    assert(out(0).getLong(1) == 2L && out(0).getDouble(2) == 0.833333)
    assert(out(1).getLong(1) == 2L && out(1).getDouble(2) == 0.733333)
  }

  test("hurst R/S: exact replay of the block algebra on a 16-point series") {
    val xs = (0 until 16).map(i => ((i * 7) % 5 + 1).toDouble)
    val df = createDf(spark, "o int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any](i, v) })
    val out = Timeseries.hurstRS(df, col("o"), col("v"),
      blockSizes = Seq(4, 8)).collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 6L)
    assert(out.getDouble(2) == 0.192049) // python replay of the exact algebra
  }

  test("arch lm: hand-replayed residual-squared regression; constant w nulls out") {
    val ys = Seq(1.0, 3.0, 1.0, 5.0, 5.0, 6.0, 8.0, 7.0)
    val df = createDf(spark, "g string, t int, y double",
      ys.zipWithIndex.map { case (y, i) => Seq[Any]("g", i + 1, y) })
    val out = Timeseries.archLm(df, Seq("g"), col("t"), col("y")).collect().head
    assert(out.getLong(1) == 7L)
    assert(out.getDouble(2) == 0.007675)
    assert(out.getDouble(3) == 0.053728)
    // alternating +-1 residuals square to a constant: zero variance -> null
    val flat = Seq(2.0, 1.0, 4.0, 3.0, 6.0, 5.0)
    val df2 = createDf(spark, "g string, t int, y double",
      flat.zipWithIndex.map { case (y, i) => Seq[Any]("g", i + 1, y) })
    val out2 = Timeseries.archLm(df2, Seq("g"), col("t"), col("y")).collect().head
    assert(out2.isNullAt(2) && out2.isNullAt(3))
  }

  test("tost: means 1 apart under margin 10 are provably equivalent") {
    val df = createDf(spark, "g string, v double",
      Seq(9, 10, 11).map(v => Seq[Any]("a", v.toDouble)) ++
        Seq(10, 11, 12).map(v => Seq[Any]("b", v.toDouble)))
    val out = Stats.tost(df, col("g") === "a", col("g") === "b",
      col("v"), margin = 10.0).collect().head
    assert(out.getDouble(2) == -1.0)       // mean diff
    assert(out.getDouble(3) == 0.816497)   // welch se
    assert(out.getDouble(4) == 11.022704)  // t_lower
    assert(out.getDouble(5) == 13.472194)  // t_upper
    assert(out.getBoolean(6))
  }

  test("cook's distance: the off-trend endpoint dominates, hand-checked") {
    val ys = Seq(2.0, 4.0, 6.0, 8.0, 10.0, 30.0)
    val df = createDf(spark, "g string, x int, y double",
      ys.zipWithIndex.map { case (y, i) => Seq[Any]("g", i + 1, y) })
    val out = Regression.cooksTopK(df, Seq("g"), col("x"), col("y"), k = 3)
      .orderBy(desc("cooks_d")).collect()
    assert(out.length == 3)
    val top = out.head
    assert(top.getDouble(1) == 6.0)        // the outlier day
    assert(top.getDouble(2) == 8.571429)   // residual
    assert(top.getDouble(3) == 0.52381)    // leverage
    assert(top.getDouble(4) == 2.2)        // cook's D
    assert(out(1).getDouble(4) == 0.362308 && out(2).getDouble(4) == 0.352)
  }

  test("mahalanobis top-k: the off-ridge point wins despite in-range axes") {
    val df = createDf(spark, "k1 int, k2 int, x double, y double",
      Seq((1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 3.0), (4, 10.0, 1.0))
        .map { case (k, x, y) => Seq[Any](k, 0, x, y) })
    val out = Outliers.mahalanobisTopK(df, Seq("k1", "k2"),
      col("x"), col("y"), k = 2).collect()
    assert(out.head.getDouble(2) == 10.0 && out.head.getDouble(4) == 2.25)
    assert(out(1).getDouble(4) == 1.75)
  }

  test("page's L: perfectly increasing ranks hit the maximum, z = 2") {
    val rows = for (b <- Seq(1, 2); (t, v) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0)))
      yield Seq[Any](b, t, v)
    val df = createDf(spark, "b int, t string, v double", rows)
    val out = Stats.pageTrend(df, col("b"), col("t"), col("v")).collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L)
    assert(out.getDouble(2) == 28.0) // L_max = m * sum(j^2)
    assert(out.getDouble(3) == 2.0)  // (28-24)/sqrt(4)
  }

  test("storey pi0: nulls excluded, cap at 1") {
    val df = createDf(spark, "id int, p double",
      Seq(Seq[Any](1, 0.1), Seq[Any](2, 0.2), Seq[Any](3, 0.3),
        Seq[Any](4, 0.8), Seq[Any](5, null)))
    val out = Stats.storeyPi0(df, col("p")).collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 1L)
    assert(out.getDouble(2) == 0.5) // 1/(0.5*4)
    val high = createDf(spark, "id int, p double",
      Seq(Seq[Any](1, 0.6), Seq[Any](2, 0.9)))
    assert(Stats.storeyPi0(high, col("p")).collect().head.getDouble(2) == 1.0)
  }

  test("mattr: 'a b a b c' over window 3 averages 7/9; short docs drop") {
    val df = createDf(spark, "doc_id int, text string",
      Seq(Seq[Any](1, "a b a b c"), Seq[Any](2, "a b")))
    val out = graft.text.TextStats.mattr(df, "doc_id", "text", window = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(0) == 1 && r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.777778) // (2+2+3)/3/3
  }

  test("jonckheere: ordered groups {1,2},{2,3},{4} give J=7.5, hand z") {
    val df = createDf(spark, "g string, v double",
      Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0), ("C", 4.0))
        .map { case (g, v) => Seq[Any](g, v) })
    val out = Stats.jonckheereTerpstra(df, col("g"), col("v")).collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 5L)
    assert(out.getDouble(2) == 7.5)      // 3.5 + 2 + 2 (tie counts half)
    assert(out.getDouble(3) == 1.827815) // (7.5-4)/sqrt(11/3)
  }

  test("bowker: asymmetric flows accumulate (f-r)^2/(f+r) per pair") {
    val flows = Seq(("a", "b", 5), ("b", "a", 2), ("a", "c", 3),
      ("c", "a", 3), ("b", "c", 1), ("a", "a", 9))
    val rows = flows.flatMap { case (x, y, n) => Seq.fill(n)(Seq[Any](x, y)) }
    val df = createDf(spark, "x string, y string", rows)
    val out = Stats.bowker(df, col("x"), col("y")).collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 3L) // loops drop
    assert(out.getDouble(2) == 2.285714) // 9/7 + 0 + 1
  }

  test("round-10 ops are invariant to input partitioning") {
    val df = createDf(spark, "g string, e int, v double",
      (0 until 400).map(i => Seq[Any](s"g${i % 2}", i % 37, (i % 11 + 1).toDouble)))
    def run(d: org.apache.spark.sql.DataFrame) = Seq(
      Stats.inequality(d, Seq("g"), "e", col("v")).orderBy("g").collect().toSeq,
      Stats.lorenzDeciles(d, Seq("g"), "e", col("v"))
        .orderBy("g", "decile").collect().toSeq,
      Stats.poissonDispersion(d, Seq("g"), col("v")).orderBy("g").collect().toSeq)
    assert(run(df.coalesce(1)) == run(df.repartition(7)))
    val ed = createDf(spark, "a int, b int",
      (0 until 300).map(i => Seq[Any](i % 23, (i * 7 + 3) % 23)))
    def runG(d: org.apache.spark.sql.DataFrame) = Seq(
      Graph.degreeAssortativity(d, "a", "b").collect().toSeq,
      Graph.localClustering(d, "a", "b").orderBy("node").collect().toSeq,
      Graph.reciprocity(d, "a", "b").collect().toSeq)
    assert(runG(ed.coalesce(1)) == runG(ed.repartition(7)))
  }
}
