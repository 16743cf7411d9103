package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class NonparamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def kw(rows: Seq[(String, Double)]) = {
    val df = createDf(spark, "l string, v double",
      rows.map { case (l, v) => Seq[Any](l, v) })
      .withColumn("seg", lit(0))
    Stats.kruskalWallis(df, Seq("seg"), col("l"), col("v")).head()
  }

  test("kruskalWallis: hand-checked untied 3-group H") {
    // a=[1,2] b=[3,4] c=[5,6]: ranks 1..6, R=(3,7,11)
    // H = 12/42 * (9/2+49/2+121/2) - 21 = 4.571429, no ties
    val r = kw(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 3.0, "b" -> 4.0,
      "c" -> 5.0, "c" -> 6.0))
    assert(r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 0L)
    assert(r.getDouble(4) == 4.571429)
    assert(r.getDouble(5) == 4.571429)
  }

  test("kruskalWallis: ties shrink H and the correction restores it") {
    // a=[1,1] b=[1,2]: value 1 has avg rank 2 (t=3), value 2 rank 4
    // R_a=4, R_b=6 -> H = 0.6; C = 1 - 24/60 = 0.6 -> h_tie = 1.0
    val r = kw(Seq("a" -> 1.0, "a" -> 1.0, "b" -> 1.0, "b" -> 2.0))
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 24L)
    assert(r.getDouble(4) == 0.6)
    assert(r.getDouble(5) == 1.0)
  }

  test("kruskalWallis: a single level gives null H; all-tied values null h_tie") {
    val one = kw(Seq("a" -> 1.0, "a" -> 2.0))
    assert(one.getLong(1) == 1L && one.isNullAt(4) && one.isNullAt(5))
    val tied = kw(Seq("a" -> 5.0, "a" -> 5.0, "b" -> 5.0))
    assert(tied.getDouble(4) == 0.0 || tied.isNullAt(4))
    assert(tied.isNullAt(5))
  }

  test("kruskalWallis: invariant to partitioning") {
    val rows = (0 until 300).map(i => Seq[Any](s"l${i % 4}", (i * 37 % 23).toDouble))
    val df = createDf(spark, "l string, v double", rows).withColumn("seg", lit(0))
    val one = Stats.kruskalWallis(df.coalesce(1), Seq("seg"), col("l"), col("v")).head()
    val many = Stats.kruskalWallis(df.repartition(13), Seq("seg"), col("l"), col("v")).head()
    assert(one == many)
  }

  test("jarqueBera: symmetric ramp has skew 0, hand-checked kurtosis and JB") {
    // v=[1..5]: sd = sqrt(2.5), z4 sum = 5.44 -> K = 1.088
    // JB = 5/6 * (0 + (1.088-3)^2/4) = 0.761613
    val df = createDf(spark, "g string, v double",
      (1 to 5).map(i => Seq[Any]("a", i.toDouble)))
    val r = Stats.jarqueBera(df, Seq("g"), col("v")).head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 1.088)
    assert(r.getDouble(4) == 0.761613)
  }

  test("jarqueBera: right-skewed data shows positive skew; constant column nulls out") {
    val df = createDf(spark, "g string, v double",
      (Seq.fill(8)(0.0) :+ 10.0 :+ 12.0).map(v => Seq[Any]("a", v)) ++
        (1 to 4).map(_ => Seq[Any]("c", 7.0)))
    val got = Stats.jarqueBera(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(2) > 1.0)
    assert(got("a").getDouble(4) > 0.0)
    assert(got("c").isNullAt(2) && got("c").isNullAt(4))
  }

  test("jarqueBera: invariant to partitioning") {
    val rows = (0 until 400).map(i =>
      Seq[Any](s"g${i % 3}", ((i * 31) % 17).toDouble / 3.0))
    val df = createDf(spark, "g string, v double", rows)
    val one = Stats.jarqueBera(df.coalesce(1), Seq("g"), col("v"))
      .orderBy(col("g")).collect().toSeq
    val many = Stats.jarqueBera(df.repartition(11), Seq("g"), col("v"))
      .orderBy(col("g")).collect().toSeq
    assert(one == many)
  }

  test("bartlett: equal variances give chi2 0 and the pooled variance") {
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "b" -> 4.0, "b" -> 5.0, "b" -> 6.0)
        .map { case (g, v) => Seq[Any](g, v) })
    val r = Stats.bartlett(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("bartlett: unequal variances produce the hand-checked chi2 band") {
    // a var 1, b var 16: chi2 = [4 ln 8.5 - 2 ln 16] / 1.25 = 2.41207
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "b" -> 0.0, "b" -> 4.0, "b" -> 8.0)
        .map { case (g, v) => Seq[Any](g, v) })
    val r = Stats.bartlett(df, col("g"), col("v")).head()
    assert(r.getDouble(2) == 8.5)
    assert(math.abs(r.getDouble(3) - 2.41207) < 1e-4, r.getDouble(3).toString)
  }

  test("bartlett: singleton levels drop; a zero-variance level nulls chi2") {
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "b" -> 9.0)
        .map { case (g, v) => Seq[Any](g, v) })
    val r = Stats.bartlett(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 1L && r.isNullAt(3))
    val zv = createDf(spark, "g string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "c" -> 5.0, "c" -> 5.0)
        .map { case (g, v) => Seq[Any](g, v) })
    val r2 = Stats.bartlett(zv, col("g"), col("v")).head()
    assert(r2.getLong(0) == 2L && r2.isNullAt(3))
  }

  test("bartlett: invariant to partitioning") {
    val rows = (0 until 300).map(i =>
      Seq[Any](s"g${i % 3}", ((i * 13) % 29).toDouble / 7.0))
    val df = createDf(spark, "g string, v double", rows)
    val one = Stats.bartlett(df.coalesce(1), col("g"), col("v")).head()
    val many = Stats.bartlett(df.repartition(9), col("g"), col("v")).head()
    assert(one == many)
  }

  test("cochranQ: hand-checked 4-subject 3-treatment Q") {
    // T=(4,2,1), S=7: num = (3*21-49)*2 = 28; R=(2,1,3,1): den = 21-15 = 6
    val df = createDf(spark, "a boolean, b boolean, c boolean",
      Seq(Seq[Any](true, true, false), Seq[Any](true, false, false),
        Seq[Any](true, true, true), Seq[Any](true, false, false)))
    val r = Stats.cochranQ(df, Seq(col("a"), col("b"), col("c"))).head()
    assert(r.getLong(0) == 4L && r.getInt(1) == 3)
    assert(r.getDouble(2) == 4.666667)
  }

  test("cochranQ: all-equal rows give zero denominator -> null; null items drop") {
    val df = createDf(spark, "a boolean, b boolean, c boolean",
      Seq(Seq[Any](true, true, true), Seq[Any](false, false, false),
        Seq[Any](true, null, true)))
    val r = Stats.cochranQ(df, Seq(col("a"), col("b"), col("c"))).head()
    assert(r.getLong(0) == 2L)
    assert(r.isNullAt(2))
  }

  test("cronbachAlpha: identical items give alpha 1; cancelling items null it") {
    val same = createDf(spark, "x double, y double",
      Seq(1.0, 2.0, 3.0).map(v => Seq[Any](v, v)))
    val r = Stats.cronbachAlpha(same, Seq(col("x"), col("y"))).head()
    assert(r.getLong(0) == 3L && r.getInt(1) == 2)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 1.0)
    val opp = createDf(spark, "x double, y double",
      Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).map { case (a, b) => Seq[Any](a, b) })
    val r2 = Stats.cronbachAlpha(opp, Seq(col("x"), col("y"))).head()
    assert(r2.getDouble(2) == 2.0 && r2.getDouble(3) == 0.0)
    assert(r2.isNullAt(4))
  }

  test("cronbachAlpha: invariant to partitioning") {
    val rows = (0 until 200).map(i => Seq[Any](
      (i % 13).toDouble, ((i * 7) % 11).toDouble, ((i * 3) % 17).toDouble))
    val df = createDf(spark, "x double, y double, z double", rows)
    val items = Seq(col("x"), col("y"), col("z"))
    val one = Stats.cronbachAlpha(df.coalesce(1), items).head()
    val many = Stats.cronbachAlpha(df.repartition(7), items).head()
    assert(one == many)
  }

  private def fr(rows: Seq[(String, String, Double)]) = {
    val df = createDf(spark, "b string, t string, v double",
      rows.map { case (b, t, v) => Seq[Any](b, t, v) })
    Stats.friedman(df, col("b"), col("t"), col("v")).head()
  }

  test("friedman: perfect concordance over 3 blocks hits the k=3 maximum 6.0") {
    val rows = for (b <- Seq("b1", "b2", "b3"); (t, v) <- Seq("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
      yield (b, t, v)
    val r = fr(rows)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 6.0)
  }

  test("friedman: within-block ties shrink chi2 and the correction restores it") {
    // b1: a=b=1 (rank 1.5 each), c=2; b2 untied: chi2 = 3.25, C = 0.875
    val r = fr(Seq(("b1", "a", 1.0), ("b1", "b", 1.0), ("b1", "c", 2.0),
      ("b2", "a", 1.0), ("b2", "b", 2.0), ("b2", "c", 3.0)))
    assert(r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 3.25)
    assert(r.getDouble(4) == 3.714286)
  }

  test("friedman: incomplete blocks drop from the design") {
    val complete = fr(Seq(("b1", "a", 1.0), ("b1", "b", 2.0), ("b1", "c", 3.0),
      ("b2", "a", 2.0), ("b2", "b", 1.0), ("b2", "c", 3.0)))
    val withPartial = fr(Seq(("b1", "a", 1.0), ("b1", "b", 2.0), ("b1", "c", 3.0),
      ("b2", "a", 2.0), ("b2", "b", 1.0), ("b2", "c", 3.0),
      ("b3", "a", 9.0), ("b3", "b", 4.0)))
    assert(withPartial == complete)
    assert(withPartial.getLong(1) == 2L)
  }

  test("friedman: invariant to partitioning") {
    val rows = (0 until 240).map { i =>
      Seq[Any](s"b${i / 4}", s"t${i % 4}", ((i * 31) % 19).toDouble)
    }
    val df = createDf(spark, "b string, t string, v double", rows)
    val one = Stats.friedman(df.coalesce(1), col("b"), col("t"), col("v")).head()
    val many = Stats.friedman(df.repartition(11), col("b"), col("t"), col("v")).head()
    assert(one == many)
  }

  test("cohenH: hand-checked arcsine effect — 0.5 vs 0.25 gives pi/6") {
    val df = createDf(spark, "g string, y boolean",
      Seq(("a", true), ("a", true), ("a", false), ("a", false),
        ("b", true), ("b", false), ("b", false), ("b", false))
        .map { case (g, y) => Seq[Any](g, y) })
    val r = Stats.cohenH(df, col("g") === "a", col("g") === "b", col("y")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == BigDecimal(math.Pi / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cohenH: equal rates give 0; an empty side nulls h") {
    val eq = createDf(spark, "g string, y boolean",
      Seq(("a", true), ("a", false), ("b", true), ("b", false))
        .map { case (g, y) => Seq[Any](g, y) })
    assert(Stats.cohenH(eq, col("g") === "a", col("g") === "b", col("y"))
      .head().getDouble(4) == 0.0)
    val solo = createDf(spark, "g string, y boolean",
      Seq(("a", true)).map { case (g, y) => Seq[Any](g, y) })
    assert(Stats.cohenH(solo, col("g") === "a", col("g") === "b", col("y"))
      .head().isNullAt(4))
  }

  test("partialCorrelation: controlling the shared component recovers the identity") {
    // y = x + z with x orthogonal to z: r_xy = 0.707, but r_xy.z = 1
    val df = createDf(spark, "x double, y double, z double",
      Seq((1.0, 2.0, 1.0), (2.0, 3.0, 1.0), (1.0, 3.0, 2.0), (2.0, 4.0, 2.0))
        .map { case (x, y, z) => Seq[Any](x, y, z) })
    val r = Stats.partialCorrelation(df, col("x"), col("y"), col("z")).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.707107)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.707107)
    assert(r.getDouble(4) == 1.0)
  }

  test("partialCorrelation: a perfect control nulls the partial; invariant to partitioning") {
    val degen = createDf(spark, "x double, y double, z double",
      Seq((1.0, 5.0, 5.0), (2.0, 7.0, 7.0), (3.0, 6.0, 6.0))
        .map { case (x, y, z) => Seq[Any](x, y, z) })
    assert(Stats.partialCorrelation(degen, col("x"), col("y"), col("z"))
      .head().isNullAt(4))
    val rows = (0 until 300).map(i => Seq[Any](
      (i % 13).toDouble, ((i * 7) % 11).toDouble, ((i * 3) % 17).toDouble))
    val df = createDf(spark, "x double, y double, z double", rows)
    val one = Stats.partialCorrelation(df.coalesce(1), col("x"), col("y"), col("z")).head()
    val many = Stats.partialCorrelation(df.repartition(9), col("x"), col("y"), col("z")).head()
    assert(one == many)
  }

  test("oddsRatioByStratum: OR 1 with a symmetric CI; zero cells degrade gracefully") {
    val df = strataDf(Seq(("s1", 10, 10, 10, 10), ("s2", 0, 10, 10, 10)))
    val got = Stats.oddsRatioByStratum(df, col("s"), col("e"), col("o"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = got("s1")
    assert(s1.getDouble(5) == 1.0)
    assert(s1.getDouble(6) < 1.0 && s1.getDouble(7) > 1.0)
    assert(math.abs(s1.getDouble(6) * s1.getDouble(7) - 1.0) < 1e-5)
    val s2 = got("s2")
    assert(s2.getDouble(5) == 0.0)
    assert(s2.isNullAt(6) && s2.isNullAt(7))
  }

  test("yuenT: hand-checked trimmed t ignores the planted outliers") {
    // a=[0,10,11,12,100], b=[5,15,16,17,105], trim 1/5: k=1, h=3
    // tm = 11 vs 16; d_a = d_b = 2/3 -> t = -5/sqrt(4/3), df = 4
    val rows = Seq(0.0, 10.0, 11.0, 12.0, 100.0).map(v => Seq[Any]("a", v)) ++
      Seq(5.0, 15.0, 16.0, 17.0, 105.0).map(v => Seq[Any]("b", v))
    val df = createDf(spark, "g string, v double", rows)
    val r = Stats.yuenT(df, col("g") === "a", col("g") === "b", col("v"),
      trimNum = 1, trimDen = 5).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 11.0 && r.getDouble(5) == 16.0)
    assert(r.getDouble(6) == -4.330127)
    assert(r.getDouble(7) == 4.0)
  }

  test("yuenT: zero winsorized variance nulls t; partitioning-invariant") {
    val flat = createDf(spark, "g string, v double",
      (Seq.fill(5)(3.0).map(v => Seq[Any]("a", v)) ++
        Seq.fill(5)(7.0).map(v => Seq[Any]("b", v))))
    val r = Stats.yuenT(flat, col("g") === "a", col("g") === "b", col("v"),
      1, 5).head()
    assert(r.isNullAt(6))
    val rows = (0 until 400).map(i =>
      Seq[Any](if (i % 2 == 0) "p" else "c", ((i * 37) % 101).toDouble / 3.0))
    val df = createDf(spark, "g string, v double", rows)
    val one = Stats.yuenT(df.coalesce(1), col("g") === "p", col("g") === "c",
      col("v"), 1, 5).head()
    val many = Stats.yuenT(df.repartition(13), col("g") === "p", col("g") === "c",
      col("v"), 1, 5).head()
    assert(one == many)
  }

  test("kendallW: perfect concordance gives W 1; W replays chi2_tie/(m(k-1))") {
    val rows = for (b <- Seq("b1", "b2", "b3");
                    (t, v) <- Seq("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
      yield Seq[Any](b, t, v)
    val df = createDf(spark, "b string, t string, v double", rows)
    val w = Stats.kendallW(df, col("b"), col("t"), col("v")).head()
    assert(w.getLong(0) == 3L && w.getLong(1) == 3L)
    assert(w.getDouble(2) == 1.0)
    // tied case: W must equal the friedman identity off the same frame
    val tied = createDf(spark, "b string, t string, v double",
      Seq(("b1", "a", 1.0), ("b1", "b", 1.0), ("b1", "c", 2.0),
        ("b2", "a", 1.0), ("b2", "b", 2.0), ("b2", "c", 3.0))
        .map { case (b, t, v) => Seq[Any](b, t, v) })
    val f = Stats.friedman(tied, col("b"), col("t"), col("v")).head()
    val exp = BigDecimal(f.getDouble(4) / (f.getLong(1) * (f.getLong(0) - 1)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(Stats.kendallW(tied, col("b"), col("t"), col("v")).head().getDouble(2) == exp)
  }

  test("cochranArmitage: hand-checked perfect dose response gives z 2") {
    // scores 0,1,2 with success rates 0, 0.5, 1 over n=2 each:
    // A=12, inner=24, B=216 -> z = 12*sqrt(6)/sqrt(216) = 2 exactly
    val df = createDf(spark, "s double, y boolean",
      Seq((0, false), (0, false), (1, true), (1, false), (2, true), (2, true))
        .map { case (s, y) => Seq[Any](s.toDouble, y) })
    val r = Stats.cochranArmitage(df, col("s"), col("y")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 4.0)
  }

  test("cochranArmitage: reversed trend flips the sign; degenerate cases null") {
    val rev = createDf(spark, "s double, y boolean",
      Seq((0, true), (0, true), (1, true), (1, false), (2, false), (2, false))
        .map { case (s, y) => Seq[Any](s.toDouble, y) })
    assert(Stats.cochranArmitage(rev, col("s"), col("y")).head().getDouble(3) == -2.0)
    val allWin = createDf(spark, "s double, y boolean",
      Seq((0, true), (1, true)).map { case (s, y) => Seq[Any](s.toDouble, y) })
    assert(Stats.cochranArmitage(allWin, col("s"), col("y")).head().isNullAt(3))
    val oneLevel = createDf(spark, "s double, y boolean",
      Seq((1, true), (1, false)).map { case (s, y) => Seq[Any](s.toDouble, y) })
    assert(Stats.cochranArmitage(oneLevel, col("s"), col("y")).head().isNullAt(3))
  }

  private def strataDf(counts: Seq[(String, Int, Int, Int, Int)]) = {
    val rows = counts.flatMap { case (s, a, b, c, d) =>
      Seq.fill(a)(Seq[Any](s, true, true)) ++ Seq.fill(b)(Seq[Any](s, true, false)) ++
        Seq.fill(c)(Seq[Any](s, false, true)) ++ Seq.fill(d)(Seq[Any](s, false, false))
    }
    createDf(spark, "s string, e boolean, o boolean", rows)
  }

  test("breslowDay: identical strata share their OR -> chi2 0") {
    val df = strataDf(Seq(("s1", 10, 10, 10, 10), ("s2", 10, 10, 10, 10)))
    val r = Stats.breslowDay(df, col("s"), col("e"), col("o")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 80L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("breslowDay: heterogeneous ORs produce a large chi2; zero-margin strata drop") {
    val df = strataDf(Seq(("s1", 10, 10, 10, 10), ("s2", 20, 5, 5, 20),
      ("s3", 7, 3, 0, 0)))
    val r = Stats.breslowDay(df, col("s"), col("e"), col("o")).head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(3) > 3.0, r.getDouble(3).toString)
  }

  test("breslowDay: invariant to partitioning") {
    val df = strataDf(Seq(("s1", 12, 7, 9, 14), ("s2", 3, 11, 8, 6),
      ("s3", 9, 9, 2, 13)))
    val one = Stats.breslowDay(df.coalesce(1), col("s"), col("e"), col("o")).head()
    val many = Stats.breslowDay(df.repartition(7), col("s"), col("e"), col("o")).head()
    assert(one == many)
  }

  test("ljungBox: replays n(n+2)*sum(acf^2/np) off the ACF table; ramp is loud") {
    val df = createDf(spark, "g string, o int, v double",
      (1 to 20).map(i => Seq[Any]("a", i, i.toDouble)))
    val acf = Timeseries.autocorrelation(df, Seq("g"), col("o"), col("v"), 4)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    val expT = acf.map { case (np, a) =>
      math.round(a * a / np.toDouble * 1e9)
    }.sum
    val expQ = BigDecimal(20.0 * 22.0 * (expT.toDouble / 1e9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Timeseries.ljungBox(df, Seq("g"), col("o"), col("v"), 4).head()
    assert(r.getLong(1) == 20L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == expQ, s"got ${r.getDouble(3)} want $expQ")
    assert(r.getDouble(3) > 9.49) // chi2(4) 5% critical value: a ramp is not noise
  }

  test("dunnTest: hand-checked pairwise z off the shared ranking") {
    // a=[1,2] b=[3,4] c=[5,6]: mean ranks 1.5/3.5/5.5, sigma2 = 3.5
    val df = createDf(spark, "l string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "b" -> 3.0, "b" -> 4.0, "c" -> 5.0, "c" -> 6.0)
        .map { case (l, v) => Seq[Any](l, v) })
    val rows = Stats.dunnTest(df, col("l"), col("v"))
      .orderBy(col("level_a"), col("level_b")).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(rows(0).getDouble(4) == 1.5 && rows(0).getDouble(5) == 3.5)
    assert(rows(0).getDouble(6) == -1.069045)
    assert(rows(1).getDouble(6) == -2.13809)
    assert(rows(2).getDouble(6) == -1.069045)
  }

  test("dunnTest: all-tied values null every z; partitioning-invariant") {
    val tied = createDf(spark, "l string, v double",
      Seq("a" -> 5.0, "a" -> 5.0, "b" -> 5.0, "b" -> 5.0)
        .map { case (l, v) => Seq[Any](l, v) })
    assert(Stats.dunnTest(tied, col("l"), col("v")).collect().forall(_.isNullAt(6)))
    val rows = (0 until 300).map(i => Seq[Any](s"l${i % 4}", (i * 37 % 23).toDouble))
    val df = createDf(spark, "l string, v double", rows)
    val one = Stats.dunnTest(df.coalesce(1), col("l"), col("v"))
      .orderBy(col("level_a"), col("level_b")).collect().toSeq
    val many = Stats.dunnTest(df.repartition(13), col("l"), col("v"))
      .orderBy(col("level_a"), col("level_b")).collect().toSeq
    assert(one == many)
  }

  test("krippendorffAlpha: hand-worked 2-item table gives alpha 0.375") {
    // AAA + ABB: A=8, D_o=1/3; B=14, D_e=16/30; alpha = 1 - 0.625
    val df = createDf(spark, "id int, r0 string, r1 string, r2 string",
      Seq(Seq[Any](1, "A", "A", "A"), Seq[Any](2, "A", "B", "B")))
    val r = Stats.krippendorffAlpha(df, col("id"),
      Seq(col("r0"), col("r1"), col("r2"))).head()
    assert(r.getLong(0) == 2L && r.getInt(1) == 3)
    assert(r.getDouble(2) == 0.333333)
    assert(r.getDouble(3) == 0.533333)
    assert(r.getDouble(4) == 0.375)
  }

  test("krippendorffAlpha: unanimity gives 1; one category everywhere nulls out") {
    val uni = createDf(spark, "id int, r0 string, r1 string, r2 string",
      Seq(Seq[Any](1, "A", "A", "A"), Seq[Any](2, "B", "B", "B")))
    val r = Stats.krippendorffAlpha(uni, col("id"),
      Seq(col("r0"), col("r1"), col("r2"))).head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 1.0)
    val const = createDf(spark, "id int, r0 string, r1 string, r2 string",
      Seq(Seq[Any](1, "x", "x", "x"), Seq[Any](2, "x", "x", "x")))
    val r2 = Stats.krippendorffAlpha(const, col("id"),
      Seq(col("r0"), col("r1"), col("r2"))).head()
    assert(r2.getDouble(3) == 0.0 && r2.isNullAt(4))
  }

  test("moodMedianTest: hand-checked split around the lower median") {
    // a=[1,2,3] b=[4,5,6]: med=3, above=(0,3), chi2 = 3+3 = 6
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "b" -> 4.0, "b" -> 5.0, "b" -> 6.0)
        .map { case (g, v) => Seq[Any](g, v) })
    val r = Stats.moodMedianTest(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 6.0)
  }

  test("moodMedianTest: degenerate cut nulls chi2; partitioning-invariant") {
    val same = createDf(spark, "g string, v double",
      Seq("a" -> 7.0, "a" -> 7.0, "b" -> 7.0)
        .map { case (g, v) => Seq[Any](g, v) })
    assert(Stats.moodMedianTest(same, col("g"), col("v")).head().isNullAt(3))
    val rows = (0 until 300).map(i => Seq[Any](s"g${i % 3}", ((i * 37) % 23).toDouble))
    val df = createDf(spark, "g string, v double", rows)
    val one = Stats.moodMedianTest(df.coalesce(1), col("g"), col("v")).head()
    val many = Stats.moodMedianTest(df.repartition(13), col("g"), col("v")).head()
    assert(one == many)
  }

  test("ljungBox: constant series and too-short series null out") {
    val const = createDf(spark, "g string, o int, v double",
      (1 to 10).map(i => Seq[Any]("a", i, 5.0)))
    assert(Timeseries.ljungBox(const, Seq("g"), col("o"), col("v"), 3).head().isNullAt(3))
    val short = createDf(spark, "g string, o int, v double",
      (1 to 3).map(i => Seq[Any]("a", i, i.toDouble)))
    assert(Timeseries.ljungBox(short, Seq("g"), col("o"), col("v"), 5).head().isNullAt(3))
  }
}
