package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class Round9StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("effectSize: hand-checked Cohen's d and Hedges' g") {
    // a=[1,2,3], b=[4,5,6]: means 2 and 5, both variances 1 -> pooled sd 1
    // d = -3; g = -3 * (1 - 3/(4*6-9)) = -3 * 0.8 = -2.4
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5, "b" -> 6)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.effectSize(df, col("g") === "a", col("g") === "b", col("v")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == -3.0)
    assert(r.getDouble(6) == -2.4)
  }

  test("effectSize: zero pooled variance or 1-row side nulls d/g") {
    val const = createDf(spark, "g string, v double",
      Seq("a" -> 2, "a" -> 2, "b" -> 2, "b" -> 2)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.effectSize(const, col("g") === "a", col("g") === "b", col("v")).head()
    assert(r.isNullAt(5) && r.isNullAt(6))
    val tiny = createDf(spark, "g string, v double",
      Seq(Seq[Any]("a", 1.0), Seq[Any]("b", 2.0), Seq[Any]("b", 4.0)))
    val t = Stats.effectSize(tiny, col("g") === "a", col("g") === "b", col("v")).head()
    assert(t.isNullAt(5))
  }

  test("leveneBrownForsythe: hand-checked W on median absolute deviations") {
    // a=[1,2,3]: med 2, z=[1,0,1]; b=[10,20,30]: med 20, z=[10,0,10]
    // z-means 2/3 and 20/3, grand 11/3; SSB=54, SSW=202/3
    // W = (54/1)/(202/3/4) = 648/202 = 3.207921
    val df = createDf(spark, "g string, v double",
      (Seq(1, 2, 3).map(v => "a" -> v) ++ Seq(10, 20, 30).map(v => "b" -> v))
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.leveneBrownForsythe(df, col("g"), col("v")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(4) - 648.0 / 202.0) < 1e-5)
  }

  test("leveneBrownForsythe: equal spreads give W = 0") {
    // both groups have identical |x - med| multisets
    val df = createDf(spark, "g string, v double",
      (Seq(1.0, 2.0, 3.0).map(v => "a" -> v) ++ Seq(11.0, 12.0, 13.0).map(v => "b" -> v))
        .map { case (g, v) => Seq[Any](g, v) })
    val r = Stats.leveneBrownForsythe(df, col("g"), col("v")).head()
    assert(r.getDouble(4) == 0.0)
  }

  test("pairedT: hand-checked t over per-key mean differences; unpaired keys drop") {
    // pairs d = [1, 2, 1, 2]: mean 1.5, sd = sqrt(1/3), t = 1.5/(sd/2) = 5.196152
    val rows = Seq(
      (1, "a", 2.0), (1, "b", 1.0),
      (2, "a", 4.0), (2, "b", 2.0),
      (3, "a", 3.0), (3, "b", 2.0),
      (4, "a", 5.0), (4, "b", 3.0),
      (5, "a", 9.0)) // unpaired: must not count
    val df = createDf(spark, "k int, g string, v double",
      rows.map { case (k, g, v) => Seq[Any](k, g, v) })
    val r = Stats.pairedT(df, col("k"), col("g") === "a", col("g") === "b", col("v")).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 1.5)
    assert(math.abs(r.getDouble(2) - math.sqrt(1.0 / 3.0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - 5.196152) < 1e-6)
  }

  test("pairedT: constant differences give null t (no variance)") {
    val df = createDf(spark, "k int, g string, v double",
      (1 to 3).flatMap(k => Seq(Seq[Any](k, "a", k + 1.0), Seq[Any](k, "b", k.toDouble))))
    val r = Stats.pairedT(df, col("k"), col("g") === "a", col("g") === "b", col("v")).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 1.0 && r.isNullAt(3))
  }

  test("binaryAuc: perfect separation = 1, reversal = 0, all-tied = 0.5, hand-checked mix") {
    def auc(pos: Seq[Double], neg: Seq[Double]): Double = {
      val df = createDf(spark, "y int, s double",
        pos.map(v => Seq[Any](1, v)) ++ neg.map(v => Seq[Any](0, v)))
      Stats.binaryAuc(df, col("y") === 1, col("s")).head().getDouble(2)
    }
    assert(auc(Seq(0.8, 0.9), Seq(0.1, 0.2)) == 1.0)
    assert(auc(Seq(0.1, 0.2), Seq(0.8, 0.9)) == 0.0)
    assert(auc(Seq(0.5, 0.5), Seq(0.5, 0.5)) == 0.5)
    // pos=[0.9, 0.4], neg=[0.6, 0.2]: pairs won 3 of 4 -> 0.75
    assert(auc(Seq(0.9, 0.4), Seq(0.6, 0.2)) == 0.75)
    // a tie counts half: pos=[0.9, 0.5], neg=[0.5, 0.2] -> (1+1+0.5+1)/4
    assert(auc(Seq(0.9, 0.5), Seq(0.5, 0.2)) == 0.875)
  }

  test("durbinWatson: hand-checked DW; perfect fit and 1-row groups null out") {
    // g=1: x=[1,2,3], y=[1,2,4]: e = [1/6, -1/3, 1/6] -> DW = 0.5/(1/6) = 3
    // g=2: y = 2x exactly -> residuals 0 -> null
    // g=3: single row -> null
    val df = createDf(spark, "g int, x double, y double", Seq(
      Seq[Any](1, 1.0, 1.0), Seq[Any](1, 2.0, 2.0), Seq[Any](1, 3.0, 4.0),
      Seq[Any](2, 1.0, 2.0), Seq[Any](2, 2.0, 4.0), Seq[Any](2, 3.0, 6.0),
      Seq[Any](3, 5.0, 5.0)))
    val got = Stats.durbinWatson(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getLong(1) == 3L && math.abs(got(1).getDouble(2) - 3.0) < 1e-6)
    assert(got(2).isNullAt(2))
    assert(got(3).getLong(1) == 1L && got(3).isNullAt(2))
  }

  test("durbinWatson: alternating residuals push DW toward 4; is partitioning-invariant") {
    // zig-zag around a flat line: strong negative autocorrelation
    val rows = (1 to 40).map(i => Seq[Any](1, i.toDouble, if (i % 2 == 0) 1.0 else -1.0))
    val df = createDf(spark, "g int, x double, y double", rows)
    val r = Stats.durbinWatson(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getDouble(2) > 3.5)
    val a = Stats.durbinWatson(df, Seq("g"), col("x"), col("y")).collect().toSeq
    val b = Stats.durbinWatson(df.repartition(7), Seq("g"), col("x"), col("y")).collect().toSeq
    assert(a == b)
  }

  test("mcnemar: hand-checked continuity-corrected chi2 on discordant cells") {
    // both=5, a_only=6, b_only=2, neither=3: chi2 = (|6-2|-1)^2/8 = 1.125
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val df = createDf(spark, "a boolean, b boolean",
      rows.map { case (a, b) => Seq[Any](a, b) })
    val r = Stats.mcnemar(df, col("a"), col("b")).head()
    assert(r.getLong(0) == 16L && r.getLong(1) == 5L)
    assert(r.getLong(2) == 6L && r.getLong(3) == 2L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 1.125 && !r.getBoolean(6))
  }

  test("mcnemar: b=c clamps to chi2 0; no discordant pairs null; nulls drop") {
    val tied = createDf(spark, "a boolean, b boolean",
      Seq(Seq[Any](true, false), Seq[Any](false, true), Seq[Any](true, true)))
    assert(Stats.mcnemar(tied, col("a"), col("b")).head().getDouble(5) == 0.0)
    val concordant = createDf(spark, "a boolean, b boolean",
      Seq(Seq[Any](true, true), Seq[Any](false, false), Seq[Any](null, true)))
    val r = Stats.mcnemar(concordant, col("a"), col("b")).head()
    assert(r.getLong(0) == 2L && r.isNullAt(5) && r.isNullAt(6))
  }

  test("cmhTest: hand-checked single and doubled strata; strata with n<2 drop") {
    // a=3,b=1,c=1,d=3: num = 3-16/8 = 1, var = 256/448, OR terms 9/8 and 1/8
    def stratum(s: Int) =
      Seq.fill(3)((s, true, true)) ++ Seq.fill(1)((s, true, false)) ++
        Seq.fill(1)((s, false, true)) ++ Seq.fill(3)((s, false, false))
    val one = createDf(spark, "s int, e boolean, o boolean",
      stratum(0).map { case (s, e, o) => Seq[Any](s, e, o) })
    val r1 = Stats.cmhTest(one, col("s"), col("e"), col("o")).head()
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 8L)
    assert(math.abs(r1.getDouble(2) - 0.25 / (256.0 / 448.0)) < 1e-6)
    assert(r1.getDouble(4) == 9.0)
    val two = createDf(spark, "s int, e boolean, o boolean",
      (stratum(0) ++ stratum(1)).map { case (s, e, o) => Seq[Any](s, e, o) })
    val r2 = Stats.cmhTest(two, col("s"), col("e"), col("o")).head()
    assert(r2.getLong(0) == 2L)
    assert(math.abs(r2.getDouble(2) - 2.25 / (512.0 / 448.0)) < 1e-6)
    assert(r2.getDouble(4) == 9.0)
    // a 1-row stratum contributes nothing (var undefined at n=1)
    val plus = createDf(spark, "s int, e boolean, o boolean",
      (stratum(0) :+ ((7, true, true))).map { case (s, e, o) => Seq[Any](s, e, o) })
    assert(Stats.cmhTest(plus, col("s"), col("e"), col("o")).head().getLong(0) == 1L)
  }

  test("jackknifeRatio: exact full-sample ratio; proportional columns give se 0") {
    // num = 2*den everywhere -> every leave-out ratio is exactly 2
    val df = createDf(spark, "g string, k int, num double, den double",
      (1 to 60).map(i => Seq[Any]("a", i, 2.0 * i, i.toDouble)))
    val r = Stats.jackknifeRatio(df, Seq("g"), col("k"), col("num"), col("den"),
      groups = 8, seed = "t").head()
    assert(r.getLong(1) == 60L && r.getLong(2) == 8L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 2.0 && r.getDouble(6) == 2.0)
  }

  test("jackknifeRatio: partitioning-invariant, se positive on noisy ratios") {
    val rnd = new scala.util.Random(42)
    val df = createDf(spark, "g string, k int, num double, den double",
      (1 to 200).map(i =>
        Seq[Any](if (i % 2 == 0) "a" else "b", i,
          10.0 + rnd.nextDouble() * 5.0, 1.0 + rnd.nextDouble())))
    val a = Stats.jackknifeRatio(df, Seq("g"), col("k"), col("num"), col("den"))
      .collect().sortBy(_.getString(0)).toSeq
    val b = Stats.jackknifeRatio(df.repartition(7), Seq("g"), col("k"),
      col("num"), col("den")).collect().sortBy(_.getString(0)).toSeq
    assert(a == b)
    a.foreach { r =>
      assert(r.getDouble(4) > 0.0)
      assert(r.getDouble(5) < r.getDouble(3) && r.getDouble(3) < r.getDouble(6))
    }
  }
}
