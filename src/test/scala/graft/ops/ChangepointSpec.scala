package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ChangepointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("changepoint: clean level shift found at the exact boundary") {
    // [1,1,1,5,5,5]: split after k=3, means 1 and 5, cusum_max = |3-9| = 6
    val df = createDf(spark, "g string, o int, v double",
      Seq(1, 1, 1, 5, 5, 5).zipWithIndex.map { case (v, i) =>
        Seq[Any]("a", i, v.toDouble)
      })
    val r = Timeseries.changepoint(df, Seq("g"), col("o"), col("v")).head()
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L && r.getInt(3) == 2)
    assert(r.getDouble(4) == 6.0)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 5.0 && r.getDouble(7) == 4.0)
  }

  test("changepoint: constant series ties break to k=1; 1-row group survives with nulls") {
    val df = createDf(spark, "g string, o int, v double",
      (1 to 5).map(i => Seq[Any]("c", i, 7.0)) :+ Seq[Any]("solo", 1, 3.0))
    val got = Timeseries.changepoint(df, Seq("g"), col("o"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("c").getLong(2) == 1L && got("c").getDouble(7) == 0.0)
    assert(got("solo").getLong(1) == 1L && got("solo").isNullAt(2)
      && got("solo").isNullAt(7))
  }

  test("changepoint: partitioning-invariant") {
    val rnd = new scala.util.Random(5)
    val df = createDf(spark, "g string, o int, v double",
      (1 to 80).map(i => Seq[Any](if (i % 2 == 0) "a" else "b", i,
        (if (i > 40) 10.0 else 2.0) + rnd.nextDouble())))
    val a = Timeseries.changepoint(df, Seq("g"), col("o"), col("v"))
      .collect().sortBy(_.getString(0)).toSeq
    val b = Timeseries.changepoint(df.repartition(7), Seq("g"), col("o"), col("v"))
      .collect().sortBy(_.getString(0)).toSeq
    assert(a == b)
    a.foreach(r => assert(r.getDouble(7) > 5.0)) // both series shift up by ~8
  }

  test("sprtBernoulli: success streak crosses h1, failure streak crosses h0") {
    // p0=0.3, p1=0.7: l1 = ln(7/3), A = ln(16) -> h1 at the 4th success
    // (3*l1 = 2.54 < 2.77 <= 4*l1); B = ln(0.2/0.95) -> h0 at the 2nd
    // failure (1*l0 = -0.847 > -1.558 >= 2*l0)
    val wins = createDf(spark, "g string, o int, t int, s int",
      (1 to 6).map(i => Seq[Any]("w", i, 1, 1)))
    val rw = Timeseries.sprtBernoulli(wins, Seq("g"), col("o"), col("t"),
      col("s"), p0 = 0.3, p1 = 0.7).orderBy(col("t")).collect()
    assert(rw.map(_.getString(5)).toSeq ==
      Seq("continue", "continue", "continue", "h1", "h1", "h1"))
    assert(rw.last.getLong(6) == 4L && rw.last.isNullAt(7))
    val losses = createDf(spark, "g string, o int, t int, s int",
      (1 to 4).map(i => Seq[Any]("l", i, 1, 0)))
    val rl = Timeseries.sprtBernoulli(losses, Seq("g"), col("o"), col("t"),
      col("s"), p0 = 0.3, p1 = 0.7).orderBy(col("o")).collect()
    assert(rl.map(_.getString(5)).toSeq == Seq("continue", "h0", "h0", "h0"))
    assert(rl.last.getLong(7) == 2L && rl.last.isNullAt(6))
  }

  test("sprtBernoulli: llr is the closed-form s*l1 + (n-s)*l0; partition-invariant") {
    val df = createDf(spark, "g string, o int, t int, s int",
      (1 to 50).map(i => Seq[Any](if (i % 2 == 0) "a" else "b", i, 3, i % 4 min 3)))
    val out = Timeseries.sprtBernoulli(df, Seq("g"), col("o"), col("t"), col("s"),
      p0 = 0.25, p1 = 0.3)
    val l1 = math.log(0.3 / 0.25)
    val l0 = math.log(0.7 / 0.75)
    out.collect().foreach { r =>
      val (n, s) = (r.getLong(2), r.getLong(3))
      val expect = math.rint((s * l1 + (n - s) * l0) * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - expect) < 1e-9)
    }
    val a = out.collect().toSeq.sortBy(r => (r.getString(0), r.getInt(1)))
    val b = Timeseries.sprtBernoulli(df.repartition(7), Seq("g"), col("o"),
      col("t"), col("s"), p0 = 0.25, p1 = 0.3)
      .collect().toSeq.sortBy(r => (r.getString(0), r.getInt(1)))
    assert(a == b)
  }

  private def ph(vals: Seq[Double], delta: Double, lambda: Double) = {
    val df = createDf(spark, "g string, o int, v double",
      vals.zipWithIndex.map { case (v, i) => Seq[Any]("s", i, v) })
    Timeseries.pageHinkley(df, Seq("g"), col("o"), col("v"), delta, lambda)
      .orderBy(col("o")).collect()
  }

  test("runsTest: hand-checked runs around the exact lower median") {
    // [1,5,2,6,3,7]: med=3 drops, signs [-,+,-,+,+] -> 4 runs, n1=3 n2=2
    val df = createDf(spark, "g string, o int, v double",
      Seq(1.0, 5.0, 2.0, 6.0, 3.0, 7.0).zipWithIndex
        .map { case (v, i) => Seq[Any]("s", i, v) })
    val r = Timeseries.runsTest(df, Seq("g"), col("o"), col("v")).head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 4L)
    val expZ = BigDecimal((4.0 - (2.0 * 3.0 * 2.0 / 5.0 + 1.0)) /
        math.sqrt(2.0 * 3.0 * 2.0 * (2.0 * 3.0 * 2.0 - 5.0) / (5.0 * 5.0 * 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == expZ)
  }

  test("runsTest: clustering pushes z negative; one-sided series nulls out") {
    val clustered = createDf(spark, "g string, o int, v double",
      Seq(1.0, 2.0, 3.0, 10.0, 11.0, 12.0).zipWithIndex
        .map { case (v, i) => Seq[Any]("s", i, v) })
    val r = Timeseries.runsTest(clustered, Seq("g"), col("o"), col("v")).head()
    assert(r.getLong(4) == 2L && r.getDouble(5) < 0.0)
    val flat = createDf(spark, "g string, o int, v double",
      Seq(5.0, 5.0, 5.0, 9.0).zipWithIndex
        .map { case (v, i) => Seq[Any]("s", i, v) })
    assert(Timeseries.runsTest(flat, Seq("g"), col("o"), col("v"))
      .head().isNullAt(5))
  }

  test("crossCorrelation: a +2-shifted spike aligns exactly at lag +2") {
    val x = Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val y = Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
    val df = createDf(spark, "g string, o int, x double, y double",
      x.zip(y).zipWithIndex.map { case ((a, b), i) => Seq[Any]("s", i, a, b) })
    val got = Timeseries.crossCorrelation(df, Seq("g"), col("o"),
        col("x"), col("y"), 3)
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(got(2).getDouble(3) == 1.0)
    assert(got(0).getDouble(3) == -0.142857) // -1/7: disjoint one-hots
    assert(got.keySet == Set(-3, -2, -1, 0, 1, 2, 3))
  }

  test("crossCorrelation: invariant to partitioning") {
    val rows = (0 until 160).map(i => Seq[Any](s"s${i % 2}", i,
      ((i * 13) % 17).toDouble, ((i * 7 + 3) % 19).toDouble))
    val df = createDf(spark, "g string, o int, x double, y double", rows)
    val one = Timeseries.crossCorrelation(df.coalesce(1), Seq("g"), col("o"),
      col("x"), col("y"), 4).orderBy(col("g"), col("lag")).collect().toSeq
    val many = Timeseries.crossCorrelation(df.repartition(9), Seq("g"), col("o"),
      col("x"), col("y"), 4).orderBy(col("g"), col("lag")).collect().toSeq
    assert(one == many)
  }

  test("neweyWestMeanSe: hand-checked ramp — persistence inflates the NW SE") {
    // [1..8], L=1: g0 = 5.25, g1 = 3.28125 (all dyadic-exact)
    val df = createDf(spark, "g string, o int, v double",
      (1 to 8).map(i => Seq[Any]("s", i, i.toDouble)))
    val r = Timeseries.neweyWestMeanSe(df, Seq("g"), col("o"), col("v"), 1).head()
    assert(r.getLong(1) == 8L && r.getDouble(2) == 4.5)
    assert(r.getDouble(3) == BigDecimal(math.sqrt(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) == BigDecimal(math.sqrt((5.25 + 2 * 0.5 * 3.28125) / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) > r.getDouble(3))
  }

  test("neweyWestMeanSe: alternating series deflates SE; short series nulls se_nw") {
    val alt = createDf(spark, "g string, o int, v double",
      (1 to 12).map(i => Seq[Any]("s", i, if (i % 2 == 0) 1.0 else -1.0)))
    val r = Timeseries.neweyWestMeanSe(alt, Seq("g"), col("o"), col("v"), 2).head()
    assert(r.getDouble(4) < r.getDouble(3))
    val short = createDf(spark, "g string, o int, v double",
      (1 to 3).map(i => Seq[Any]("s", i, i.toDouble)))
    assert(Timeseries.neweyWestMeanSe(short, Seq("g"), col("o"), col("v"), 4)
      .head().isNullAt(4))
  }

  test("forecastAccuracy: lag-1 forecast scores MASE and U2 exactly 1") {
    val df = createDf(spark, "g string, o int, a double, f double",
      Seq(Seq[Any]("s", 1, 10.0, null), Seq[Any]("s", 2, 12.0, 10.0),
        Seq[Any]("s", 3, 11.0, 12.0), Seq[Any]("s", 4, 13.0, 11.0)))
    val r = Timeseries.forecastAccuracy(df, Seq("g"), col("o"),
      col("a"), col("f")).head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1.666667)
    assert(r.getDouble(3) == 1.732051)
    assert(r.getDouble(4) == 0.145147)
    assert(r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 1.0)
  }

  test("forecastAccuracy: a perfect forecast scores zero everywhere") {
    val df = createDf(spark, "g string, o int, a double, f double",
      Seq(Seq[Any]("s", 1, 10.0, 10.0), Seq[Any]("s", 2, 12.0, 12.0),
        Seq[Any]("s", 3, 11.0, 11.0)))
    val r = Timeseries.forecastAccuracy(df, Seq("g"), col("o"),
      col("a"), col("f")).head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("turningPointTest: peaks and valleys counted strictly; plateaus are not turns") {
    val df = createDf(spark, "g string, o int, v double",
      Seq(1.0, 3.0, 2.0, 4.0, 3.0).zipWithIndex
        .map { case (v, i) => Seq[Any]("s", i, v) })
    val r = Timeseries.turningPointTest(df, Seq("g"), col("o"), col("v")).head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    val expZ = BigDecimal((3.0 - 2.0 * 3.0 / 3.0) /
        math.sqrt((16.0 * 5.0 - 29.0) / 90.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expZ)
    val mono = createDf(spark, "g string, o int, v double",
      (1 to 5).map(i => Seq[Any]("s", i, i.toDouble)))
    val rm = Timeseries.turningPointTest(mono, Seq("g"), col("o"), col("v")).head()
    assert(rm.getLong(2) == 0L && rm.getDouble(3) < 0.0)
    val plat = createDf(spark, "g string, o int, v double",
      Seq(1.0, 2.0, 2.0, 2.0, 1.0).zipWithIndex
        .map { case (v, i) => Seq[Any]("s", i, v) })
    assert(Timeseries.turningPointTest(plat, Seq("g"), col("o"), col("v"))
      .head().getLong(2) == 0L)
  }

  test("pageHinkley: hand-checked walk over a level jump") {
    // [0,0,0,100,100,100], delta 0: ph = 0,0,0,75,135,185
    val rows = ph(Seq(0.0, 0.0, 0.0, 100.0, 100.0, 100.0), 0.0, 100.0)
    assert(rows.map(_.getAs[Double]("ph")).toSeq ==
      Seq(0.0, 0.0, 0.0, 75.0, 135.0, 185.0))
    assert(rows.map(_.getAs[Boolean]("ph_alarm")).toSeq ==
      Seq(false, false, false, false, true, true))
  }

  test("pageHinkley: constant and decreasing series never alarm") {
    val const = ph(Seq.fill(10)(42.0), 0.0, 1.0)
    assert(const.forall(_.getAs[Double]("ph") == 0.0))
    val down = ph(Seq(100.0, 0.0, 0.0), 0.0, 1.0)
    assert(down.forall(_.getAs[Double]("ph") == 0.0))
  }

  test("pageHinkley: delta suppresses small drifts; partitioning-invariant") {
    // jump of 50 with delta 100: deviations stay negative, never alarms
    val small = ph(Seq(0.0, 0.0, 50.0, 50.0), 100.0, 10.0)
    assert(small.forall(!_.getAs[Boolean]("ph_alarm")))
    val vals = (0 until 200).map(i => ((i * 37) % 23).toDouble + (i / 50) * 10.0)
    val df = createDf(spark, "g string, o int, v double",
      vals.zipWithIndex.map { case (v, i) => Seq[Any](s"s${i % 3}", i, v) })
    val one = Timeseries.pageHinkley(df.coalesce(1), Seq("g"), col("o"),
      col("v"), 1.0, 20.0).orderBy(col("g"), col("o")).collect().toSeq
    val many = Timeseries.pageHinkley(df.repartition(11), Seq("g"), col("o"),
      col("v"), 1.0, 20.0).orderBy(col("g"), col("o")).collect().toSeq
    assert(one == many)
  }
}
