package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def km(subjects: Seq[(Int, Int)]) = {
    val df = createDf(spark, "t int, e int",
      subjects.map { case (t, e) => Seq[Any](t, e) })
    Survival.kaplanMeier(df, col("t"), col("e")).orderBy("t")
  }

  test("textbook curve: events step, censoring thins the risk set without stepping") {
    // (1,ev) (2,ev) (2,cens) (3,ev) (4,cens)
    val out = km(Seq(1 -> 1, 2 -> 1, 2 -> 0, 3 -> 1, 4 -> 0)).collect()
    val s = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val risk = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(risk == Map(1L -> 5L, 2L -> 4L, 3L -> 2L, 4L -> 1L))
    assert(s(1L) == 0.8)  // 4/5
    assert(s(2L) == 0.6)  // 0.8 * 3/4
    assert(s(3L) == 0.3)  // 0.6 * 1/2
    assert(s(4L) == 0.3)  // censor-only time: curve is flat
    assert(out.map(r => r.getLong(3)).sum == 2L) // two censored subjects
  }

  test("a time where everyone at risk dies zeroes the curve exactly") {
    val out = km(Seq(1 -> 1, 2 -> 1, 2 -> 1)).collect()
    val s = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(1L) == math.BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(s(2L) == 0.0) // exact zero, not exp(-inf) artifacts
  }

  test("all-censored input keeps survival at 1.0 throughout") {
    val out = km(Seq(1 -> 0, 2 -> 0, 3 -> 0)).collect()
    assert(out.forall(_.getDouble(4) == 1.0))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L)) // risk set still thins
  }

  test("result is invariant to partitioning") {
    val subjects = (0 until 300).map(i => (i % 20, if (i % 3 == 0) 1 else 0))
    val df = createDf(spark, "t int, e int",
      subjects.map { case (t, e) => Seq[Any](t, e) })
    val one = Survival.kaplanMeier(df.coalesce(1), col("t"), col("e"))
      .orderBy("t").collect().toSeq
    val many = Survival.kaplanMeier(df.repartition(13), col("t"), col("e"))
      .orderBy("t").collect().toSeq
    assert(one == many)
  }

  test("nelsonAalen: textbook hazard accumulates d/n; censoring thins without stepping") {
    // t=1: 1 event of 4 at risk (+1/4); t=2: censor only (+0);
    // t=3: 1 event of 2 at risk (+1/2)
    val df = createDf(spark, "t long, e long", Seq(
      Seq[Any](1L, 1L), Seq[Any](2L, 0L), Seq[Any](3L, 1L), Seq[Any](3L, 0L)))
    val got = Survival.nelsonAalen(df, col("t"), col("e"))
      .orderBy("t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(1L)._1 == 4L && got(1L)._2 == 0.25)
    assert(got(2L)._2 == 0.25) // flat through the censoring
    assert(got(3L)._2 == 0.75) // +1/2
    // SE at t=3: sqrt(1/16 + 1/4) = 0.559017
    assert(got(3L)._3 == 0.559017)
  }

  test("nelsonAalen tracks -ln(KM survival) from above on event-only data") {
    val subjects = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
    val df = createDf(spark, "t long, e long",
      subjects.map { case (t, e) => Seq[Any](t, e) })
    val km = Survival.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val na = Survival.nelsonAalen(df, col("t"), col("e"))
      .orderBy("t").collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    for (t <- 1L to 4L) { // t=5 zeroes KM (ln undefined)
      val minusLnS = -math.log(km(t))
      assert(na(t) <= minusLnS + 1e-9, s"t=$t: NA ${na(t)} vs -lnS $minusLnS")
    }
  }

  test("logRank: hand-checked hypergeometric O-E and variance") {
    // a: events at 1, 2; b: events at 2, 3 (no censoring)
    // t=1: d=1 na=2 nb=2 -> E=0.5, V=0.25
    // t=2: d=2 na=1 nb=2 -> E=2/3, V=2*(1/3)(2/3)*(1/2)=2/9
    // t=3: n=1 -> V term 0
    // O_a=2, E_a=7/6, V=0.25+2/9; z=(5/6)/sqrt(17/36)
    val df = createDf(spark, "g string, t long, e long", Seq(
      Seq[Any]("a", 1L, 1L), Seq[Any]("a", 2L, 1L),
      Seq[Any]("b", 2L, 1L), Seq[Any]("b", 3L, 1L)))
    val r = Survival.logRank(df, col("t"), col("e"),
      col("g") === "a", col("g") === "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 2L, 2L)))
    assert(math.abs(r.getDouble(4) - 7.0 / 6.0) < 1e-6)
    val vExp = 0.25 + 2.0 / 9.0
    assert(math.abs(r.getDouble(5) - (5.0 / 6.0) / math.sqrt(vExp)) < 1e-5)
    assert(math.abs(r.getDouble(6) - (5.0 / 6.0) * (5.0 / 6.0) / vExp) < 1e-5)
  }

  test("logRank: identical groups give z ~ 0; censored rows leave the risk set without dying") {
    val same = createDf(spark, "g string, t long, e long",
      (1 to 20).flatMap(i => Seq(Seq[Any]("a", i.toLong, 1L), Seq[Any]("b", i.toLong, 1L))))
    val r = Survival.logRank(same, col("t"), col("e"),
      col("g") === "a", col("g") === "b").head()
    assert(math.abs(r.getDouble(5)) < 1e-9)
    // all-censored group b: no b deaths, O_a - E_a driven by risk sets only
    val cen = createDf(spark, "g string, t long, e long", Seq(
      Seq[Any]("a", 1L, 1L), Seq[Any]("a", 3L, 1L),
      Seq[Any]("b", 2L, 0L), Seq[Any]("b", 4L, 0L)))
    val c = Survival.logRank(cen, col("t"), col("e"),
      col("g") === "a", col("g") === "b").head()
    assert(c.getLong(2) == 2L && c.getLong(3) == 0L)
  }
}
