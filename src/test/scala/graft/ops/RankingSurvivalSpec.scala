package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Replica-checked values for Grubbs' outlier test, the Weibull
  * median-rank fit, and NDCG@k. Expected numbers come from an exact
  * integer-arithmetic replica of each formula (micro/nano quantization
  * included), evaluated independently of Spark.
  */
class RankingSurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("grubbsTest: the 50 in {10,12,11,13,50} is the suspect with G ≈ 1.785") {
    val df = createDf(spark, "g string, v double",
      Seq(10.0, 12.0, 11.0, 13.0, 50.0).map(v => Seq[Any]("g", v)))
    val r = Stats.grubbsTest(df, Seq("g"), col("v")).collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 19.2)       // mean
    assert(r.getDouble(3) == 17.253985)  // sd
    assert(r.getDouble(4) == 1.785095)   // G
    assert(r.getDouble(5) == 50.0)       // suspect
  }

  test("grubbsTest: constant group nulls sd and G; ties break to the larger value") {
    val const = createDf(spark, "g string, v double",
      Seq.fill(4)(Seq[Any]("g", 7.0)))
    val rc = Stats.grubbsTest(const, Seq("g"), col("v")).collect().head
    assert(rc.isNullAt(3) && rc.isNullAt(4))
    // 0 and 10 tie in deviation around mean 5 — suspect must be 10
    val tie = createDf(spark, "g string, v double",
      Seq(0.0, 10.0, 5.0).map(v => Seq[Any]("g", v)))
    assert(Stats.grubbsTest(tie, Seq("g"), col("v"))
      .collect().head.getDouble(5) == 10.0)
  }

  test("weibullFit: fibonacci-ish durations match the replica; censored rows drop") {
    val ds = Seq(1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L).map(t => Seq[Any](t, 1L)) ++
      Seq(Seq[Any](40L, 0L), Seq[Any](0L, 1L)) // censored + zero-duration: excluded
    val df = createDf(spark, "t bigint, e bigint", ds)
    val r = Survival.weibullFit(df, col("t"), col("e")).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == 0.921531) // shape < 1: early-failure regime
    assert(r.getDouble(2) == 6.987369)
    assert(r.getDouble(3) == 0.922562)
  }

  test("weibullFit: a single distinct duration cannot pin a slope") {
    val df = createDf(spark, "t bigint, e bigint",
      Seq.fill(5)(Seq[Any](3L, 1L)))
    val r = Survival.weibullFit(df, col("t"), col("e")).collect().head
    assert(r.getLong(0) == 5L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("ndcgAtK: rel pattern (1,0,1) at k=3 gives DCG 1.5 / IDCG 1.63093") {
    // scores order docs a>b>c>d; a and c relevant; d outside k
    val df = createDf(spark, "g string, id string, y boolean, s double",
      Seq(Seq[Any]("g", "a", true, 0.9), Seq[Any]("g", "b", false, 0.8),
        Seq[Any]("g", "c", true, 0.7), Seq[Any]("g", "d", false, 0.6)))
    val r = Calibration.ndcgAtK(df, Seq("g"), col("y"), col("s"), k = 3,
      tieBreak = col("id")).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.5)
    assert(r.getDouble(4) == 1.63093)
    assert(r.getDouble(5) == 0.919721)
  }

  test("ndcgAtK: perfect ranking scores 1.0; no relevant items nulls ndcg") {
    val perfect = createDf(spark, "g string, id string, y boolean, s double",
      Seq(Seq[Any]("g", "a", true, 0.9), Seq[Any]("g", "b", true, 0.8),
        Seq[Any]("g", "c", false, 0.1)))
    val rp = Calibration.ndcgAtK(perfect, Seq("g"), col("y"), col("s"),
      k = 3, tieBreak = col("id")).collect().head
    assert(rp.getDouble(5) == 1.0)
    val none = createDf(spark, "g string, id string, y boolean, s double",
      Seq(Seq[Any]("g", "a", false, 0.9)))
    val rn = Calibration.ndcgAtK(none, Seq("g"), col("y"), col("s"),
      k = 3, tieBreak = col("id")).collect().head
    assert(rn.getLong(2) == 0L && rn.isNullAt(4) && rn.isNullAt(5))
  }
}
