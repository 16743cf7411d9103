package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = createDf(spark, "g string, x double, y double",
    Seq(
      Seq[Any]("a", 1.0, 10.0),
      Seq[Any]("a", 2.0, 20.0),
      Seq[Any]("a", 3.0, 30.0),
      Seq[Any]("b", 5.0, 1.0),
      Seq[Any]("b", 5.0, 3.0),
    ))

  test("standardize: z-scores per group, both columns in one pass") {
    val got = Scaling.standardize(df, Seq("g"), Seq("x", "y"))
      .filter(col("g") === "a").orderBy("x")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val s = math.sqrt(2.0 / 3.0) // population std of {1,2,3}
    assert(math.abs(got(0)._1 - (-1.0 / s)) < 1e-12)
    assert(math.abs(got(1)._1 - 0.0) < 1e-12)
    assert(math.abs(got(2)._1 - (1.0 / s)) < 1e-12)
    // y is 10x: same z-scores
    assert(math.abs(got(0)._2 - got(0)._1) < 1e-12)
  }

  test("standardize: zero-variance group yields null, not divide-by-zero") {
    val got = Scaling.standardize(df, Seq("g"), Seq("x"))
      .filter(col("g") === "b")
    assert(got.collect().forall(_.isNullAt(1)))
  }

  test("minMaxScale: [0,1] endpoints per group") {
    val got = Scaling.minMaxScale(df, Seq("g"), Seq("x"))
      .filter(col("g") === "a").orderBy("x")
      .collect().map(_.getDouble(1))
    assert(got.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("robustScale: (x - median)/IQR with exact quartiles") {
    val d = createDf(spark, "g string, x double",
      Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(v => Seq[Any]("a", v)))
    val got = Scaling.robustScale(d, Seq("g"), Seq("x"))
      .orderBy("x").collect().map(_.getDouble(1))
    // median 3, q1 2, q3 4, iqr 2 -> (100-3)/2 = 48.5 (outlier dominates nothing)
    assert(math.abs(got.last - 48.5) < 1e-12)
    assert(math.abs(got(2) - 0.0) < 1e-12)
  }

  test("global scaling (no group columns) broadcasts a single stats row") {
    val got = Scaling.minMaxScale(df, Nil, Seq("y"))
    assert(got.agg(min("y"), max("y")).head().toSeq == Seq(0.0, 1.0))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("nulls stay null and are excluded from statistics") {
    val d = createDf(spark, "g string, x double",
      Seq(Seq[Any]("a", 1.0), Seq[Any]("a", null), Seq[Any]("a", 3.0)))
    val got = Scaling.standardize(d, Seq("g"), Seq("x")).orderBy(asc_nulls_last("x"))
    val rows = got.collect()
    assert(rows(2).isNullAt(1))
    // stats over {1,3}: mean 2, std 1 -> z = -1, 1
    assert(math.abs(rows(0).getDouble(1) - (-1.0)) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12)
  }
}
