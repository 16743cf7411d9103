package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class WelchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def welch(a: Seq[Double], b: Seq[Double]) = {
    val df = createDf(spark, "g string, v double",
      a.map(v => Seq[Any]("a", v)) ++ b.map(v => Seq[Any]("b", v)))
    Stats.welchT(df, col("g") === "a", col("g") === "b", col("v")).head()
  }

  test("hand-checked statistic: a=[1,2,3], b=[2,4,6,8]") {
    // ma=2 va=1; mb=5 vb=20/3; se2 = 1/3 + 5/3 = 2
    // t = (2-5)/sqrt(2) = -2.121320; df = 4 / (1/18 + 25/27) = 216/53
    val r = welch(Seq(1, 2, 3), Seq(2, 4, 6, 8))
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == -2.12132)
    assert(r.getDouble(5) == BigDecimal(216.0 / 53.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("identical samples give t = 0 and symmetric means") {
    val r = welch(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4))
    assert(r.getDouble(2) == r.getDouble(3))
    assert(r.getDouble(4) == 0.0)
  }

  test("singleton group has no sample variance: t and df are null") {
    val r = welch(Seq(5.0), Seq(1, 2, 3))
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("result is invariant to partitioning (decimal moments)") {
    val rows = (0 until 400).map(i =>
      Seq[Any](if (i % 3 == 0) "a" else "b", i * 0.37 + (i % 7)))
    val df = createDf(spark, "g string, v double", rows)
    val one = Stats.welchT(df.coalesce(1), col("g") === "a", col("g") === "b", col("v")).head()
    val many = Stats.welchT(df.repartition(17), col("g") === "a", col("g") === "b", col("v")).head()
    assert(one == many)
  }
}
