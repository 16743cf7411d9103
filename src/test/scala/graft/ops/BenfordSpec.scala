package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class BenfordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def audit(values: Seq[Double], scale: Int = 2) = {
    val df = createDf(spark, "v double", values.map(v => Seq[Any](v)))
    Profile.benfordAudit(df, col("v"), scale)
  }

  test("digit comes from the leading character of the integer units") {
    // 123.45 -> 12345 -> 1; 0.05 -> 5 -> 5; 9.99 -> 999 -> 9
    val out = audit(Seq(123.45, 0.05, 9.99)).orderBy("digit").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 5, 9))
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("non-positive values are excluded from the audit") {
    val out = audit(Seq(-5.0, 0.0, 0.001, 3.0)) // 0.001 rounds to 0 cents -> excluded
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getInt(0) == 3 && r.getLong(1) == 1L && r.getDouble(2) == 1.0)
  }

  test("uniform digits 1-9 each get share 1/9 and the documented expectations") {
    val out = audit((1 to 9).map(_.toDouble)).orderBy("digit").collect()
    assert(out.length == 9)
    assert(out.forall(_.getDouble(2) == 0.111111))
    // Benford expectations: digit 1 ~ 30.1%, digit 9 ~ 4.6%
    assert(out.head.getDouble(3) == 0.30103)
    assert(out.last.getDouble(3) == 0.045757)
    // abs_dev consistency: |share - expected| rounded
    assert(out.head.getDouble(4) == 0.189919)
  }

  test("result is invariant to partitioning") {
    val vals = (1 until 500).map(i => i * 1.37)
    val df = createDf(spark, "v double", vals.map(v => Seq[Any](v)))
    val one = Profile.benfordAudit(df.coalesce(1), col("v")).orderBy("digit").collect().toSeq
    val many = Profile.benfordAudit(df.repartition(13), col("v")).orderBy("digit").collect().toSeq
    assert(one == many)
  }
}
