package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ImputeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = createDf(spark, "g string, v double", Seq(
    Seq[Any]("a", 1.0), Seq[Any]("a", 3.0), Seq[Any]("a", null),
    Seq[Any]("b", 7.0), Seq[Any]("b", null), Seq[Any]("b", null),
    Seq[Any]("c", null)))

  private def collectFills(method: String): Map[String, Seq[Option[Double]]] =
    Impute.imputePerGroup(df, Seq("g"), "v", method)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.toSeq.map(r => Option(r.get(2)).map(_.asInstanceOf[Double])).sortBy(_.getOrElse(-1.0)))
      .toMap

  test("mean: nulls fill with the group mean of present values") {
    val fills = collectFills("mean")
    assert(fills("a").flatten.sorted == Seq(1.0, 2.0, 3.0))
    assert(fills("b").flatten.sorted == Seq(7.0, 7.0, 7.0))
  }

  test("mean: an all-null group stays null (nothing to impute from)") {
    assert(collectFills("mean")("c") == Seq(None))
  }

  test("mean: present values are never rewritten") {
    val out = Impute.imputePerGroup(df, Seq("g"), "v", "mean")
    val changed = out.filter(col("v").isNotNull && col("v") =!= col("v_imputed")).count()
    assert(changed == 0)
  }

  test("mode: most frequent value wins; ties break to the smallest") {
    val d = createDf(spark, "g string, v double", Seq(
      Seq[Any]("a", 5.0), Seq[Any]("a", 5.0), Seq[Any]("a", 9.0), Seq[Any]("a", null),
      Seq[Any]("t", 2.0), Seq[Any]("t", 4.0), Seq[Any]("t", null))) // tie: 2 vs 4
    val fills = Impute.imputePerGroup(d, Seq("g"), "v", "mode")
      .filter(col("v").isNull)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(fills == Map("a" -> 5.0, "t" -> 2.0))
  }

  test("unknown method raises") {
    intercept[IllegalArgumentException] {
      Impute.imputePerGroup(df, Seq("g"), "v", "zeros")
    }
  }

  test("mean imputation is one hash exchange (group stat never leaves executors)") {
    val p = Impute.imputePerGroup(df, Seq("g"), "v", "mean")
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected 1 hash exchange, found $n:\n${p.take(1500)}")
  }
}
