package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class RegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fit(rows: Seq[(Int, Double)]): org.apache.spark.sql.Row = {
    val df = createDf(spark, "g int, x double, y double",
      rows.map { case (x, y) => Seq[Any](1, x.toDouble, y) })
    Regression.groupOls(df, Seq("g"), col("x"), col("y"))
      .select("n", "slope", "intercept", "r2").head()
  }

  test("exact line recovers slope, intercept and r2 = 1") {
    // y = 3x + 2, five points
    val r = fit(Seq(0 -> 2.0, 1 -> 5.0, 2 -> 8.0, 3 -> 11.0, 4 -> 14.0))
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("textbook least squares on a noisy set matches the closed form") {
    // hand-checked: x=1..4, y = (2.1, 3.9, 6.2, 7.8)
    // Sx=10 Sy=20 Sxx=30 Sxy=59.7 n=4 -> slope = (4*59.7-200)/(4*30-100)=1.94
    // intercept = (20 - 1.94*10)/4 = 0.15
    val r = fit(Seq(1 -> 2.1, 2 -> 3.9, 3 -> 6.2, 4 -> 7.8))
    assert(r.getDouble(1) == 1.94)
    assert(r.getDouble(2) == 0.15)
    assert(r.getDouble(3) > 0.99 && r.getDouble(3) < 1.0)
  }

  test("zero x variance yields null statistics, not infinities") {
    val r = fit(Seq(2 -> 1.0, 2 -> 2.0, 2 -> 3.0))
    assert(r.getLong(0) == 3L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("horizontal data fits slope 0, intercept mean(y), null r2") {
    val r = fit(Seq(1 -> 5.0, 2 -> 5.0, 3 -> 5.0, 4 -> 5.0))
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.isNullAt(3)) // r = 0/0 has no defined value
  }

  test("groups are independent and negative slopes survive quantization") {
    val df = createDf(spark, "g int, x double, y double",
      Seq(Seq[Any](1, 0.0, 0.0), Seq[Any](1, 1.0, -0.5),
        Seq[Any](2, 0.0, 10.0), Seq[Any](2, 2.0, 10.0), Seq[Any](2, 4.0, 16.0)))
    val out = Regression.groupOls(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("slope") == -0.5)
    assert(out(1).getAs[Double]("slope") == 1.5)
    assert(out(1).getAs[Double]("intercept") == 9.0)
  }

  test("result is invariant to partitioning (exact decimal moments)") {
    val rows = (0 until 500).map(i => Seq[Any](1, i.toDouble, i * 0.37 + 11.25))
    val df = createDf(spark, "g int, x double, y double", rows)
    val one = Regression.groupOls(df.coalesce(1), Seq("g"), col("x"), col("y")).head()
    val many = Regression.groupOls(df.repartition(17), Seq("g"), col("x"), col("y")).head()
    assert(one == many)
  }
}
