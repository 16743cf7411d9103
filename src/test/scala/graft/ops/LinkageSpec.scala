package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("weightsNano: agreement weight positive, disagreement negative, exact values") {
    val (wa, wd) = Linkage.weightsNano(Linkage.Field(lit(true), 0.9, 0.3))
    assert(wa == math.round(math.log(3.0) * 1e9))
    assert(wd == math.round(math.log(0.1 / 0.7) * 1e9))
    assert(wa > 0 && wd < 0)
  }

  test("score sums per-field weights and bands on the thresholds") {
    val df = createDf(spark, "id int, f1 boolean, f2 boolean", Seq(
      Seq[Any](1, true, true),   // both agree
      Seq[Any](2, true, false),  // mixed
      Seq[Any](3, false, false), // both disagree
    ))
    val fields = Seq(
      Linkage.Field(col("f1"), 0.9, 0.3),
      Linkage.Field(col("f2"), 0.8, 0.1))
    val (w1a, w1d) = Linkage.weightsNano(fields(0))
    val (w2a, w2d) = Linkage.weightsNano(fields(1))
    val out = Linkage.score(df, fields, lowerNano = 0L, upperNano = w1a + w2a)
      .collect().map(r => r.getAs[Int]("id") ->
        (r.getAs[Long]("score_nano"), r.getAs[String]("band"))).toMap
    assert(out(1) == (w1a + w2a, "match"))       // exactly at upper -> match
    assert(out(2) == (w1a + w2d, "non_match"))   // ln3 + ln(2/9) < 0
    assert(out(3) == (w1d + w2d, "non_match"))
  }

  test("null agreement counts as disagreement, not as a dropped field") {
    val df = createDf(spark, "id int, f1 boolean", Seq(Seq[Any](1, null)))
    val f = Linkage.Field(col("f1"), 0.9, 0.3)
    val (_, wd) = Linkage.weightsNano(f)
    val out = Linkage.score(df, Seq(f), -10000000000L, 10000000000L).head()
    assert(out.getAs[Long]("score_nano") == wd)
    assert(out.getAs[String]("band") == "possible") // inside the wide thresholds
  }

  test("degenerate m/u raise instead of producing infinite weights") {
    intercept[IllegalArgumentException] {
      Linkage.weightsNano(Linkage.Field(lit(true), 1.0, 0.3))
    }
  }
}

class ChiSquareSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def chi(cells: Seq[(String, String, Int)]) = {
    val rows = cells.flatMap { case (a, b, n) => Seq.fill(n)(Seq[Any](a, b)) }
    val df = createDf(spark, "a string, b string", rows)
    Stats.chiSquareIndependence(df, col("a"), col("b")).head()
  }

  test("hand-checked 2x2: [[10,20],[20,10]] gives chi2 ~ 20/3, dof 1") {
    val r = chi(Seq(("x", "p", 10), ("x", "q", 20), ("y", "p", 20), ("y", "q", 10)))
    assert(r.getLong(0) == 60L)
    assert(r.getLong(1) == 1L)
    // 4 cells, each (5^2)/15 -> nano-quantized sum 6666666668 / 1e9
    assert(r.getDouble(2) == 6.666667)
  }

  test("perfect independence gives chi2 = 0") {
    val r = chi(Seq(("x", "p", 10), ("x", "q", 10), ("y", "p", 10), ("y", "q", 10)))
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0) // V = 0: no effect
  }

  test("Cramér's V: hand-checked effect size; degenerate 1xk margin nulls out") {
    val r = chi(Seq(("x", "p", 10), ("x", "q", 20), ("y", "p", 20), ("y", "q", 10)))
    // V = sqrt(chi2 / (n·(min(2,2)−1))) = sqrt(6.666666668/60) = 0.333333
    assert(r.getDouble(3) == 0.333333)
    val flat = chi(Seq(("x", "p", 10), ("x", "q", 10))) // one row category
    assert(flat.isNullAt(3))
  }

  test("dof scales with both category counts") {
    val r = chi(Seq(("x", "p", 5), ("x", "q", 5), ("x", "r", 5),
      ("y", "p", 5), ("y", "q", 5), ("y", "r", 5),
      ("z", "p", 5), ("z", "q", 5), ("z", "r", 5)))
    assert(r.getLong(1) == 4L) // (3-1)*(3-1)
    assert(r.getDouble(2) == 0.0)
  }

  test("result is invariant to partitioning (nano-quantized cell terms)") {
    val rows = (0 until 600).map(i => Seq[Any](s"a${i % 5}", s"b${(i * 7) % 4}"))
    val df = createDf(spark, "a string, b string", rows)
    val one = Stats.chiSquareIndependence(df.coalesce(1), col("a"), col("b")).head()
    val many = Stats.chiSquareIndependence(df.repartition(13), col("a"), col("b")).head()
    assert(one == many)
  }
}
