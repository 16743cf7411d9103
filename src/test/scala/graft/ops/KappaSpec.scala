package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class KappaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def kappa(pairs: Seq[(String, String)]): org.apache.spark.sql.Row = {
    val df = createDf(spark, "a string, b string",
      pairs.map { case (x, y) => Seq[Any](x, y) })
    Stats.cohenKappa(df, col("a"), col("b")).head()
  }

  test("textbook 2x2 table: po=0.7, pe=0.5, kappa=0.4") {
    // cells: (yes,yes)=20 (yes,no)=5 (no,yes)=10 (no,no)=15
    val pairs = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = kappa(pairs)
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
  }

  test("perfect agreement gives kappa 1") {
    val r = kappa(Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x")))
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("both raters constant: pe=1, kappa is null not NaN") {
    val r = kappa(Seq.fill(10)(("same", "same")))
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
    assert(r.isNullAt(3))
  }

  test("rectangular label spaces: an unshared category contributes no chance mass") {
    // rater B sometimes says 'maybe', which A never uses; pe only sums
    // over categories both marginals contain
    val pairs = Seq(("yes", "yes"), ("yes", "maybe"), ("no", "no"), ("no", "maybe"))
    val r = kappa(pairs)
    // cells: agree=2, N=4, po=0.5; row: yes=2,no=2; col: yes=1,no=1,maybe=2
    // pe = (2*1 + 2*1)/16 = 0.25; kappa = (0.5-0.25)/0.75 = 1/3
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.25)
    assert(r.getDouble(3) == 0.333333)
  }

  test("disjoint label spaces: pe=0 and kappa=po") {
    val r = kappa(Seq(("a1", "b1"), ("a2", "b2")))
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("result is invariant to partitioning") {
    val pairs = (0 until 400).map(i => (s"c${i % 3}", s"c${(i * 7) % 4}"))
    val df = createDf(spark, "a string, b string",
      pairs.map { case (x, y) => Seq[Any](x, y) })
    val one = Stats.cohenKappa(df.coalesce(1), col("a"), col("b")).head()
    val many = Stats.cohenKappa(df.repartition(11), col("a"), col("b")).head()
    assert(one == many)
  }
}
