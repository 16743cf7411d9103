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

  test("weightedKappa: hand-checked linear-weight agreement on ordinal grades") {
    // diag x3 each + one (0,2) miss: d_o = 0.2, d_e = 92/100
    val rows = Seq.fill(3)((0, 0)) ++ Seq.fill(3)((1, 1)) ++ Seq.fill(3)((2, 2)) :+
      ((0, 2))
    val df = createDf(spark, "a int, b int",
      rows.map { case (x, y) => Seq[Any](x, y) })
    val r = Stats.weightedKappa(df, col("a"), col("b")).head()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 0.2)
    assert(r.getDouble(2) == 0.92)
    assert(r.getDouble(3) == 0.782609)
  }

  test("weightedKappa: perfect agreement 1.0; both-constant raters null out") {
    val perfect = createDf(spark, "a int, b int",
      Seq(1, 2, 3, 2).map(v => Seq[Any](v, v)))
    assert(Stats.weightedKappa(perfect, col("a"), col("b")).head()
      .getDouble(3) == 1.0)
    val const = createDf(spark, "a int, b int",
      Seq.fill(5)(Seq[Any](2, 2)))
    assert(Stats.weightedKappa(const, col("a"), col("b")).head().isNullAt(3))
  }

  test("gwetAc1: survives the kappa paradox on a dominant category") {
    // 90 yes/yes, 5 no/no, 3 yes/no, 2 no/yes: po = .95
    // pe_gamma = 2 * .925*.075 = .13875 -> AC1 = .81125/.86125
    val rows = Seq.fill(90)(("y", "y")) ++ Seq.fill(5)(("n", "n")) ++
      Seq.fill(3)(("y", "n")) ++ Seq.fill(2)(("n", "y"))
    val df = createDf(spark, "a string, b string",
      rows.map { case (x, y) => Seq[Any](x, y) })
    val r = Stats.gwetAc1(df, col("a"), col("b")).head()
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) == 0.95)
    assert(r.getDouble(2) == 0.13875)
    assert(r.getDouble(3) == 0.941945)
    val k = Stats.cohenKappa(df, col("a"), col("b")).head().getDouble(3)
    assert(r.getDouble(3) > k, s"AC1 ${r.getDouble(3)} should beat kappa $k here")
  }

  test("gwetAc1: single category nulls out; invariant to partitioning") {
    val mono = createDf(spark, "a string, b string",
      Seq.fill(6)(Seq[Any]("x", "x")))
    val r = Stats.gwetAc1(mono, col("a"), col("b")).head()
    assert(r.getDouble(1) == 1.0 && r.isNullAt(3))
    val rows = (0 until 300).map(i =>
      Seq[Any](s"c${i % 3}", s"c${(i * 7) % 4}"))
    val df = createDf(spark, "a string, b string", rows)
    val one = Stats.gwetAc1(df.coalesce(1), col("a"), col("b")).head()
    val many = Stats.gwetAc1(df.repartition(11), col("a"), col("b")).head()
    assert(one == many)
  }

  private def fleiss(items: Seq[(Int, String, String, String)]): org.apache.spark.sql.Row = {
    val df = createDf(spark, "id int, r0 string, r1 string, r2 string",
      items.map { case (i, a, b, c) => Seq[Any](i, a, b, c) })
    Stats.fleissKappa(df, col("id"), Seq(col("r0"), col("r1"), col("r2"))).head()
  }

  test("fleissKappa: hand-worked 2-item 3-rater table gives kappa 0.25") {
    // item 1: AAA (P_1 = 1); item 2: ABB (P_2 = 1/3); p_A = 2/3, p_B = 1/3
    // pbar = 2/3, pe = 5/9, kappa = (2/3 - 5/9)/(4/9) = 1/4
    val r = fleiss(Seq((1, "A", "A", "A"), (2, "A", "B", "B")))
    assert(r.getLong(0) == 2L && r.getInt(1) == 3)
    assert(r.getDouble(2) == 0.666667)
    assert(r.getDouble(3) == 0.555556)
    assert(r.getDouble(4) == 0.25)
  }

  test("fleissKappa: unanimous raters with varied categories give kappa 1") {
    val r = fleiss(Seq((1, "A", "A", "A"), (2, "B", "B", "B"), (3, "A", "A", "A")))
    assert(r.getDouble(2) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("fleissKappa: one constant category everywhere -> pe 1, kappa null") {
    val r = fleiss(Seq((1, "x", "x", "x"), (2, "x", "x", "x")))
    assert(r.getDouble(3) == 1.0)
    assert(r.isNullAt(4))
  }

  test("fleissKappa: items with a null id or any null rating drop") {
    val df = createDf(spark, "id int, r0 string, r1 string, r2 string",
      Seq(Seq[Any](1, "A", "A", "A"), Seq[Any](2, "A", "B", "B"),
        Seq[Any](null, "A", "A", "A"), Seq[Any](3, "A", null, "B")))
    val r = Stats.fleissKappa(df, col("id"),
      Seq(col("r0"), col("r1"), col("r2"))).head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(4) == 0.25)
  }

  test("fleissKappa: invariant to partitioning") {
    val items = (0 until 300).map(i =>
      (i, s"c${i % 3}", s"c${(i * 7) % 4}", s"c${(i * 5) % 3}"))
    val df = createDf(spark, "id int, r0 string, r1 string, r2 string",
      items.map { case (i, a, b, c) => Seq[Any](i, a, b, c) })
    val cols = Seq(col("r0"), col("r1"), col("r2"))
    val one = Stats.fleissKappa(df.coalesce(1), col("id"), cols).head()
    val many = Stats.fleissKappa(df.repartition(13), col("id"), cols).head()
    assert(one == many)
  }
}
