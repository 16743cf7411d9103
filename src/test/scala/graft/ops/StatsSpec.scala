package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("joinSizeExact equals the materialized join's count") {
    val a = createDf(spark, "k int, va int",
      Seq(1, 1, 1, 2, 3, 3, 7).zipWithIndex.map { case (k, i) => Seq[Any](k, i) })
    val b = createDf(spark, "k int, vb int",
      Seq(1, 2, 2, 3, 9).zipWithIndex.map { case (k, i) => Seq[Any](k, i) })
    val est = Stats.joinSizeExact(a, "k", b, "k").head()
    val actual = a.join(b, Seq("k")).count()
    assert(est.getDecimal(0).longValueExact() == actual) // 3*1 + 1*2 + 2*1 = 7
    assert(est.getLong(1) == 3L) // keys 1, 2, 3 match
    assert(est.getDecimal(2).longValueExact() == 3L) // key 1 contributes most pairs
  }

  test("joinSizeExact with no overlapping keys is zero, not empty") {
    val a = createDf(spark, "k int", Seq(Seq[Any](1)))
    val b = createDf(spark, "k int", Seq(Seq[Any](2)))
    val r = Stats.joinSizeExact(a, "k", b, "k").head()
    assert(r.getDecimal(0).longValueExact() == 0L && r.getLong(1) == 0L)
  }

  test("law: CMS join-size bound never undercounts, random frames and narrow widths") {
    val rnd = new scala.util.Random(8)
    for (trial <- 1 to 5) {
      def frame() = createDf(spark, "k int",
        Seq.fill(50 + rnd.nextInt(100))(Seq[Any](rnd.nextInt(20))))
      val (a, b) = (frame(), frame())
      val exact = a.join(b, Seq("k")).count()
      // deliberately tiny width forces collisions — the bound must hold anyway
      val bound = Stats.joinSizeUpperBound(a, "k", b, "k", depth = 3, width = 8)
        .head().getDecimal(0).longValueExact()
      assert(bound >= exact, s"trial $trial: bound $bound < exact $exact")
    }
  }

  test("CMS bound equals the documented min_d formula, zero-overlap depths included") {
    // few keys + wide sketch: most depths have NO overlapping cells for
    // disjoint key sets — those depths must contribute 0 to the min
    val a = createDf(spark, "k int", (1 to 3).map(i => Seq[Any](i)))
    val b = createDf(spark, "k int", (1001 to 1003).map(i => Seq[Any](i)))
    val (depth, width) = (6, 1 << 10)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Stats.cmsTable(df, "k", depth, width).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (ca, cb) = (cells(a), cells(b))
    val reference = (0 until depth).map { d =>
      ca.collect { case ((`d`, w), c) => c * cb.getOrElse((d, w), 0L) }.sum
    }.min
    val bound = Stats.joinSizeUpperBound(a, "k", b, "k", depth, width)
      .head().getDecimal(0).longValueExact()
    assert(bound == reference, s"bound $bound != formula $reference")
    assert(bound == 0L, "3v3 disjoint keys in a 1024-wide sketch: some depth must separate them")
  }

  test("CMS bound: an empty side yields 0, never null") {
    val a = createDf(spark, "k int", (1 to 10).map(i => Seq[Any](i)))
    val empty = a.filter(col("k") < 0)
    val r = Stats.joinSizeUpperBound(a, "k", empty, "k", depth = 3, width = 16).head()
    assert(!r.isNullAt(0) && r.getDecimal(0).longValueExact() == 0L)
  }

  test("CMS bound is tight when the width dominates the key space") {
    val a = createDf(spark, "k int", (1 to 50).map(i => Seq[Any](i % 10)))
    val exact = a.join(a, Seq("k")).count()
    val bound = Stats.joinSizeUpperBound(a, "k", a, "k", depth = 5, width = 1 << 14)
      .head().getDecimal(0).longValueExact()
    assert(bound == exact, s"collision-free sketch must be exact: $bound vs $exact")
  }

  test("proportionCi: Wilson interval brackets p_hat and stays inside [0,1]") {
    val df = createDf(spark, "g string, ok int",
      (1 to 20).map(i => Seq[Any]("a", if (i <= 19) 1 else 0)) ++ // 19/20
        (1 to 5).map(_ => Seq[Any]("b", 0))) // 0/5
    val r = Stats.proportionCi(df, Seq("g"), col("ok") === 1)
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n") == 20 && a.getAs[Long]("x") == 19)
    assert(a.getAs[Double]("ci_lo") > 0.7 && a.getAs[Double]("ci_hi") < 1.0)
    assert(a.getAs[Double]("ci_lo") < 0.95 && a.getAs[Double]("ci_hi") > 0.95)
    val b = r("b")
    assert(b.getAs[Double]("p_hat") == 0.0)
    assert(b.getAs[Double]("ci_lo") >= 0.0) // Wilson never goes negative
    assert(b.getAs[Double]("ci_hi") > 0.0 && b.getAs[Double]("ci_hi") < 0.6)
  }

  test("proportionCi matches the closed-form Wilson formula exactly") {
    val df = createDf(spark, "ok int", (1 to 10).map(i => Seq[Any](if (i <= 7) 1 else 0)))
    val r = Stats.proportionCi(df, Nil, col("ok") === 1, z = 1.96).head()
    val (n, p, z) = (10.0, 0.7, 1.96)
    val denom = 1.0 + z * z / n
    val center = p + z * z / (2.0 * n)
    val spread = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    assert(math.abs(r.getAs[Double]("ci_lo") - (center - spread) / denom) < 1e-15)
    assert(math.abs(r.getAs[Double]("ci_hi") - (center + spread) / denom) < 1e-15)
  }
}
