package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class PriceIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // two items, two periods; item prices double/halve with fixed quantities
  private def tx = createDf(spark, "item int, pd string, exp double, qty double", Seq(
    Seq[Any](1, "p0", 10.0, 10.0), // p=1
    Seq[Any](2, "p0", 40.0, 10.0), // p=4
    Seq[Any](1, "p1", 20.0, 10.0), // p=2 (doubled)
    Seq[Any](2, "p1", 20.0, 10.0), // p=2 (halved)
  ))

  private def run = PriceIndex.bilateralIndexes(tx, "item", col("pd"), "exp", "qty", "p0")
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  test("hand-checked Laspeyres/Paasche/Fisher; base period is exactly 1") {
    val r = run
    assert(r("p0") == ((2L, 1.0, 1.0, 1.0)))
    // L = (2*10 + 2*10) / (1*10 + 4*10) = 40/50 = 0.8
    // equal quantities both periods → Paasche = Laspeyres here
    val (n, l, p, f) = r("p1")
    assert(n == 2L && l == 0.8 && p == 0.8)
    assert(math.abs(f - 0.8) < 1e-9) // sqrt(0.8 * 0.8)
  }

  test("elementary formulas: hand-checked Carli/Dutot/Jevons and the AM>=GM bias") {
    val r = PriceIndex.elementaryIndexes(tx, "item", col("pd"), "exp", "qty", "p0")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(r("p0") == ((2L, 1.0, 1.0, 1.0)))
    val (n, carli, dutot, jevons) = r("p1")
    // relatives: item1 2/1 = 2, item2 2/4 = 0.5
    assert(n == 2L && carli == 1.25)            // (2 + 0.5) / 2
    assert(dutot == 0.8)                        // (2+2)/(1+4)
    assert(math.abs(jevons - 1.0) < 1e-6)       // sqrt(2 · 0.5) = 1
    assert(carli >= jevons)                     // Carli's AM >= GM upward bias
  }

  test("matched-sample: an item absent from the base period never enters") {
    val withNew = createDf(spark, "item int, pd string, exp double, qty double",
      Seq(Seq[Any](3, "p1", 1000.0, 1.0))) // item 3 trades only in p1
    val r = PriceIndex.bilateralIndexes(tx.union(withNew), "item", col("pd"),
        "exp", "qty", "p0")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(r("p1")._1 == 2L && r("p1")._2 == 0.8) // unchanged by the unmatched item
  }

  test("index is invariant to row order and partitioning (micro-quantized sums)") {
    val shuffled = tx.repartition(7, col("qty")).sortWithinPartitions(col("exp").desc)
    val a = PriceIndex.bilateralIndexes(shuffled, "item", col("pd"), "exp", "qty", "p0")
      .collect().map(_.toSeq).toSet
    val b = run.map { case (k, (n, l, p, f)) => Seq(k, n, l, p, f) }.toSet
    assert(a == b)
  }
}
