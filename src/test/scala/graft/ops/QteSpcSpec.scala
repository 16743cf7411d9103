package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for QTE, the Shewhart individuals chart, and the
  * Oaxaca-Blinder decomposition.
  */
class QteSpcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("quantileTreatmentEffect: a +5 location shift shows qte 5 everywhere") {
    val rows = (1 to 10).map(i => Seq[Any](false, i.toDouble)) ++
      (1 to 10).map(i => Seq[Any](true, i.toDouble + 5.0))
    val df = createDf(spark, "t boolean, v double", rows)
    val out = Stats.quantileTreatmentEffect(df, col("t"), col("v"),
        Seq((1, 4), (1, 2), (3, 4)))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(6)).toMap
    assert(out((1, 4)) == 5.0 && out((1, 2)) == 5.0 && out((3, 4)) == 5.0)
  }

  test("controlChart: one 30 in a tame series breaches the upper limit") {
    val xs = Seq(10.0, 12.0, 11.0, 13.0, 10.0, 30.0)
    val df = createDf(spark, "g string, t int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v) })
    val r = Timeseries.controlChart(df, Seq("g"), col("t"), col("v"))
      .collect().head
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == 14.333333)   // mean
    assert(r.getDouble(3) == 5.6)         // MR̄ = 28/5
    assert(r.getDouble(4) == 29.229333)   // x̄ + 2.66·MR̄
    assert(r.getLong(6) == 1L && r.getLong(7) == 0L)
  }

  test("oaxacaBlinder: equal endowments put the whole gap on coefficients") {
    // same x̄; treated returns 4/hour vs control 2/hour
    val rows = Seq((1.0, 10.0), (2.0, 14.0), (3.0, 18.0)).map {
      case (x, y) => Seq[Any](true, y, x) } ++ // y = 6+4x
      Seq((1.0, 8.0), (2.0, 10.0), (3.0, 12.0)).map {
        case (x, y) => Seq[Any](false, y, x) } // y = 6+2x
    val df = createDf(spark, "t boolean, y double, x double", rows)
    val r = Stats.oaxacaBlinder(df, col("t"), col("y"), col("x"))
      .collect().head
    assert(r.getDouble(2) == 4.0) // gap
    assert(r.getDouble(3) == 0.0) // endowment: same x̄
    assert(r.getDouble(4) == 4.0) // coefficient
    assert(r.getDouble(5) == 0.0) // interaction
  }

  test("oaxacaBlinder: shifted endowments split the gap and sum exactly") {
    val rows = Seq((2.0, 14.0), (3.0, 18.0), (4.0, 22.0)).map {
      case (x, y) => Seq[Any](true, y, x) } ++  // y = 6+4x at x̄ = 3
      Seq((1.0, 8.0), (2.0, 10.0), (3.0, 12.0)).map {
        case (x, y) => Seq[Any](false, y, x) }  // y = 6+2x at x̄ = 2
    val r = Stats.oaxacaBlinder(createDf(spark, "t boolean, y double, x double",
      rows), col("t"), col("y"), col("x")).collect().head
    assert(r.getDouble(2) == 8.0)
    assert(r.getDouble(3) == 2.0) // β_c·Δx̄
    assert(r.getDouble(4) == 4.0)
    assert(r.getDouble(5) == 2.0)
    assert(r.getDouble(3) + r.getDouble(4) + r.getDouble(5) == r.getDouble(2))
  }
}
