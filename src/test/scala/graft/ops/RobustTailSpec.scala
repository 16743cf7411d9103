package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for the Hampel screen and tail dependence. */
class RobustTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hampelOutliers: {1..9, 100} has median 5, MAD 2, one flag") {
    // lower median of 1..9,100 is 5; |d| = 4,3,2,1,0,1,2,3,4,95 →
    // sorted 0,1,1,2,2,3,3,4,4,95 → lower median (10th/2=5th) = 2
    val df = createDf(spark, "g string, v double",
      ((1 to 9).map(_.toDouble) :+ 100.0).map(v => Seq[Any]("g", v)))
    val r = Stats.hampelOutliers(df, Seq("g"), col("v")).collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == 2.0)
    assert(r.getLong(4) == 1L) // only 95 > 3.5·2
  }

  test("hampelOutliers: majority-constant group flags any deviation (MAD 0)") {
    val df = createDf(spark, "g string, v double",
      (Seq.fill(5)(3.0) :+ 3.1).map(v => Seq[Any]("g", v)))
    val r = Stats.hampelOutliers(df, Seq("g"), col("v")).collect().head
    assert(r.getDouble(3) == 0.0 && r.getLong(4) == 1L)
  }

  test("tailDependence: co-spiking pairs give lambda 1, independent tails 0") {
    // 10 pairs; both series spike together on the last one
    val rows = (1 to 9).map(i => Seq[Any](i.toDouble, (10 - i).toDouble)) :+
      Seq[Any](100.0, 100.0)
    val df = createDf(spark, "x double, y double", rows)
    val r = Stats.tailDependence(df, col("x"), col("y"), 9, 10).collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 9.0 && r.getDouble(2) == 9.0) // 90th pct thresholds
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 1.0)
    assert(r.getDouble(8) == 10.0) // perfect tail lift = n
    // anti-dependent: x spikes where y is low
    val anti = (1 to 9).map(i => Seq[Any](i.toDouble, (10 - i).toDouble)) :+
      Seq[Any](100.0, 0.5)
    val r2 = Stats.tailDependence(createDf(spark, "x double, y double", anti),
      col("x"), col("y"), 9, 10).collect().head
    assert(r2.getLong(5) == 0L && r2.getDouble(6) == 0.0)
  }
}
