package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class OutliersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // group g: 1..11 plus a wild 1000; group h: all-identical except one
  private def df = ((1 to 11).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
    .++(Seq(("h", 5.0), ("h", 5.0), ("h", 5.0), ("h", 9.0)))
    .toDF("k", "v")

  test("iqrBounds computes exact interpolated quartiles per group") {
    val r = Outliers.iqrBounds(df, Seq("k"), col("v")).filter(col("k") === "g").head()
    // 12 values 1..11,1000: q1 at pos 0.25*11=2.75 -> 3.75; q3 at 8.25 -> 9.25
    assert(r.getAs[Double]("q1") == 3.75 && r.getAs[Double]("q3") == 9.25)
    assert(r.getAs[Double]("lo") == 3.75 - 1.5 * 5.5)
    assert(r.getAs[Double]("hi") == 9.25 + 1.5 * 5.5)
  }

  test("flagIqrOutliers flags exactly the fence-crossing rows") {
    val flagged = Outliers.flagIqrOutliers(df, Seq("k"), "v")
      .filter(col("is_outlier")).select("k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    // h: q3 = 5 + 0.25·(9-5) = 6, hi = 6 + 1.5·1 = 7.5 -> 9.0 crosses it
    assert(flagged == Set(("g", 1000.0), ("h", 9.0)))
  }

  test("flagMadOutliers: robust to the same extreme; zero-MAD group flags deviants") {
    val flagged = Outliers.flagMadOutliers(df, Seq("k"), "v")
      .filter(col("is_outlier")).select("k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    // g: median 6.5ish, MAD small -> 1000 flagged; h: MAD=0 (median 5),
    // the single 9.0 deviates from the median -> flagged
    assert(flagged == Set(("g", 1000.0), ("h", 9.0)))
  }

  test("winsorize clamps into the group percentile band and keeps row count") {
    val w = Outliers.winsorize(df, Seq("k"), "v", pLo = 0.0, pHi = 0.9)
    assert(w.count() == df.count())
    val gMax = w.filter(col("k") === "g").agg(max("v")).head().getDouble(0)
    // p90 of 1..11,1000 at pos 9.9 -> 10 + 0.9*(11-10) = 10.9
    assert(gMax == 10.9)
    intercept[IllegalArgumentException](
      Outliers.winsorize(df, Seq("k"), "v", pLo = 0.5, pHi = 0.5))
  }

  test("winsorize keeps nulls null (no fabricated lower-bound values)") {
    import graft.testing.DfAssert.createDf
    val withNull = createDf(spark, "k string, v double", Seq(
      Seq[Any]("g", 1.0), Seq[Any]("g", 2.0), Seq[Any]("g", 3.0), Seq[Any]("g", null)))
    val out = Outliers.winsorize(withNull, Seq("k"), "v", pLo = 0.25, pHi = 0.75)
    assert(out.filter(col("v").isNull).count() == 1)
  }

  test("reserved output names are rejected, not silently clobbered") {
    val poisoned = df.withColumn("is_outlier", lit("user data"))
    intercept[IllegalArgumentException](
      Outliers.flagIqrOutliers(poisoned, Seq("k"), "v"))
    intercept[IllegalArgumentException](
      Outliers.flagMadOutliers(poisoned, Seq("k"), "v"))
    intercept[IllegalArgumentException](
      Outliers.winsorize(df.withColumn("__wlo", lit(0)), Seq("k"), "v"))
  }

  test("IQR agrees with a driver-side naive quantile on random data") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(101)(math.floor(rng.nextDouble() * 1000) / 4) // quarter-grid
    val d = vals.map(("r", _)).toDF("k", "v")
    val r = Outliers.iqrBounds(d, Seq("k"), col("v")).head()
    val sorted = vals.sorted
    def q(p: Double): Double = {
      val pos = p * (sorted.size - 1)
      val lo = pos.toInt
      sorted(lo) + (sorted(math.min(lo + 1, sorted.size - 1)) - sorted(lo)) * (pos - lo)
    }
    assert(r.getAs[Double]("q1") == q(0.25) && r.getAs[Double]("q3") == q(0.75))
  }
}
