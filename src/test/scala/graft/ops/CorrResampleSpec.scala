package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class CorrExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0, 2.0), ("a", 2.0, 4.5), ("a", 3.0, 5.5), ("a", 4.0, 8.25),
    ("b", 1.0, 9.0), ("b", 2.0, 7.0), ("b", 3.0, 5.0),
  ).toDF("k", "x", "y")

  test("corrExact matches the naive driver-side Pearson r") {
    val got = Profile.corrExact(df, Seq("k"), Seq("x" -> "y"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("corr")).toMap
    def naive(rows: Seq[(Double, Double)]): Double = {
      val n = rows.size.toDouble
      val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
      val sxy = rows.map(p => p._1 * p._2).sum
      val sxx = rows.map(p => p._1 * p._1).sum
      val syy = rows.map(p => p._2 * p._2).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val byK = df.collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(math.abs(got("a") - naive(byK("a"))) < 1e-12)
    assert(math.abs(got("b") - naive(byK("b"))) < 1e-12)
  }

  test("pairwise null deletion: a null on either side drops only that row") {
    val withNulls = createDf(spark, "k string, x double, y double", Seq(
      Seq[Any]("a", 1.0, 2.0), Seq[Any]("a", 2.0, null),
      Seq[Any]("a", null, 9.0), Seq[Any]("a", 3.0, 6.0), Seq[Any]("a", 5.0, 10.0)))
    val r = Profile.corrExact(withNulls, Seq("k"), Seq("x" -> "y")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12) // (1,2),(3,6),(5,10) linear
  }

  test("assumeComplete (shared moments) matches the pairwise path on null-free data") {
    val ps = Seq("x" -> "y", "x" -> "x", "y" -> "x")
    val slow = Profile.corrExact(df, Seq("k"), ps)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n"), r.getAs[Double]("corr"))).toSet
    val fast = Profile.corrExact(df, Seq("k"), ps, assumeComplete = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n"), r.getAs[Double]("corr"))).toSet
    assert(fast == slow) // bit-identical: same decimal sums, same closed form
  }

  test("corrExactScaled (long-moment fast path) agrees with corrExact") {
    val ps = Seq("x" -> "y", "x" -> "x")
    val slow = Profile.corrExact(df, Seq("k"), ps, assumeComplete = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getAs[Double]("corr")).toMap
    val fast = Profile.corrExactScaled(df, Seq("k"), ps,
        Map("x" -> 2, "y" -> 2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getAs[Double]("corr")).toMap
    assert(slow.keySet == fast.keySet)
    for ((k, v) <- slow) assert(math.abs(v - fast(k)) < 1e-12, s"$k: $v vs ${fast(k)}")
  }

  test("corrExactScaled rejects pairs with undeclared decimal places") {
    intercept[IllegalArgumentException] {
      Profile.corrExactScaled(df, Nil, Seq("x" -> "y"), Map("x" -> 2))
    }
  }

  test("zero-variance side yields null corr, not NaN or crash") {
    val flat = Seq(("a", 1.0, 7.0), ("a", 2.0, 7.0)).toDF("k", "x", "y")
    val r = Profile.corrExact(flat, Seq("k"), Seq("x" -> "y")).head()
    assert(r.isNullAt(r.fieldIndex("corr")))
  }

  test("ungrouped (global) mode and several pairs in one pass") {
    val out = Profile.corrExact(df, Nil, Seq("x" -> "y", "x" -> "x"))
    assert(out.count() == 2)
    assert(math.abs(out.filter(col("x_col") === "x" && col("y_col") === "x")
      .head().getAs[Double]("corr") - 1.0) < 1e-12)
  }
}

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def series = Seq(
    (1L, ts("2024-03-01 00:10:00"), 10.0),
    (1L, ts("2024-03-01 00:40:00"), 2.0),
    (1L, ts("2024-03-01 03:05:00"), 5.0), // 2-hour hole: buckets 01,02 empty
    (2L, ts("2024-03-01 10:30:00"), 1.0),
    (2L, ts("2024-03-01 11:15:00"), 7.0), // dense series: no gaps
  ).toDF("uid", "ts", "v")

  private def resampled = Timeseries.resampleGapFill(series, Seq("uid"), "ts",
    stepSeconds = 3600, aggs = Seq(sum(col("v")).as("sv")))

  test("grid is dense per series: every step between min and max appears once") {
    val got = resampled.filter(col("uid") === 1L)
      .select(date_format(col("bucket_ts"), "HH:mm").as("b")).as[String]
      .collect().sorted.toSeq
    assert(got == Seq("00:00", "01:00", "02:00", "03:00"))
    assert(resampled.filter(col("uid") === 2L).count() == 2)
  }

  test("observed buckets aggregate; gap buckets are flagged and forward-filled") {
    val rows = resampled.filter(col("uid") === 1L)
      .orderBy(col("bucket_ts"))
      .select(col("sv"), col("is_gap"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1))).toSeq
    assert(rows == Seq((12.0, false), (12.0, true), (12.0, true), (5.0, false)))
  }

  test("series never bleed into each other (grid and fill are per-key)") {
    val u2 = resampled.filter(col("uid") === 2L).orderBy(col("bucket_ts"))
      .select(col("sv"), col("is_gap"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1))).toSeq
    assert(u2 == Seq((1.0, false), (7.0, false)))
  }

  test("timeBucket floors to the step grid in microsecond arithmetic") {
    val out = series.select(date_format(
      Timeseries.timeBucket(col("ts"), 1800), "HH:mm").as("b"))
      .as[String].collect().toSeq
    assert(out == Seq("00:00", "00:30", "03:00", "10:30", "11:00"))
  }

  test("invalid arguments fail fast") {
    intercept[IllegalArgumentException](
      Timeseries.resampleGapFill(series, Seq("uid"), "ts", 0, Seq(sum(col("v")).as("s"))))
    intercept[IllegalArgumentException](
      Timeseries.resampleGapFill(series, Nil, "ts", 60, Seq(sum(col("v")).as("s"))))
    intercept[IllegalArgumentException](
      Timeseries.resampleGapFill(series.withColumn("is_gap", lit(true)),
        Seq("uid"), "ts", 60, Seq(sum(col("v")).as("s"))))
  }
}
