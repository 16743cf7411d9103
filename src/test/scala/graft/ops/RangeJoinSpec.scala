package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketized range join matches the naive inequality join on random data") {
    val rnd = new scala.util.Random(23)
    def randTs() = new Timestamp(1700000000000L + rnd.nextInt(6 * 3600) * 1000L)
    val pts = createDf(spark, "key string, pid int, ts timestamp",
      (0 until 200).map(i => Seq[Any]("k" + rnd.nextInt(4), i, randTs())))
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp",
      (0 until 60).map { i =>
        val a = randTs()
        val b = new Timestamp(a.getTime + (60 + rnd.nextInt(5400)) * 1000L)
        Seq[Any]("k" + rnd.nextInt(4), i, a, b)
      })
    val bucketized = RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e",
        Seq("iid"), bucketWidthUs = 15L * 60 * 1000000)
      .select("pid", "iv_iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val naive = pts.join(ivs, Seq("key"))
      .filter(col("s") <= col("ts") && col("ts") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(bucketized == naive)
    assert(naive.nonEmpty, "fixture should produce at least one containment")
  }

  test("boundary semantics: inclusive start, configurable end") {
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))))
    val pts = createDf(spark, "key string, pid int, ts timestamp", Seq(
      Seq[Any]("a", 1, ts("2024-01-01 10:00:00")), // at start -> always in
      Seq[Any]("a", 2, ts("2024-01-01 11:00:00")), // at end -> inclusive only
      Seq[Any]("a", 3, ts("2024-01-01 11:00:01")), // after -> never
      Seq[Any]("b", 4, ts("2024-01-01 10:30:00")))) // wrong key -> never
    def ids(inclusive: Boolean) =
      RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e", Seq("iid"),
          inclusiveEnd = inclusive)
        .select("pid").collect().map(_.getInt(0)).toSet
    assert(ids(true) == Set(1, 2))
    assert(ids(false) == Set(1))
  }

  test("reversed intervals are dropped, not exploded") {
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp", Seq(
      Seq[Any]("a", 1, ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00")), // reversed
      Seq[Any]("a", 2, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))))
    val pts = createDf(spark, "key string, pid int, ts timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 10:30:00"))))
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e", Seq("iid"))
      .select("iv_iid").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(2))
  }

  test("extreme-span sentinel intervals are dropped by maxSpanBuckets, kept with None") {
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp", Seq(
      Seq[Any]("a", 1, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")), // sentinel end
      Seq[Any]("a", 2, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))))
    val pts = createDf(spark, "key string, pid int, ts timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 10:30:00"))))
    def ids(maxSpan: Option[Long]) =
      RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e", Seq("iid"),
          bucketWidthUs = 365L * 24 * 3600 * 1000000, // 1-year buckets keep the explode tiny
          maxSpanBuckets = maxSpan)
        .select("iv_iid").collect().map(_.getInt(0)).toSet
    assert(ids(Some(100L)) == Set(2)) // 7975-bucket sentinel dropped pre-explode
    assert(ids(None) == Set(1, 2))    // default keeps genuinely open intervals
  }

  test("default pointInInterval keeps SCD2 open-ended sentinel rows (guard is opt-in)") {
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"))))
    val pts = createDf(spark, "key string, pid int, ts timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-06-01 00:00:00"))))
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e", Seq("iid"),
      bucketWidthUs = 365L * 24 * 3600 * 1000000)
    assert(out.select("iv_iid").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("intervals spanning many buckets still match exactly once per point") {
    val ivs = createDf(spark, "key string, iid int, s timestamp, e timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))))
    val pts = createDf(spark, "key string, pid int, ts timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-02 13:37:00"))))
    val out = RangeJoin.pointInInterval(pts, ivs, Seq("key"), "ts", "s", "e", Seq("iid"),
      bucketWidthUs = 3600L * 1000000) // 49 buckets for the interval
    assert(out.count() == 1)
  }

  test("intervalOverlap matches the naive inequality join on random spans") {
    val rnd = new scala.util.Random(31)
    def randTs() = new Timestamp(1700000000000L + rnd.nextInt(6 * 3600) * 1000L)
    def spans(n: Int, maxLenSec: Int) = (0 until n).map { i =>
      val a = randTs()
      Seq[Any]("k" + rnd.nextInt(3), i, a,
        new Timestamp(a.getTime + (30 + rnd.nextInt(maxLenSec)) * 1000L))
    }
    val a = createDf(spark, "key string, aid int, s1 timestamp, e1 timestamp", spans(120, 3600))
    val b = createDf(spark, "key string, bid int, s2 timestamp, e2 timestamp", spans(50, 7200))
    val bucketized = RangeJoin.intervalOverlap(a, b, Seq("key"),
        "s1", "e1", "s2", "e2", Seq("bid"), bucketWidthUs = 15L * 60 * 1000000)
      .select("aid", "b_bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val naive = a.join(b, Seq("key"))
      .filter(col("s1") < col("e2") && col("s2") < col("e1"))
      .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(bucketized == naive)
    assert(naive.nonEmpty, "fixture should produce overlapping spans")
    // exactly once each, even for multi-bucket overlaps
    val n = RangeJoin.intervalOverlap(a, b, Seq("key"),
      "s1", "e1", "s2", "e2", Seq("bid"), bucketWidthUs = 15L * 60 * 1000000).count()
    assert(n == naive.size.toLong)
  }

  test("intervalOverlap is half-open: touching endpoints do not overlap") {
    val a = createDf(spark, "key string, aid int, s1 timestamp, e1 timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))))
    val b = createDf(spark, "key string, bid int, s2 timestamp, e2 timestamp", Seq(
      Seq[Any]("a", 1, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // touches
      Seq[Any]("a", 2, ts("2024-01-01 10:59:59"), ts("2024-01-01 12:00:00")), // 1s overlap
      Seq[Any]("a", 3, ts("2024-01-01 08:00:00"), ts("2024-01-01 10:00:00")))) // touches from left
    val got = RangeJoin.intervalOverlap(a, b, Seq("key"),
        "s1", "e1", "s2", "e2", Seq("bid"))
      .select("b_bid").collect().map(_.getInt(0)).toSet
    assert(got == Set(2))
  }

  test("intervalOverlap drops reversed and extreme-span rows before exploding") {
    val a = createDf(spark, "key string, aid int, s1 timestamp, e1 timestamp",
      Seq(Seq[Any]("a", 1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))))
    val b = createDf(spark, "key string, bid int, s2 timestamp, e2 timestamp", Seq(
      Seq[Any]("a", 1, ts("2024-01-01 12:00:00"), ts("2024-01-01 09:00:00")), // reversed
      Seq[Any]("a", 2, ts("2024-01-01 10:30:00"), ts("9999-01-01 00:00:00")))) // sentinel end
    val got = RangeJoin.intervalOverlap(a, b, Seq("key"),
      "s1", "e1", "s2", "e2", Seq("bid"), maxSpanBuckets = Some(1000L))
    assert(got.count() == 0)
  }
}
