package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = createDf(spark, "sym string, ts timestamp, px double", Seq(
    Seq[Any]("A", ts("2024-01-01 10:00:00"), 100.0),
    Seq[Any]("A", ts("2024-01-01 10:05:00"), 101.0),
    Seq[Any]("B", ts("2024-01-01 10:02:00"), 50.0)))

  private def trades = createDf(spark, "trade_id int, sym string, ts timestamp", Seq(
    Seq[Any](1, "A", ts("2024-01-01 10:03:00")), // -> 100.0
    Seq[Any](2, "A", ts("2024-01-01 10:05:00")), // tie -> 101.0 (at-or-before)
    Seq[Any](3, "A", ts("2024-01-01 09:00:00")), // no prior quote -> null
    Seq[Any](4, "B", ts("2024-01-01 11:00:00")), // -> 50.0
    Seq[Any](5, "C", ts("2024-01-01 10:00:00")))) // unseen key -> null

  test("backward as-of: greatest right ts at-or-before, per key; null when none") {
    val out = AsOf.asofJoinBackward(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .collect().map(r => r.getAs[Int]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out == Map(
      1 -> Some(100.0), 2 -> Some(101.0), 3 -> None, 4 -> Some(50.0), 5 -> None))
  }

  test("matched row's own null payload stays null (no stale fill-through)") {
    val q = createDf(spark, "sym string, ts timestamp, px double", Seq(
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 10.0),
      Seq[Any]("A", ts("2024-01-01 10:02:00"), null))) // matched row, null px
    val tr = createDf(spark, "trade_id int, sym string, ts timestamp",
      Seq(Seq[Any](1, "A", ts("2024-01-01 10:03:00"))))
    val out = AsOf.asofJoinBackward(tr, q, Seq("sym"), "ts", "ts", Seq("px")).head()
    // match IS the 10:02 row (asof_ts set), and its null px must NOT be
    // replaced by the older row's 10.0
    assert(out.getAs[Timestamp]("asof_ts") == ts("2024-01-01 10:02:00"))
    assert(out.getAs[Any]("asof_px") == null)
  }

  test("reserved/colliding left column names are rejected up front") {
    val bad = createDf(spark, "sym string, ts timestamp, __side int",
      Seq(Seq[Any]("A", ts("2024-01-01 10:00:00"), 1)))
    intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(bad, quotes, Seq("sym"), "ts", "ts", Seq("px"))
    }
  }

  test("rightTieBreak picks the greatest tiebreak among exact (key, ts) duplicates") {
    val q = createDf(spark, "sym string, ts timestamp, px double, seq int", Seq(
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 10.0, 1),
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 20.0, 2),
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 15.0, 3)))
    val tr = createDf(spark, "trade_id int, sym string, ts timestamp",
      Seq(Seq[Any](1, "A", ts("2024-01-01 10:01:00"))))
    val out = AsOf.asofJoinBackward(tr, q, Seq("sym"), "ts", "ts", Seq("px", "seq"),
      rightTieBreak = Seq("seq")).head()
    // greatest seq (3) wins deterministically, and its payload is atomic
    assert(out.getAs[Int]("asof_seq") == 3)
    assert(out.getAs[Double]("asof_px") == 15.0)
  }

  test("tolerance nulls out stale matches") {
    val out = AsOf.asofJoinBackward(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"),
        toleranceUs = Some(10L * 60 * 1000000)) // 10 minutes
      .collect().map(r => r.getAs[Int]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out(4) == None) // 58 minutes stale
    assert(out(1) == Some(100.0))
  }
}
