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

  test("forward as-of: smallest right ts at-or-after; null when none follows") {
    val out = AsOf.asofJoinForward(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .collect().map(r => r.getAs[Int]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out == Map(
      1 -> Some(101.0), // next quote at 10:05
      2 -> Some(101.0), // tie: at-or-after includes equal ts
      3 -> Some(100.0), // 09:00 trade -> first quote 10:00
      4 -> None,        // no quote after 11:00
      5 -> None))
  }

  test("nearest as-of picks the closer side; exact ties go backward") {
    val q = createDf(spark, "sym string, ts timestamp, px double", Seq(
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 1.0),
      Seq[Any]("A", ts("2024-01-01 10:10:00"), 2.0)))
    val tr = createDf(spark, "trade_id int, sym string, ts timestamp", Seq(
      Seq[Any](1, "A", ts("2024-01-01 10:02:00")),  // closer to 10:00
      Seq[Any](2, "A", ts("2024-01-01 10:09:00")),  // closer to 10:10
      Seq[Any](3, "A", ts("2024-01-01 10:05:00")),  // exact tie -> backward (1.0)
      Seq[Any](4, "A", ts("2024-01-01 09:00:00")),  // only forward exists
      Seq[Any](5, "A", ts("2024-01-01 23:00:00")))) // only backward exists
    val out = AsOf.asofJoinNearest(tr, q, Seq("sym"), "ts", "ts", Seq("px"))
      .collect().map(r => r.getAs[Int]("trade_id") -> r.getAs[Double]("asof_px")).toMap
    assert(out == Map(1 -> 1.0, 2 -> 2.0, 3 -> 1.0, 4 -> 1.0, 5 -> 2.0))
  }

  test("nearest tolerance bounds the absolute distance") {
    val q = createDf(spark, "sym string, ts timestamp, px double", Seq(
      Seq[Any]("A", ts("2024-01-01 10:00:00"), 1.0)))
    val tr = createDf(spark, "trade_id int, sym string, ts timestamp", Seq(
      Seq[Any](1, "A", ts("2024-01-01 10:04:00")),   // 4 min after -> in
      Seq[Any](2, "A", ts("2024-01-01 09:56:00")),   // 4 min before -> in
      Seq[Any](3, "A", ts("2024-01-01 10:30:00"))))  // 30 min -> out
    val out = AsOf.asofJoinNearest(tr, q, Seq("sym"), "ts", "ts", Seq("px"),
        toleranceUs = Some(5L * 60 * 1000000))
      .collect().map(r => r.getAs[Int]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out == Map(1 -> Some(1.0), 2 -> Some(1.0), 3 -> None))
  }

  test("forward/nearest still plan exactly one exchange (nearest pays a second sort only)") {
    val f = AsOf.asofJoinForward(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(f).length == 1)
    val n = AsOf.asofJoinNearest(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(n).length == 1,
      s"nearest must not re-shuffle:\n${n.take(1500)}")
  }
}
