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

  test("tolerance nulls out stale matches") {
    val out = AsOf.asofJoinBackward(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"),
        toleranceUs = Some(10L * 60 * 1000000)) // 10 minutes
      .collect().map(r => r.getAs[Int]("trade_id") -> Option(r.getAs[Any]("asof_px"))).toMap
    assert(out(4) == None) // 58 minutes stale
    assert(out(1) == Some(100.0))
  }
}
