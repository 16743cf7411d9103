package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf
import graft.text.Dedup

/** Hand-checked values for the Bortkiewicz gap decomposition, effective
  * sample size, and shingle novelty.
  */
class GapNoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bortkiewicz: perfect substitution gives corr −1 and recovers direct Paasche") {
    // base 01: item1 p=1 q=10, item2 p=2 q=5 (equal value weights 10);
    // period 02: item1 doubles and halves, item2 holds and doubles —
    // textbook substitution. Direct Paasche = 30/25 = 1.2.
    val rows = Seq(
      Seq[Any](1, "01", 10.0, 10.0), Seq[Any](2, "01", 10.0, 5.0),
      Seq[Any](1, "02", 10.0, 5.0), Seq[Any](2, "02", 20.0, 10.0))
    val df = createDf(spark, "it int, pd string, e double, q double", rows)
    val out = PriceIndex.bortkiewicz(df, "it", col("pd"), "e", "q", "01")
      .filter(col("period") === "02").collect().head
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(2) == 1.5)   // Laspeyres
    assert(out.getDouble(3) == 1.25)  // quantity Laspeyres
    assert(out.getDouble(4) == 1.2)   // identity-implied Paasche = direct
    assert(out.getDouble(5) == -0.2)  // gap
    assert(out.getDouble(6) == -1.0)  // perfect negative substitution
  }

  test("effectiveSampleSize: 12-point noise series matches the replica") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0)
    val df = createDf(spark, "g string, t int, v double",
      xs.zipWithIndex.map { case (v, i) => Seq[Any]("g", 100 + i, v) })
    val r = Timeseries.effectiveSampleSize(df, Seq("g"), col("t"), col("v"),
      maxLag = 6).collect().head
    assert(r.getLong(1) == 12L)
    assert(r.getDouble(2) == -0.042452)
    assert(r.getDouble(3) == 13.113378) // mild negative ρ: worth MORE than n
  }

  test("shingleNovelty: shared 5-gram halves novelty; short docs score null") {
    val rows = Seq(
      Seq[Any](1L, "a b c d e f"), // shingles: abcde, bcdef
      Seq[Any](2L, "a b c d e x"), // shingles: abcde, bcdex
      Seq[Any](3L, "z z z"))       // too short: 0 shingles
    val df = createDf(spark, "doc_id bigint, text string", rows)
    val out = Dedup.shingleNovelty(df, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5))) // "a b c d e" shared with doc 2
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((0L, 0L, -1.0))) // null novelty
  }
}
