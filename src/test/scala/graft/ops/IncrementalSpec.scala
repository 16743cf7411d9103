package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}
import Incremental.{aggState, mergeState, MAgg}

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val aggs = Seq(MAgg("v", "sum"), MAgg("v", "count"),
    MAgg("v", "min"), MAgg("v", "max"))

  private def batch(rows: (String, Double)*) =
    createDf(spark, "k string, v double", rows.map(r => Seq[Any](r._1, r._2)))

  private def readable(state: org.apache.spark.sql.DataFrame) =
    state.select(col("k"), col("sum_v").cast("double"), col("count_v"),
      col("min_v"), col("max_v"))

  test("merging batch states equals aggregating the union directly") {
    val b1 = batch("a" -> 1.0, "a" -> 2.0, "b" -> 10.0)
    val b2 = batch("a" -> 4.0, "c" -> 7.0)
    val merged = readable(mergeState(aggState(b1, Seq("k"), aggs), b2, Seq("k"), aggs))
    val direct = readable(aggState(b1.unionByName(b2), Seq("k"), aggs))
    assertDfEquality(merged, direct)
  }

  test("merge is order-insensitive and associative across three batches") {
    val bs = Seq(batch("a" -> 1.0, "b" -> 5.0), batch("a" -> 3.0), batch("b" -> 2.0, "c" -> 9.0))
    val leftFold = bs.tail.foldLeft(aggState(bs.head, Seq("k"), aggs))(
      (st, b) => mergeState(st, b, Seq("k"), aggs))
    val reversed = bs.reverse.tail.foldLeft(aggState(bs.reverse.head, Seq("k"), aggs))(
      (st, b) => mergeState(st, b, Seq("k"), aggs))
    assertDfEquality(readable(leftFold), readable(reversed))
  }

  test("keys absent from the delta keep their state; new keys appear") {
    val st = aggState(batch("a" -> 1.0), Seq("k"), aggs)
    val merged = readable(mergeState(st, batch("z" -> 4.0), Seq("k"), aggs))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(merged == Map("a" -> (1.0, 1L), "z" -> (4.0, 1L)))
  }

  test("non-mergeable aggregate names raise") {
    intercept[IllegalArgumentException] {
      aggState(batch("a" -> 1.0), Seq("k"), Seq(MAgg("v", "avg")))
    }
  }

  test("HLL sketch state: merge(history, delta) estimates the full distinct count") {
    val hist = createDf(spark, "k string, u bigint", Seq(
      Seq[Any]("a", 1L), Seq[Any]("a", 2L), Seq[Any]("a", 3L), Seq[Any]("b", 10L)))
    val delta = createDf(spark, "k string, u bigint", Seq(
      Seq[Any]("a", 2L), Seq[Any]("a", 4L), Seq[Any]("b", 11L)))
    val merged = Incremental.hllMergeState(
      Incremental.hllState(hist, Seq("k"), "u"), delta, Seq("k"), "u")
      .select(col("k"), Incremental.hllCount(col("hll_u")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sparse mode is exact at these cardinalities: a={1,2,3,4}, b={10,11}
    assert(merged == Map("a" -> 4L, "b" -> 2L))
  }

  test("HLL merge is associative in outcome: one-shot == two-step fold") {
    val b1 = createDf(spark, "k string, u bigint", (1L to 40L).map(i => Seq[Any]("a", i)))
    val b2 = createDf(spark, "k string, u bigint", (20L to 60L).map(i => Seq[Any]("a", i)))
    val oneShot = Incremental.hllState(b1.unionByName(b2), Seq("k"), "u")
      .select(Incremental.hllCount(col("hll_u"))).head().getLong(0)
    val folded = Incremental.hllMergeState(
      Incremental.hllState(b1, Seq("k"), "u"), b2, Seq("k"), "u")
      .select(Incremental.hllCount(col("hll_u"))).head().getLong(0)
    assert(oneShot == 60L && folded == 60L)
  }

}

class OovRateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("oovRate counts tokens outside the top-N vocabulary") {
    val docs = createDf(spark, "id int, text string", Seq(
      Seq[Any](1, "a a a b"),   // a×3, b×1
      Seq[Any](2, "a b zzz")))  // zzz is rare
    // topN=2 vocabulary: a (4), b (2); zzz (1) is OOV
    val got = graft.text.TextStats.oovRate(docs, "id", "text", 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1) == ((4L, 0L, 0.0)))
    assert(got(2) == ((3L, 1L, 1.0 / 3.0)))
  }

  test("vocabulary cutoff ties break to the lexicographically smaller token") {
    val docs = createDf(spark, "id int, text string", Seq(
      Seq[Any](1, "x y"), Seq[Any](2, "x y")))
    // both have count 2; topN=1 must pick 'x'
    val got = graft.text.TextStats.oovRate(docs, "id", "text", 1)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L)) // 'y' is OOV in both docs
  }
}
