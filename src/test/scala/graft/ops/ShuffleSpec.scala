package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(n: Int) =
    createDf(spark, "id int", (0 until n).map(i => Seq[Any](i)))

  test("every row gets one shard in range and dense 0-based positions per shard") {
    val out = Sampling.deterministicShuffle(ids(200), "id", nShards = 8, seed = "s")
    assert(out.count() == 200)
    assert(out.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    // per shard: positions are exactly 0..count-1
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1 || col("d") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("the permutation is rerun- and partitioning-stable") {
    val df = ids(300)
    val a = Sampling.deterministicShuffle(df.coalesce(1), "id", 4, "epoch1")
      .orderBy("id").collect().toSeq
    val b = Sampling.deterministicShuffle(df.repartition(13), "id", 4, "epoch1")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("a different seed is a different permutation") {
    val df = ids(100)
    val a = Sampling.deterministicShuffle(df, "id", 4, "epoch1")
      .select("id", "shard", "pos").orderBy("id").collect().toSeq
    val b = Sampling.deterministicShuffle(df, "id", 4, "epoch2")
      .select("id", "shard", "pos").orderBy("id").collect().toSeq
    assert(a != b)
  }

  test("nShards = 1 degenerates to one global deterministic order") {
    val out = Sampling.deterministicShuffle(ids(50), "id", 1, "s")
    assert(out.select(countDistinct("pos")).head().getLong(0) == 50L)
    assert(out.agg(max("pos")).head().getLong(0) == 49L)
  }

  test("temporalSplit: purge band excluded from both sides, boundaries half-open") {
    val rows = Seq(
      (1L, 100L), // train (< cutoff - embargo = 150)
      (2L, 149L), // train
      (3L, 150L), // embargo (>= 150, < 200)
      (4L, 199L), // embargo
      (5L, 200L), // test (>= cutoff)
      (6L, 500L)) // test
    val df = createDf(spark, "id bigint, us bigint",
        rows.map { case (i, u) => Seq[Any](i, u) })
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Sampling.temporalSplit(df, col("ts"), cutoffUs = 200L, embargoUs = 50L)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test", 6L -> "test"))
  }

  test("temporalSplit: zero embargo degenerates to a plain cutoff split") {
    val df = createDf(spark, "us bigint", Seq(Seq[Any](10L), Seq[Any](20L)))
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Sampling.temporalSplit(df, col("ts"), cutoffUs = 20L, embargoUs = 0L)
      .select("split").collect().map(_.getString(0)).toSeq.sorted
    assert(got == Seq("test", "train"))
  }
}
