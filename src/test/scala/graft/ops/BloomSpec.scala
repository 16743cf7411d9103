package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def big = (0L until 2000L).map(i => (i, i % 100)).toDF("id", "key")
  private def small = Seq(3L, 17L, 42L, 99L).toDF("key")

  test("bloomSemiJoin equals the plain semi join exactly") {
    val got = Bloom.bloomSemiJoin(big, small, "key", "key", expectedItems = 16L)
      .select("id").as[Long].collect().sorted.toSeq
    val want = big.join(small.withColumnRenamed("key", "k2"),
        col("key") === col("k2"), "left_semi")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("pruneByBloom has no false negatives: every true key survives") {
    val bloom = Bloom.buildBloom(small, col("key"), expectedItems = 16L)
    val kept = Bloom.pruneByBloom(big, col("key"), bloom)
      .select("key").distinct().as[Long].collect().toSet
    assert(Set(3L, 17L, 42L, 99L).subsetOf(kept))
  }

  test("pruning actually prunes: fpp stays near the configured rate") {
    // 100 distinct keys, 4 true -> with fpp=0.01 the expected survivor
    // count is ~4 + 96*0.01; allow a wide margin but far below "no prune"
    val bloom = Bloom.buildBloom(small, col("key"), expectedItems = 16L, fpp = 0.01)
    val survivors = Bloom.pruneByBloom(big.select("key").distinct(), col("key"), bloom).count()
    assert(survivors >= 4 && survivors <= 20, s"survivors=$survivors")
  }

  test("null keys are dropped by the prune (semantics-neutral for equi-joins)") {
    val withNull = big.unionByName(Seq((9999L, Option.empty[Long])).toDF("id", "key"))
    val bloom = Bloom.buildBloom(small, col("key"), expectedItems = 16L)
    assert(Bloom.pruneByBloom(withNull, col("key"), bloom)
      .filter(col("id") === 9999L).count() == 0)
  }

  test("optimalNumBits grows with items and shrinks with looser fpp") {
    assert(Bloom.optimalNumBits(1000, 0.01) > Bloom.optimalNumBits(100, 0.01))
    assert(Bloom.optimalNumBits(1000, 0.1) < Bloom.optimalNumBits(1000, 0.01))
    assert(Bloom.optimalNumBits(1, 0.5) >= 64L)
    intercept[IllegalArgumentException](Bloom.optimalNumBits(10, 0.0))
  }

  test("requests beyond Spark's silent bloom clamps fail loudly with the conf name") {
    val e = intercept[IllegalArgumentException](
      Bloom.buildBloom(small, col("key"), expectedItems = 50000000L))
    assert(e.getMessage.contains("bloomFilter.maxNum"))
    intercept[IllegalArgumentException](
      Bloom.bloomSemiJoin(big.withColumn("__bloom_key", lit(1)), small,
        "key", "key", expectedItems = 16L))
  }

  test("string keys work (hashing is xxhash64 on both build and probe)") {
    val corpus = Seq("alpha", "beta", "gamma", "delta").toDF("s")
    val wanted = Seq("beta", "delta").toDF("s")
    val got = Bloom.bloomSemiJoin(corpus, wanted, "s", "s", expectedItems = 8L)
      .as[String].collect().toSet
    assert(got == Set("beta", "delta"))
  }
}
