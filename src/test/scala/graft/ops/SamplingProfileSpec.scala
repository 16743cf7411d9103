package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids = spark.range(2000).toDF("id")

  test("deterministicSplit: stable across runs, full coverage, ~weights") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.deterministicSplit(ids, "id", w)
    val s2 = Sampling.deterministicSplit(ids, "id", w)
    assert(s1.collect().map(_.toSeq).toSet == s2.collect().map(_.toSeq).toSet)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1400 && counts("train") < 1800, s"skewed: $counts")
  }

  test("weightedSample: deterministic, exact-k, weight-respecting") {
    import spark.implicits._
    val d = (1L to 500L).map(i => (i, if (i <= 250) 100.0 else 1.0)).toDF("id", "w")
    val s1 = Sampling.weightedSample(d, "id", "w", 50).select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(d, "id", "w", 50).select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 50)
    // 100x-weighted half must dominate the sample (deterministic given md5)
    val heavy = s1.count(_ <= 250L)
    assert(heavy > 40, s"heavy half got only $heavy of 50")
    // a different seed draws a genuinely different sample
    val s3 = Sampling.weightedSample(d, "id", "w", 50, seed = "fold2")
      .select("id").as[Long].collect().toSet
    assert(s3 != s1)
  }

  test("weightedSample: zero/negative/null/NaN weights are never drawn; k caps at eligible rows") {
    val d = createDf(spark, "id bigint, w double", Seq(
      Seq[Any](1L, 5.0), Seq[Any](2L, 0.0), Seq[Any](3L, -1.0),
      Seq[Any](4L, null), Seq[Any](5L, 2.0), Seq[Any](6L, Double.NaN)))
    val got = Sampling.weightedSample(d, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L))
    intercept[IllegalArgumentException](Sampling.weightedSample(d, "id", "w", 0))
  }

  test("splitByGroup: every duplicate cluster lands whole in ONE split (no leakage)") {
    import spark.implicits._
    // clusters: {1,2,3} (chain), {10,11}; singletons 20, 21
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.splitByGroup(docs, "id", pairs,
      Seq("train" -> 0.5, "test" -> 0.5))
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 7)
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1, s"cluster split: $byId")
    assert(Set(byId(10L), byId(11L)).size == 1, s"cluster split: $byId")
    // cluster members get their ROOT's assignment — identical to splitting
    // the representative id alone
    val rootSplit = Sampling.deterministicSplit(Seq(1L).toDF("id"), "id",
      Seq("train" -> 0.5, "test" -> 0.5)).head().getString(1)
    assert(byId(1L) == rootSplit)
    // singletons reproduce the plain per-row split exactly
    val plain = Sampling.deterministicSplit(Seq(20L, 21L).toDF("id"), "id",
      Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(20L) == plain(20L) && byId(21L) == plain(21L))
  }

  test("null keys land deterministically in the last split label") {
    val df = createDf(spark, "id string", Seq(Seq[Any]("a"), Seq[Any](null)))
    val out = Sampling.deterministicSplit(df, "id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(out(None) == "test")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val df = spark.range(1000).toDF("id")
      .withColumn("stratum", when(col("id") % 2 === 0, "even").otherwise("odd"))
    val out = Sampling.stratifiedSample(df, "id", "stratum",
      Map("even" -> 1.0, "odd" -> 0.0))
    assert(out.count() == 500)
    assert(out.filter(col("stratum") === "odd").count() == 0)
    // default drops unmapped strata
    val none = Sampling.stratifiedSample(df, "id", "stratum", Map.empty)
    assert(none.count() == 0)
  }

  test("stratifiedExact: exactly ⌊f·n⌋ per stratum, layout-independent, monotone in f") {
    val df = spark.range(1003).toDF("id")
      .withColumn("stratum", when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c"))
    // strata sizes: a=335, b=334, c=334 → quotas at 0.25: 83, 83, 83
    val out = Sampling.stratifiedExact(df, Seq("stratum"), "id", 0.25)
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 83L, "b" -> 83L, "c" -> 83L))
    // identical row SET across partition layouts (not just identical counts)
    val again = Sampling.stratifiedExact(df.repartition(13), Seq("stratum"), "id", 0.25)
    assert(out.collect().map(_.getLong(0)).toSet ==
      again.collect().map(_.getLong(0)).toSet)
    // nested samples: a smaller fraction selects a subset of a larger one
    val smaller = Sampling.stratifiedExact(df, Seq("stratum"), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(out.collect().map(_.getLong(0)).toSet))
    // f = 0 and f = 1 are exact boundaries
    assert(Sampling.stratifiedExact(df, Seq("stratum"), "id", 0.0).count() == 0)
    assert(Sampling.stratifiedExact(df, Seq("stratum"), "id", 1.0).count() == 1003)
  }

  test("resampleToMixture hits target proportions; binding source keeps all") {
    val df = spark.range(3000).toDF("id")
      .withColumn("src",
        when(col("id") < 2000, "big").when(col("id") < 2800, "mid").otherwise("small"))
    // small supplies 200 rows; target 0.2 → binding: T = 200/0.2 = 1000
    val out = Sampling.resampleToMixture(df, "src", "id",
      Map("big" -> 0.5, "mid" -> 0.3, "small" -> 0.2))
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("small") == 200, "binding source must keep everything")
    // ~500 big, ~300 mid (hash-bucket resolution + distribution noise)
    assert(counts("big") > 400 && counts("big") < 600, s"got $counts")
    assert(counts("mid") > 230 && counts("mid") < 370, s"got $counts")
    // deterministic: identical row set across runs
    val again = Sampling.resampleToMixture(df, "src", "id",
      Map("big" -> 0.5, "mid" -> 0.3, "small" -> 0.2))
    assert(out.collect().map(_.getLong(0)).toSet == again.collect().map(_.getLong(0)).toSet)
    // unmapped sources are dropped
    val dropped = Sampling.resampleToMixture(df, "src", "id", Map("big" -> 1.0))
    assert(dropped.filter(col("src") =!= "big").count() == 0)
  }

  test("apportion: quotas sum to budget exactly, each within 1 of its share") {
    val w = createDf(spark, "src string, n bigint", Seq(
      Seq[Any]("a", 10L), Seq[Any]("b", 20L), Seq[Any]("c", 30L),
      Seq[Any]("d", 7L), Seq[Any]("e", 33L)))
    for (budget <- Seq(0L, 1L, 37L, 100L, 997L)) {
      val q = Sampling.apportion(w, "src", "n", budget)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(q.values.sum == budget, s"budget $budget")
      val tot = 100.0
      q.foreach { case (k, quota) =>
        val share = budget * Map("a" -> 10, "b" -> 20, "c" -> 30, "d" -> 7, "e" -> 33)(k) / tot
        assert(quota >= math.floor(share).toLong && quota <= math.ceil(share).toLong + 0,
          s"budget $budget src $k quota $quota share $share")
      }
    }
  }

  test("apportion leftovers go to the largest remainders, ties to the smaller key") {
    // equal weights, budget not divisible: 3 groups, budget 4 → remainders
    // all equal → extra goes to the lexicographically first
    val w = createDf(spark, "src string, n bigint", Seq(
      Seq[Any]("x", 5L), Seq[Any]("y", 5L), Seq[Any]("z", 5L)))
    val q = Sampling.apportion(w, "src", "n", 4L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
  }

  test("apportion with budget exceeding total weight still sums exactly") {
    val w = createDf(spark, "src string, n bigint", Seq(
      Seq[Any]("a", 2L), Seq[Any]("b", 3L)))
    val q = Sampling.apportion(w, "src", "n", 50L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q.values.sum == 50L && q("a") == 20L && q("b") == 30L)
  }

  test("takeApportioned keeps exactly quota rows per group, deterministically") {
    val d = createDf(spark, "src string, id bigint",
      (1L to 30L).map(i => Seq[Any](if (i <= 18) "a" else "b", i)))
    val counts = d.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val quotas = Sampling.apportion(counts, "src", "n", 10L)
    val taken = Sampling.takeApportioned(d, Seq("src"), "id",
      quotas.select(col("src"), col("quota")))
    val byGroup = taken.groupBy(col("src")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val qm = quotas.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byGroup == qm && qm.values.sum == 10L)
    // 18/30 and 12/30 of 10 → 6 each exact for a; b = 4
    assert(qm == Map("a" -> 6L, "b" -> 4L))
    val again = taken.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == Sampling.takeApportioned(d, Seq("src"), "id",
      quotas.select(col("src"), col("quota")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("deterministicSample keeps a stable subset of ~fraction size") {
    val a = Sampling.deterministicSample(ids, "id", 0.25)
    val b = Sampling.deterministicSample(ids, "id", 0.25)
    assert(a.collect().map(_.getLong(0)).toSet == b.collect().map(_.getLong(0)).toSet)
    val n = a.count()
    assert(n > 350 && n < 650, s"expected ~500, got $n")
    // smaller fraction is a subset of larger (nested by bucket threshold)
    val small = Sampling.deterministicSample(ids, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a.collect().map(_.getLong(0)).toSet))
  }
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("run composes named stages lazily; materializeEach reports rows") {
    val df = spark.range(100).toDF("id")
    val stages: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "filter_even" -> (d => d.filter(col("id") % 2 === 0)),
      "double_it" -> (d => d.withColumn("twice", col("id") * 2)))
    val (out, reports) = Pipeline.run(df, stages)
    assert(reports.map(_.name) == Seq("filter_even", "double_it"))
    assert(reports.forall(_.rows.isEmpty))
    assert(out.count() == 50)
    val (_, mat) = Pipeline.run(df, stages, materializeEach = true)
    assert(mat.map(_.rows) == Seq(Some(50L), Some(50L)))
  }
}

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("profile survives awkward column names and empty input") {
    val df = createDf(spark, Seq("weird-name"), Seq(Seq[Any]("x")))
    val p = Profile.profile(df, Seq("weird-name")).head()
    assert(p.getString(0) == "weird-name" && p.getLong(1) == 1L)
    val empty = Profile.profile(
      df.filter(org.apache.spark.sql.functions.lit(false)), Seq("weird-name")).head()
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L)
  }

  test("quantiles: sketch percentiles per column") {
    val df = spark.range(1, 101).toDF("v").withColumn("w", col("v") * 2)
    val q = Profile.quantiles(df, Seq("v", "w"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(math.abs(q("v").head - 50L) <= 2)
    assert(math.abs(q("w").head - 100L) <= 4)
  }

  test("profile: distinct counts stay exact for array columns (non-injective cast)") {
    // Array("a, b") and Array("a", "b") stringify identically — the
    // complex-type fallback must still count them as 2 distinct values.
    val df = createDf(spark, "tags array<string>", Seq(
      Seq[Any](Seq("a, b")), Seq[Any](Seq("a", "b")), Seq[Any](Seq("a", "b"))))
    val p = Profile.profile(df, Seq("tags")).head()
    assert(p.getLong(3) == 2L, s"expected 2 distinct arrays, got ${p.getLong(3)}")
  }

  test("profile: one row per column with nulls/distinct/min/max") {
    val df = createDf(spark, "a int, b string", Seq(
      Seq[Any](1, "x"), Seq[Any](2, null), Seq[Any](2, "y")))
    val p = Profile.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("a") == ((3L, 0L, 2L, "1", "2")))
    assert(p("b") == ((3L, 1L, 2L, "x", "y")))
  }
}
