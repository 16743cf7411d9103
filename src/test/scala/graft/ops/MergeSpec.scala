package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def base = createDf(spark, "k int, v string, version bigint",
    Seq(Seq[Any](1, "a", 1L), Seq[Any](2, "b", 1L), Seq[Any](3, "c", 1L)))

  test("higher-version update replaces the base row; others pass through") {
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](2, "B2", 2L)))
    val got = Merge.upsert(base, upd, Seq("k"), "version")
    val want = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](1, "a", 1L), Seq[Any](2, "B2", 2L), Seq[Any](3, "c", 1L)))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("version tie: the update side wins (delta replay is idempotent)") {
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](1, "A-replayed", 1L)))
    val got = Merge.upsert(base, upd, Seq("k"), "version")
    assert(got.filter(col("k") === 1).select("v").head().getString(0) == "A-replayed")
    assert(got.count() == 3)
  }

  test("stale update (lower version) loses to the base row") {
    val newerBase = base.withColumn("version", lit(5L))
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](2, "old", 2L)))
    val got = Merge.upsert(newerBase, upd, Seq("k"), "version")
    assert(got.filter(col("k") === 2).select("v").head().getString(0) == "b")
  }

  test("new keys insert; composite keys merge independently") {
    val b = createDf(spark, "k1 int, k2 string, v string, version bigint",
      Seq(Seq[Any](1, "x", "a", 1L), Seq[Any](1, "y", "b", 1L)))
    val upd = createDf(spark, "k1 int, k2 string, v string, version bigint",
      Seq(Seq[Any](1, "y", "B", 2L), Seq[Any](2, "z", "new", 1L)))
    val got = Merge.upsert(b, upd, Seq("k1", "k2"), "version")
    val want = createDf(spark, "k1 int, k2 string, v string, version bigint",
      Seq(Seq[Any](1, "x", "a", 1L), Seq[Any](1, "y", "B", 2L), Seq[Any](2, "z", "new", 1L)))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("duplicate keys within one side collapse to a single survivor") {
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](9, "first", 3L), Seq[Any](9, "later", 7L)))
    val got = Merge.upsert(base, upd, Seq("k"), "version")
    assert(got.filter(col("k") === 9).count() == 1)
    assert(got.filter(col("k") === 9).select("v").head().getString(0) == "later")
  }

  test("law: replaying the same delta is a no-op (upsert idempotence)") {
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](2, "B2", 2L), Seq[Any](7, "new", 2L)))
    val once = Merge.upsert(base, upd, Seq("k"), "version")
    val twice = Merge.upsert(once, upd, Seq("k"), "version")
    assertDfEquality(twice, once, ignoreRowOrder = true)
  }

  test("tieBreak pins the survivor among same-(key, version) duplicates in one side") {
    val upd = createDf(spark, "k int, v string, version bigint, seq int",
      Seq(Seq[Any](9, "low", 3L, 1), Seq[Any](9, "high", 3L, 2)))
    val b = base.withColumn("seq", lit(0))
    val got = Merge.upsert(b, upd, Seq("k"), "version", tieBreak = Seq("seq"))
    assert(got.filter(col("k") === 9).select("v").head().getString(0) == "high")
    // and stays stable under a different input layout
    val got2 = Merge.upsert(b, upd.repartition(5), Seq("k"), "version", tieBreak = Seq("seq"))
    assert(got2.filter(col("k") === 9).select("v").head().getString(0) == "high")
  }

  test("consolidate: each column independently takes its latest non-null value") {
    val hist = createDf(spark, "k int, name string, email string, version bigint", Seq(
      Seq[Any](1, "ann", null, 1L),
      Seq[Any](1, null, "ann@x", 2L),
      Seq[Any](1, "anne", null, 3L),
      Seq[Any](2, "bob", "bob@x", 1L)))
    val got = Merge.consolidate(hist, Seq("k"), "version", Seq("name", "email"))
    val want = createDf(spark, "k int, name string, email string, version bigint", Seq(
      // name from v3, email from v2 — no single input row holds both
      Seq[Any](1, "anne", "ann@x", 3L),
      Seq[Any](2, "bob", "bob@x", 1L)))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("consolidate beats row-level upsert when the freshest row has holes") {
    val hist = createDf(spark, "k int, v string, version bigint", Seq(
      Seq[Any](1, "known", 1L), Seq[Any](1, null, 2L)))
    // row-level last-wins keeps the null; column-level keeps "known"
    assert(Merge.consolidate(hist, Seq("k"), "version", Seq("v"))
      .head().getString(1) == "known")
    assert(Merge.consolidate(hist, Seq("k"), "version", Seq("v"))
      .head().getLong(2) == 2L) // but the survivor row IS the freshest
  }

  test("consolidate: same-version ties are deterministic with a tieBreak") {
    val hist = createDf(spark, "k int, v string, version bigint, seq int", Seq(
      Seq[Any](1, "lo", 5L, 1), Seq[Any](1, "hi", 5L, 2)))
    val got = Merge.consolidate(hist, Seq("k"), "version", Seq("v"), tieBreak = Seq("seq"))
    assert(got.head().getString(1) == "hi")
  }

  test("consolidate rejects reserved-name collisions and empty specs") {
    val bad = base.withColumn("__gold_rn", lit(1))
    intercept[IllegalArgumentException](
      Merge.consolidate(bad, Seq("k"), "version", Seq("v")))
    intercept[IllegalArgumentException](
      Merge.consolidate(base, Nil, "version", Seq("v")))
    intercept[IllegalArgumentException](
      Merge.consolidate(base, Seq("k"), "version", Nil))
  }

  test("inputs carrying upsert-internal column names are rejected, not corrupted") {
    val poisoned = base.withColumn("__upsert_src", lit(99))
    val upd = createDf(spark, "k int, v string, version bigint",
      Seq(Seq[Any](1, "x", 2L)))
    val e1 = intercept[IllegalArgumentException](
      Merge.upsert(poisoned, upd.withColumn("__upsert_src", lit(1)), Seq("k"), "version"))
    assert(e1.getMessage.contains("__upsert_src"))
    val e2 = intercept[IllegalArgumentException](
      Merge.upsert(base.withColumn("__upsert_rn", lit(0)),
        upd.withColumn("__upsert_rn", lit(0)), Seq("k"), "version"))
    assert(e2.getMessage.contains("__upsert_rn"))
  }
}
