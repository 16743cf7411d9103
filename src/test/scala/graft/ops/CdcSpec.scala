package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------------------ scd2

  private def changes = createDf(spark, "k int, ts bigint, v string",
    Seq(
      Seq[Any](1, 10L, "a"),
      Seq[Any](1, 20L, "a"), // re-assertion: must NOT split history
      Seq[Any](1, 30L, "b"),
      Seq[Any](1, 40L, "a"), // back to a: new interval, not merged with the first
      Seq[Any](2, 15L, "x"),
    ))

  test("scd2 compresses unchanged runs and chains validity intervals") {
    val got = Cdc.scd2(changes, Seq("k"), "ts", Seq("v"))
      .select("k", "v", "effective_from", "effective_to", "is_current")
    val want = createDf(spark,
      "k int, v string, effective_from bigint, effective_to bigint, is_current boolean",
      Seq(
        Seq[Any](1, "a", 10L, 30L, false),
        Seq[Any](1, "b", 30L, 40L, false),
        Seq[Any](1, "a", 40L, null, true),
        Seq[Any](2, "x", 15L, null, true),
      ))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("scd2 null-safe change detection: null->value and value->null both open intervals") {
    val df = createDf(spark, "k int, ts bigint, v string",
      Seq(Seq[Any](1, 1L, null), Seq[Any](1, 2L, null), Seq[Any](1, 3L, "z"),
        Seq[Any](1, 4L, null)))
    val got = Cdc.scd2(df, Seq("k"), "ts", Seq("v"))
    assert(got.count() == 3) // null-run compressed, then z, then null again
    assert(got.filter(col("is_current")).select("effective_from").head().getLong(0) == 4L)
  }

  test("scd2 tracks multiple value columns: change in ANY column opens an interval") {
    val df = createDf(spark, "k int, ts bigint, a string, b int",
      Seq(Seq[Any](1, 1L, "x", 1), Seq[Any](1, 2L, "x", 2), Seq[Any](1, 3L, "x", 2)))
    assert(Cdc.scd2(df, Seq("k"), "ts", Seq("a", "b")).count() == 2)
  }

  test("scd2 exactly one current row per key") {
    val got = Cdc.scd2(changes, Seq("k"), "ts", Seq("v"))
    val perKey = got.filter(col("is_current")).groupBy("k").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
  }

  test("scd2: a null timestamp never splits an unchanged run") {
    val df = createDf(spark, "k int, ts bigint, v string",
      Seq(Seq[Any](1, null, "a"), Seq[Any](1, 10L, "a"), Seq[Any](1, 20L, "a")))
    // all three observations carry the same value: one interval
    assert(Cdc.scd2(df, Seq("k"), "ts", Seq("v")).count() == 1)
  }

  test("scd2 rejects reserved output names on the input") {
    val bad = changes.withColumn("effective_from", lit(0L))
    intercept[IllegalArgumentException] {
      Cdc.scd2(bad, Seq("k"), "ts", Seq("v"))
    }
  }

  // --------------------------------------------------------- diffSnapshots

  private def oldSnap = createDf(spark, "k int, v string, n int",
    Seq(Seq[Any](1, "a", 1), Seq[Any](2, "b", 2), Seq[Any](3, "c", 3)))
  private def newSnap = createDf(spark, "k int, v string, n int",
    Seq(Seq[Any](1, "a", 1), Seq[Any](2, "B", 2), Seq[Any](4, "d", 4)))

  test("diffSnapshots classifies insert/update/delete and drops unchanged by default") {
    val got = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v", "n"))
    val want = createDf(spark, "k int, v string, n int, change_type string",
      Seq(
        Seq[Any](2, "B", 2, "update"),
        Seq[Any](3, "c", 3, "delete"), // old-side values survive on delete
        Seq[Any](4, "d", 4, "insert"),
      ))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("diffSnapshots keepUnchanged=true emits the full classification") {
    val got = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v", "n"),
      keepUnchanged = true)
    assert(got.count() == 4)
    assert(got.filter(col("change_type") === "unchanged").select("k").head().getInt(0) == 1)
  }

  test("diffSnapshots null-safe value compare: null==null is unchanged") {
    val o = createDf(spark, "k int, v string", Seq(Seq[Any](1, null)))
    val n = createDf(spark, "k int, v string", Seq(Seq[Any](1, null)))
    assert(Cdc.diffSnapshots(o, n, Seq("k"), Seq("v")).count() == 0)
  }

  test("law: upsert(old, inserts+updates) minus deletes reproduces new") {
    val diff = Cdc.diffSnapshots(oldSnap, newSnap, Seq("k"), Seq("v", "n"))
    val ups = diff.filter(col("change_type").isin("insert", "update"))
      .drop("change_type").withColumn("version", lit(1L))
    val dels = diff.filter(col("change_type") === "delete").select("k")
    val replayed = Merge.upsert(oldSnap.withColumn("version", lit(0L)), ups,
        Seq("k"), "version")
      .join(dels, Seq("k"), "left_anti")
      .drop("version")
    assertDfEquality(replayed, newSnap, ignoreRowOrder = true)
  }
}
