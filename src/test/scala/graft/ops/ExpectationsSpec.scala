package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}
import graft.ops.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = createDf(spark, "id int, name string, score double, tag string",
    Seq(
      Seq[Any](1, "alice", 0.5, "a"),
      Seq[Any](2, "bob", 1.5, "b"),
      Seq[Any](2, null, -0.1, "a"), // dup id, null name, below range
      Seq[Any](3, "eve", null, "z"), // null score ok for InRange, bad tag
    ))

  test("all rule kinds count violations in one report") {
    val got = Expectations.check(df, Seq(
      Rule.NotNull("name"),
      Rule.Unique(Seq("id")),
      Rule.InRange("score", 0.0, 1.0),
      Rule.InSet("tag", Seq("a", "b")),
      Rule.Matches("name", "[a-z]+"),
    ))
    val want = createDf(spark, "rule string, violations bigint, passed boolean",
      Seq(
        Seq[Any]("in_range(score,0.0,1.0)", 2L, false),
        Seq[Any]("in_set(tag)", 1L, false),
        Seq[Any]("matches(name)", 0L, true),
        Seq[Any]("not_null(name)", 1L, false),
        Seq[Any]("unique(id)", 1L, false),
      ))
    assertDfEquality(got, want, ignoreRowOrder = false) // check() orders by rule
  }

  test("satisfies: null predicate rows violate (three-valued logic closed)") {
    val got = Expectations.check(df,
      Seq(Rule.Satisfies("score_above_tag_floor", col("score") > -1.0)))
    assert(got.head().getLong(1) == 1L) // the null score row
  }

  test("empty frame passes vacuously") {
    val empty = df.filter(lit(false))
    val got = Expectations.check(empty, Seq(
      Rule.NotNull("name"), Rule.Unique(Seq("id", "tag"))))
    assert(got.collect().forall(_.getBoolean(2)))
  }

  test("unique over multiple columns counts surplus rows, not groups") {
    val d = createDf(spark, "a int, b int",
      Seq(Seq[Any](1, 1), Seq[Any](1, 1), Seq[Any](1, 1), Seq[Any](1, 2)))
    val got = Expectations.check(d, Seq(Rule.Unique(Seq("a", "b"))))
    assert(got.head().getLong(1) == 2L) // 4 rows, 2 distinct tuples
  }

  test("matches is a FULL match: a trailing newline violates (\\z anchor, not $)") {
    val d = createDf(spark, "s string",
      Seq(Seq[Any]("F"), Seq[Any]("F\n"), Seq[Any]("FX")))
    val got = Expectations.check(d, Seq(Rule.Matches("s", "[OF]")))
    assert(got.head().getLong(1) == 2L) // "F\n" and "FX" both violate
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(Rule.NotNull("name"), Rule.NotNull("name")))
    }
  }

  test("one job: the report is a single aggregation, not per-rule scans") {
    val report = Expectations.check(df, Seq(
      Rule.NotNull("name"), Rule.InRange("score", 0, 1), Rule.Unique(Seq("id"))))
    // One Aggregate (plus the Expand multi-distinct introduces) — no join
    // or union of separate scans in the optimized plan.
    val plan = report.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"), plan)
  }
}
