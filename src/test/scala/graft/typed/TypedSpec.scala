package graft.typed

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.assertDfEquality

class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("case-class read validates the schema and round-trips values") {
    val ds = Typed.orders(spark, dir)
    val first = ds.orderBy(col("o_orderkey")).head()
    assert(first.o_orderkey == 0L && first.o_totalprice > 0.0)
  }

  test(".as[T] fails fast on schema drift instead of producing bad rows") {
    import spark.implicits._
    val wrong = graft.sources.Sources.readTable(spark, dir, "orders")
      .select("o_orderkey") // missing fields
    intercept[org.apache.spark.sql.AnalysisException] { wrong.as[Typed.Order] }
  }

  test("typed prioritySummary equals the untyped column pipeline") {
    val typed = Typed.prioritySummary(Typed.orders(spark, dir), 150000.0)
    val untyped = graft.sources.Sources.readTable(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_total"))
    assertDfEquality(typed, untyped, ignoreRowOrder = true)
  }

  test("typed aggregation keeps Catalyst partial/final HashAggregate (no mapGroups)") {
    val p = Typed.prioritySummary(Typed.orders(spark, dir), 150000.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("MapGroups"),
      s"typed agg must not fall back to mapGroups:\n${p.take(1500)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final HashAggregate:\n${p.take(1500)}")
  }
}

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.testing.DfAssert.createDf

  private def norm(s: String): String =
    createDf(spark, "t string", Seq(Seq[Any](s)))
      .select(graft.text.TextStats.normalizeText(col("t")))
      .head().getString(0)

  test("lowercases, collapses whitespace runs, trims") {
    assert(norm("  Hello   WORLD \t from\n\nSpark  ") == "hello world from spark")
  }

  test("tabs and newlines separate words; other control bytes vanish") {
    assert(norm("a\tb\nc") == "a b c")
    assert(norm("a\u0001b\u007Fc") == "abc")
  }

  test("already-clean text is unchanged") {
    assert(norm("plain lowercase text") == "plain lowercase text")
  }

  test("whitespace-only input normalizes to the empty string") {
    assert(norm(" \t\n ") == "")
  }
}
