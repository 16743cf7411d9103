package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.testing.{DfAssert, TestSpark}
import graft.testing.DfAssert.{assertDfEquality, createDf}

/** Mirrors the reference concat test matrix
  * (reference tests/pyspark/test_concat.py): coercion table, string sink,
  * missing-column null-fill, key injection, error taxonomy.
  */
class ConcatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("equal schemas: plain union, row counts add") {
    val a = createDf(spark, Seq("id", "v"), Seq(Seq(1, "x"), Seq(2, "y")))
    val b = createDf(spark, Seq("id", "v"), Seq(Seq(3, "z")))
    val out = Concat.concat(Seq(a, b))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("id", "v"))
  }

  test("missing column null-filled with the widened dtype") {
    val a = createDf(spark, "id int, v double", Seq(Seq[Any](1, 1.5)))
    val b = createDf(spark, "id int", Seq(Seq(2)))
    val out = Concat.concat(Seq(a, b))
    assert(out.schema("v").dataType.simpleString == "double")
    val expected = createDf(spark, "id int, v double", Seq(Seq[Any](1, 1.5), Seq[Any](2, null)))
    assertDfEquality(out, expected)
  }

  test("numeric widening: int + bigint -> bigint; int + double -> double") {
    val a = createDf(spark, "x int", Seq(Seq(1)))
    val b = createDf(spark, "x bigint", Seq(Seq(2L)))
    assert(Concat.concat(Seq(a, b)).schema("x").dataType.simpleString == "bigint")
    val c = createDf(spark, "x double", Seq(Seq(2.5)))
    assert(Concat.concat(Seq(a, c)).schema("x").dataType.simpleString == "double")
  }

  test("reference quirk preserved: decimal(10,0) outranks double") {
    val a = createDf(spark, "x decimal(10,0)", Seq(Seq(new java.math.BigDecimal(3))))
    val b = createDf(spark, "x double", Seq(Seq(2.0)))
    val out = Concat.concat(Seq(a, b))
    assert(out.schema("x").dataType.simpleString == "decimal(10,0)")
  }

  test("string is a universal sink") {
    val a = createDf(spark, "x int", Seq(Seq(1)))
    val b = createDf(spark, "x string", Seq(Seq("two")))
    val out = Concat.concat(Seq(a, b))
    assert(out.schema("x").dataType.simpleString == "string")
    assert(out.collect().map(_.getString(0)).toSet == Set("1", "two"))
  }

  test("non-coercible dtypes raise (timestamp vs boolean)") {
    val a = createDf(spark, "x timestamp", Seq(Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    val b = createDf(spark, "x boolean", Seq(Seq(true)))
    intercept[IllegalArgumentException] { Concat.concat(Seq(a, b)) }
  }

  test("missing non-numeric non-string column raises (reference semantics)") {
    val a = createDf(spark, "id int, ts timestamp",
      Seq(Seq(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    val b = createDf(spark, "id int", Seq(Seq(2)))
    intercept[IllegalArgumentException] { Concat.concat(Seq(a, b)) }
  }

  test("key columns prepended in name order; multi-part keys") {
    val a = createDf(spark, Seq("v"), Seq(Seq(1)))
    val b = createDf(spark, Seq("v"), Seq(Seq(2)))
    val out = Concat.concat(Seq(a, b),
      Seq(Seq("uk", "2024"), Seq("fr", "2025")), Seq("country", "year"))
    assert(out.columns.toSeq == Seq("country", "year", "v"))
    assert(out.filter(out("country") === "fr").select("year").head().getString(0) == "2025")
  }

  test("mapping variant: selection subsets and orders frames") {
    val a = createDf(spark, Seq("v"), Seq(Seq(1)))
    val b = createDf(spark, Seq("v"), Seq(Seq(2)))
    val c = createDf(spark, Seq("v"), Seq(Seq(3)))
    val out = Concat.concat(Seq("a" -> a, "b" -> b, "c" -> c), Seq("src"), Some(Seq("c", "a")))
    assert(DfAssert.createDf(spark, Seq("x"), Seq(Seq(1))).sparkSession != null)
    assert(out.select("src").collect().map(_.getString(0)).toSeq.sorted == Seq("a", "c"))
    assert(out.count() == 2)
  }

  test("mapping variant: duplicate keys keep all frames; missing selection key raises") {
    val a = createDf(spark, Seq("v"), Seq(Seq(1)))
    val b = createDf(spark, Seq("v"), Seq(Seq(2)))
    val dup = Concat.concat(Seq("jan" -> a, "jan" -> b), Seq("src"), None)
    assert(dup.count() == 2)
    assert(dup.select("src").distinct().head().getString(0) == "jan")
    intercept[IllegalArgumentException] {
      Concat.concat(Seq("jan" -> a), Seq("src"), Some(Seq("march")))
    }
  }

  test("concat is associative over schema-compatible frames (SURVEY §5.3)") {
    val a = createDf(spark, "x int, v double", Seq(Seq[Any](1, 1.5)))
    val b = createDf(spark, "x bigint, v double", Seq(Seq[Any](2L, 2.5)))
    val c = createDf(spark, "x int", Seq(Seq(3)))
    val nested = Concat.concat(Seq(Concat.concat(Seq(a, b)), c))
    val flat = Concat.concat(Seq(a, b, c))
    assertDfEquality(nested, flat)
  }

  test("empty frames list raises") {
    intercept[IllegalArgumentException] { Concat.concat(Seq.empty[org.apache.spark.sql.DataFrame]) }
  }

  test("keys/names arity mismatches raise") {
    val a = createDf(spark, Seq("v"), Seq(Seq(1)))
    val b = createDf(spark, Seq("v"), Seq(Seq(2)))
    intercept[IllegalArgumentException] {
      Concat.concat(Seq(a, b), Seq(Seq("k1")), Seq("name"))
    }
    intercept[IllegalArgumentException] {
      Concat.concat(Seq(a, b), Seq(Seq("k1", "extra"), Seq("k2")), Seq("name"))
    }
  }
}
