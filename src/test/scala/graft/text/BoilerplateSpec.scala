package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    createDf(spark, "doc_id bigint, text string",
      rows.map { case (i, t) => Seq[Any](i, t) })

  test("lines repeated across >= minDocs docs are stripped; order preserved") {
    val d = docs(
      1L -> "COOKIE BANNER\nreal content one\nFOOTER",
      2L -> "COOKIE BANNER\nreal content two\nFOOTER",
      3L -> "COOKIE BANNER\nunique thought\nFOOTER",
      4L -> "standalone document")
    val out = Boilerplate.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("real content one", 1L, 2L)))
    assert(out(3L) == (("unique thought", 1L, 2L)))
    assert(out(4L) == (("standalone document", 1L, 0L)))
  }

  test("within-doc repetition does not count toward the document frequency") {
    // "chorus" repeats 3× inside doc 1 but only 2 DOCS contain it
    val d = docs(
      1L -> "chorus\nchorus\nchorus\nverse",
      2L -> "chorus\nbridge",
      3L -> "solo")
    val out = Boilerplate.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "chorus\nchorus\nchorus\nverse", s"2 docs < minDocs=3: $out")
  }

  test("an all-boilerplate document survives with empty text, not a lost row") {
    val d = docs(1L -> "AD", 2L -> "AD", 3L -> "AD\ncontent")
    val out = Boilerplate.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("", 0L)))
    assert(out(3L) == (("content", 1L)))
  }

  test("separator is literal, not a regex (a '.' separator must not split everywhere)") {
    val d = docs(1L -> "a.b", 2L -> "a.c", 3L -> "a.d")
    val out = Boilerplate.stripBoilerplateLines(d, "doc_id", "text", sep = ".", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b") // "a" is boilerplate; with regex-split everything would vanish
  }

  test("null text reads as empty text — one row out per row in, never a lost doc") {
    val d = createDf(spark, "doc_id bigint, text string",
      Seq(Seq[Any](1L, null), Seq[Any](2L, "real line")))
    val out = Boilerplate.stripBoilerplateLines(d, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == (("", 1L))) // one empty line, kept (df=1 < minDocs)
  }

  test("reserved output/internal names on the input fail fast") {
    val d = createDf(spark, "doc_id bigint, text string, n_kept int",
      Seq(Seq[Any](1L, "x", 0)))
    intercept[IllegalArgumentException] {
      Boilerplate.stripBoilerplateLines(d, "doc_id", "text")
    }
  }

  test("minDocs below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Boilerplate.stripBoilerplateLines(docs(1L -> "x"), "doc_id", "text", minDocs = 1)
    }
  }
}
