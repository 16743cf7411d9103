package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Pins the [[Caches]] registry wiring (Bench's cache-honesty contract
  * depends on it: cleared before each timed run, a non-zero count after a
  * run names the query that populated a memo) and the [[Jsons]] escaping
  * shared by Bench and Verify.
  */
class CachesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // val, not def: the memo hits on plan equality (`sameResult`), and a
  // parallelize-built frame gets a fresh RDD identity per build — file
  // relations (the production shape) canonicalize equal across reads,
  // in-memory frames only when the same frame object is reused
  private lazy val panel = createDf(spark,
    "item int, pd string, exp double, qty double", Seq(
      Seq[Any](1, "p0", 10.0, 2.0), Seq[Any](2, "p0", 30.0, 3.0),
      Seq[Any](1, "p1", 12.0, 2.0), Seq[Any](2, "p1", 27.0, 3.0)))

  test("clearAll empties every registered memo cache; population is observable") {
    Caches.clearAll()
    assert(Caches.totalEntries == 0)
    graft.ops.PriceIndex.geksIndex(panel, "item", col("pd"), "exp", "qty", window = 2).count()
    assert(graft.ops.PriceIndex.geksCacheSize == 1)
    assert(Caches.totalEntries >= 1)
    // a second identical call is a cache HIT, not a second entry
    graft.ops.PriceIndex.geksIndex(panel, "item", col("pd"), "exp", "qty", window = 2).count()
    assert(graft.ops.PriceIndex.geksCacheSize == 1)
    Caches.clearAll()
    assert(Caches.totalEntries == 0)
    assert(graft.ops.PriceIndex.geksCacheSize == 0)
  }

  test("geks memo key distinguishes same-schema inputs with different data (no silent collision)") {
    Caches.clearAll()
    val doubled = createDf(spark,
      "item int, pd string, exp double, qty double", Seq(
        Seq[Any](1, "p0", 10.0, 2.0), Seq[Any](2, "p0", 30.0, 3.0),
        Seq[Any](1, "p1", 20.0, 2.0), Seq[Any](2, "p1", 60.0, 3.0)))
    val flat = graft.ops.PriceIndex
      .geksIndex(panel, "item", col("pd"), "exp", "qty", window = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dbl = graft.ops.PriceIndex
      .geksIndex(doubled, "item", col("pd"), "exp", "qty", window = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(graft.ops.PriceIndex.geksCacheSize == 2) // two entries, not one hit
    assert(dbl("p1") == 2.0, dbl.toString) // every price doubles -> index 2.0
    assert(flat("p1") != dbl("p1"))
    Caches.clearAll()
  }

  test("Jsons.jstr escapes quotes, backslashes and ALL control chars") {
    assert(Jsons.jstr("a\nb\t\"c\"\\") == "\"a\\nb\\t\\\"c\\\"\\\\\"")
    assert(Jsons.jstr("x" + 1.toChar + "y\r") == "\"x\\u0001y\\r\"")
    assert(Jsons.jstr("plain") == "\"plain\"")
  }

  test("Jsons.truncAtCodePoint never splits a surrogate pair") {
    val s = "ab" + new String(Character.toChars(0x1F600)) // pair at idx 2-3
    assert(Jsons.truncAtCodePoint(s, 3) == "ab") // cut would split -> backs off
    assert(Jsons.truncAtCodePoint(s, 4) == s)
    assert(Jsons.truncAtCodePoint("abc", 2) == "ab")
    assert(Jsons.truncAtCodePoint("abc", 5) == "abc")
  }
}
