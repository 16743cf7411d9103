package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf
import graft.text.TextStats

/** Hand-checked values for bounded-hop BFS and the Gopher-rule quality
  * funnel.
  */
class BfsGopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edges(pairs: Seq[(Int, Int)]) =
    createDf(spark, "src int, dst int",
      pairs.map { case (u, v) => Seq[Any](u, v) })

  private def seeds(ns: Int*) =
    createDf(spark, "node int", ns.map(n => Seq[Any](n)))

  test("bfsDistances: path graph distances from one seed, hop bound respected") {
    val e = edges(Seq(1 -> 2, 2 -> 3, 3 -> 4, 4 -> 5))
    val full = Graph.bfsDistances(e, "src", "dst", seeds(1), "node", maxHops = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(full == Map(1 -> 0L, 2 -> 1L, 3 -> 2L, 4 -> 3L, 5 -> 4L))
    val bounded = Graph.bfsDistances(e, "src", "dst", seeds(1), "node", maxHops = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bounded == Map(1 -> 0L, 2 -> 1L, 3 -> 2L)) // 4,5 beyond the bound: absent
  }

  test("bfsDistances: multi-source takes the min; isolated seeds still report 0") {
    val e = edges(Seq(1 -> 2, 2 -> 3, 3 -> 4, 4 -> 5))
    val out = Graph.bfsDistances(e, "src", "dst", seeds(1, 5, 99), "node",
      maxHops = 4).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(5) == 0L && out(4) == 3L && out(99) == 0L)
    assert(out(3) == 2L) // min(from 1: 2, from 5: unreachable — directed)
  }

  private val goodDoc = Seq.fill(5)(
    "the quick brown foxes jumped over that lazy sleeping hound").mkString(" ")

  test("gopherFlags: a clean 50-word document passes all seven rules") {
    val df = createDf(spark, "text string", Seq(Seq[Any](goodDoc)))
    val r = df.select(TextStats.gopherFlags(col("text")).as("g"))
      .select("g.*").collect().head
    (0 until 7).foreach(i => assert(r.getBoolean(i), s"rule index $i"))
  }

  test("gopherReport: 3-doc funnel assigns each failure to the right rule") {
    val symbolDoc = Seq.fill(50)("#a#").mkString(" ") // 50 words, 100 hashes
    val df = createDf(spark, "text string",
      Seq(Seq[Any](goodDoc), Seq[Any]("hi there"), Seq[Any](symbolDoc)))
    val out = TextStats.gopherReport(df, col("text")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("words") == ((2L, 1L)))     // "hi there" too short
    assert(out("word_len") == ((3L, 0L)))
    assert(out("symbol") == ((2L, 1L)))    // the hash doc
    assert(out("alpha") == ((3L, 0L)))
    assert(out("bullet") == ((3L, 0L)))
    assert(out("ellipsis") == ((3L, 0L)))
    assert(out("stop") == ((1L, 2L)))      // only the clean doc has stopwords
    assert(out("all") == ((1L, 2L)))
  }
}
