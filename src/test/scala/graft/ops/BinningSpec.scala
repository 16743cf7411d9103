package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class BinningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("discretizeEqualFreq: bucket sizes differ by at most one, earlier buckets larger") {
    val d = (1 to 10).map(i => ("g", i.toDouble)).toDF("k", "v")
    val sizes = Binning.discretizeEqualFreq(d, Seq("k"), "v", 3)
      .groupBy("bin").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1 -> 4L, 2 -> 3L, 3 -> 3L)) // SQL-standard remainder placement
  }

  test("bins are rank-ordered: every value in bin i <= every value in bin i+1") {
    val rng = new scala.util.Random(11)
    val d = Seq.fill(200)(rng.nextInt(50).toDouble).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("k", "v", "id")
    val rows = Binning.discretizeEqualFreq(d, Seq("k"), "v", 5, tieBreak = Seq("id"))
      .select("bin", "v").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val maxPerBin = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val minPerBin = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    for (b <- 1 until 5) assert(maxPerBin(b) <= minPerBin(b + 1))
  }

  test("groups bin independently") {
    val d = (1 to 8).map(i => (if (i <= 4) "a" else "b", i.toDouble)).toDF("k", "v")
    val out = Binning.discretizeEqualFreq(d, Seq("k"), "v", 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    assert(out == Set(("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 2), ("a", 4.0, 2),
      ("b", 5.0, 1), ("b", 6.0, 1), ("b", 7.0, 2), ("b", 8.0, 2)))
  }

  test("exact path: null values get a null bin, never bin 1 (same contract as sketch path)") {
    val d = createDf(spark, "k string, v double", Seq(
      Seq[Any]("g", 3.0), Seq[Any]("g", 1.0), Seq[Any]("g", null), Seq[Any]("g", 2.0)))
    val out = Binning.discretizeEqualFreq(d, Seq("k"), "v", 3)
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double]) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(out(None) == None)                 // null value -> null bin
    assert(out(Some(1.0)) == Some(1))         // real minimum still owns bin 1
    assert(out(Some(3.0)) == Some(3))
  }

  test("cutpoints fails fast on all-null or empty input") {
    val empty = createDf(spark, "k string, v double", Seq(Seq[Any]("g", null)))
    val e = intercept[IllegalArgumentException](Binning.cutpoints(empty, "v", 4))
    assert(e.getMessage.contains("no non-null"))
  }

  test("cutpoints + discretizeByCutpoints: ascending edges, 1-based monotone bins, null-safe") {
    val d = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val edges = Binning.cutpoints(d, "v", 4)
    assert(edges.size == 3 && edges == edges.sorted)
    val binned = Binning.discretizeByCutpoints(d, "v", edges)
    val byV = binned.collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(byV(1.0) == 1 && byV(100.0) == 4)
    assert(byV.toSeq.sortBy(_._1).map(_._2).sliding(2).forall(p => p.head <= p.last))
    val withNull = createDf(spark, "k string, v double", Seq(Seq[Any]("g", null)))
    assert(Binning.discretizeByCutpoints(withNull, "v", edges)
      .head().isNullAt(2))
  }

  test("sketch path approximates the exact path on well-separated data") {
    val d = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val edges = Binning.cutpoints(d, "v", 4)
    val sketchCounts = Binning.discretizeByCutpoints(d, "v", edges)
      .groupBy("bin").count().collect().map(_.getLong(1))
    // on 1000 distinct uniform values the sketch bins are within a few
    // percent of perfectly balanced
    assert(sketchCounts.forall(c => c > 200 && c < 300), sketchCounts.toSeq)
  }

  test("invalid arguments fail fast") {
    val d = Seq(("g", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](Binning.discretizeEqualFreq(d, Seq("k"), "v", 0))
    intercept[IllegalArgumentException](Binning.cutpoints(d, "v", 1))
    intercept[IllegalArgumentException](Binning.discretizeByCutpoints(d, "v", Nil))
    intercept[IllegalArgumentException](Binning.discretizeByCutpoints(d, "v", Seq(2.0, 1.0)))
    intercept[IllegalArgumentException](
      Binning.discretizeEqualFreq(d.withColumn("bin", lit(1)), Seq("k"), "v", 2))
  }
}
