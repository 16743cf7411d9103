package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Two well-separated label clusters on a line, plus ids; with one
    * cell and full probing the IVF is exhaustive, so expectations are
    * checkable by hand.
    */
  private def corpus() = {
    import spark.implicits._
    // label 0 near (1, 0), label 1 near (0, 1)
    Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0.8f, 0.2f), 0),
      (10L, Seq(0.0f, 1.0f), 1),
      (11L, Seq(0.1f, 0.9f), 1),
      (12L, Seq(0.2f, 0.8f), 1),
    ).toDF("vec_id", "embedding", "label")
  }

  test("every mined negative has a label different from its query's") {
    val c = corpus()
    val out = Similarity.hardNegativesDeterministic(c, c,
      "vec_id", "embedding", "label", k = 2, nCells = 1, iters = 1, nProbe = 1)
    val lab = c.select(col("vec_id"), col("label"))
    val joined = out
      .join(lab.withColumnsRenamed(Map("vec_id" -> "query_id", "label" -> "ql")), "query_id")
      .join(lab.withColumnsRenamed(Map("vec_id" -> "neighbor_id", "label" -> "nl")), "neighbor_id")
    assert(joined.count() == 12) // 6 queries x k=2 (plenty of cross-label candidates)
    assert(joined.filter(col("ql") === col("nl")).count() == 0)
  }

  test("the nearest OPPOSITE-label vector wins rank 1 even when same-label is closer") {
    val c = corpus()
    val out = Similarity.hardNegativesDeterministic(c, c,
        "vec_id", "embedding", "label", k = 1, nCells = 1, iters = 1, nProbe = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    // query 0 (1,0): nearest overall is 1 (same label) — must skip to the
    // closest label-1 vector, which is 12 (0.2, 0.8)
    assert(out(0L) == 12L)
    // symmetric for query 10 (0,1): closest label-0 vector is 2
    assert(out(10L) == 2L)
  }

  test("ranks are dense from 1 and bounded by k") {
    val c = corpus()
    val out = Similarity.hardNegativesDeterministic(c, c,
      "vec_id", "embedding", "label", k = 3, nCells = 1, iters = 1, nProbe = 1)
    val bad = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 3)
    assert(bad.count() == 0)
  }

  test("single-label corpus mines nothing (no negatives exist)") {
    val c = corpus().withColumn("label", lit(7))
    graft.Caches.clearAll() // same corpus plan shape, different label column values
    val out = Similarity.hardNegativesDeterministic(c, c,
      "vec_id", "embedding", "label", k = 2, nCells = 1, iters = 1, nProbe = 1)
    assert(out.count() == 0)
  }
}
