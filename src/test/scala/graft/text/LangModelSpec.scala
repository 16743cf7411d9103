package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = createDf(spark, "doc_id bigint, text string",
    Seq(
      Seq[Any](1L, "the cat sat"),
      Seq[Any](2L, "the cat ran"),
      Seq[Any](3L, "the dog sat"),
    ))

  test("bigramCounts: pair and prefix counts, normalization law sum(c12)=c1") {
    val m = LangModel.bigramCounts(corpus, "text")
    val rows = m.collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows(("the", "cat")) == (2L, 3L)) // 'the' prefixes 3 bigrams
    assert(rows(("the", "dog")) == (1L, 3L))
    assert(rows(("cat", "sat")) == (1L, 2L))
    // law: per-prefix pair counts sum to the prefix count
    val law = m.groupBy("w1").agg(sum("c12").as("s"), first("c1").as("c"))
      .filter(col("s") =!= col("c"))
    assert(law.count() == 0)
  }

  test("scoreDocs: in-domain text outscores out-of-domain; unseen counted") {
    val m = LangModel.bigramCounts(corpus, "text")
    val v = LangModel.vocabSize(m)
    val cand = createDf(spark, "doc_id bigint, text string",
      Seq(Seq[Any](10L, "the cat sat"), Seq[Any](11L, "zebra quantum flux")))
    val got = LangModel.scoreDocs(cand, m, "doc_id", "text", v)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(10L).getAs[Double]("avg_logp") > got(11L).getAs[Double]("avg_logp"))
    assert(got(10L).getAs[Long]("n_unseen") == 0L)
    assert(got(11L).getAs[Long]("n_unseen") == 2L)
    assert(got(10L).getAs[Long]("n_bigrams") == 2L)
  }

  test("short and empty docs score null with zero stats, and still appear") {
    val m = LangModel.bigramCounts(corpus, "text")
    val cand = createDf(spark, "doc_id bigint, text string",
      Seq(Seq[Any](20L, "solitary"), Seq[Any](21L, "")))
    val got = LangModel.scoreDocs(cand, m, "doc_id", "text", LangModel.vocabSize(m))
    assert(got.count() == 2)
    assert(got.filter(col("avg_logp").isNotNull).count() == 0)
    assert(got.agg(sum("n_bigrams")).head().getLong(0) == 0L)
  }

  test("self-scoring law: every training bigram is seen (n_unseen = 0)") {
    val m = LangModel.bigramCounts(corpus, "text")
    val got = LangModel.scoreDocs(corpus, m, "doc_id", "text", LangModel.vocabSize(m))
    assert(got.agg(sum("n_unseen")).head().getLong(0) == 0L)
  }

  test("determinism: re-partitioned rerun produces identical scores") {
    val m = LangModel.bigramCounts(corpus, "text")
    val v = LangModel.vocabSize(m)
    val a = LangModel.scoreDocs(corpus, m, "doc_id", "text", v)
    val b = LangModel.scoreDocs(corpus.repartition(7), m.repartition(5), "doc_id", "text", v)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("smoothing: probabilities stay finite for fully-unseen bigrams") {
    val m = LangModel.bigramCounts(corpus, "text")
    val cand = createDf(spark, "doc_id bigint, text string",
      Seq(Seq[Any](30L, "xx yy zz")))
    val s = LangModel.scoreDocs(cand, m, "doc_id", "text", LangModel.vocabSize(m))
      .head().getAs[Double]("avg_logp")
    assert(!s.isNaN && !s.isInfinite && s < 0)
  }
}
