package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 2 target docs speak "cat dog", 2 raw docs speak "stock price".
  private def docs = createDf(spark, "id int, text string, tgt boolean", Seq(
    Seq[Any](1, "cat dog cat", true),
    Seq[Any](2, "dog cat dog cat", true),
    Seq[Any](3, "stock price up", false),
    Seq[Any](4, "price stock down stock", false),
  ))

  test("featureBuckets emits 2n-1 hex-prefix buckets per doc") {
    val r = docs.select(Dsir.featureBuckets(col("text"), 3).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(r.map(_.length).sorted.toSeq == Seq(5, 5, 7, 7)) // 2·3-1, 2·4-1
    assert(r.flatten.forall(b => b.length == 3 && b.forall("0123456789abcdef".contains(_))))
  }

  test("target-vocabulary docs outscore raw-vocabulary docs, exactly as recomputed") {
    val llr = Dsir.importanceTable(docs, "text", col("tgt"), hexChars = 3)
    val scored = Dsir.scoreDocuments(docs, "id", "text", llr, hexChars = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    // independent recompute: bucket counts from featureBuckets, the
    // smoothed-LLR micro-nat quantization in plain JVM arithmetic
    val feats = docs.select(col("id"), col("tgt"),
        explode(Dsir.featureBuckets(col("text"), 3)).as("b"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getString(2)))
    val nq = feats.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val np = feats.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tq, tp) = (feats.size.toLong, feats.count(_._2).toLong)
    def llrMicro(b: String): Long = {
      val pt = (np.getOrElse(b, 0L) + 1).toDouble / (tp + 4096).toDouble
      val pq = (nq(b) + 1).toDouble / (tq + 4096).toDouble
      math.round(math.log(pt / pq) * 1e6)
    }
    val expected = feats.groupBy(_._1).view.mapValues { fs =>
      (fs.size.toLong, fs.map(f => llrMicro(f._3)).sum)
    }.toMap
    assert(scored == expected)

    // the target slice's vocabulary dominates: every target doc above every raw doc
    assert(Seq(1, 2).map(scored(_)._2).min > Seq(3, 4).map(scored(_)._2).max)
  }

  test("empty target slice degrades gracefully: uniform negative prior, selection still total") {
    val llr = Dsir.importanceTable(docs, "text", lit(false), hexChars = 3)
    // np = 0 everywhere: llr = ln((1/B') / ((nq+1)/(tq+B))) — finite, defined
    val rows = llr.collect()
    assert(rows.nonEmpty && rows.forall(r => !r.isNullAt(1)))
    val top = Dsir.selectTopK(docs, "id", "text", lit(false), k = 10, hexChars = 3)
      .collect()
    assert(top.length == 4) // k caps at corpus size, every doc scored
  }

  test("selectTopK is a deterministic id-tie-broken prefix") {
    val top = Dsir.selectTopK(docs, "id", "text", col("tgt"), k = 2, hexChars = 3)
      .select(col("id")).collect().map(_.getInt(0)).toSeq
    assert(top == Seq(2, 1) || top == Seq(1, 2))
    val again = Dsir.selectTopK(docs, "id", "text", col("tgt"), k = 2, hexChars = 3)
      .select(col("id")).collect().map(_.getInt(0)).toSeq
    assert(top == again)
    // doc 2 has strictly more target-vocab mass than doc 1
    assert(top.head == 2)
  }
}
