package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def payloadDf = {
    val rows = Seq(
      Seq[Any](1L, "hello world".getBytes("UTF-8")),
      Seq[Any](2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)),
      Seq[Any](3L, Array[Byte](0xFF.toByte, 0xD8.toByte, 9, 9)))
    createDf(spark, "id bigint, payload binary", rows)
  }

  test("withBinaryMeta: size, sha256, magic-byte format sniff") {
    val got = Multimodal.withBinaryMeta(payloadDf, "payload")
      .select("id", "n_bytes", "sha", "format").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    val expSha = MessageDigest.getInstance("SHA-256")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((11, expSha, "unknown")))
    assert(got(2L)._3 == "png")
    assert(got(3L)._3 == "jpeg")
  }

  test("decodeImageStub: deterministic dims + 8-dim feature per payload") {
    val out = Multimodal.decodeImageStub(payloadDf, "id", "payload")
    assert(out.columns.toSeq == Seq("id", "width", "height", "n_channels", "feature"))
    val rows = out.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getInt(1) >= 64 && r.getInt(1) < 576)
      assert(r.getSeq[Float](4).length == 8)
    }
    // deterministic: run twice, same values
    val again = Multimodal.decodeImageStub(payloadDf, "id", "payload").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("sampleFramesStub: strided fixed-size chunks with frame indices") {
    val big = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, Array.tabulate(1000)(_.toByte))))
    val frames = Multimodal.sampleFramesStub(big, "id", "payload", frameBytes = 100, stride = 3)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2).length))
    // 10 chunks of 100 bytes, stride 3 -> indices 0,3,6,9
    assert(frames.map(_._1).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_._2 == 100))
  }

  test("resampleAudioStub: sample counts, output size, and nearest-hold picks") {
    // 8 s16 samples = 16 bytes; 4:1 decimation -> 2 output samples
    val pcm = Array.tabulate(16)(_.toByte)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, pcm)))
    val out = Multimodal.resampleAudioStub(d, "id", "payload",
      srcRate = 8000, dstRate = 2000).head()
    assert(out.getLong(1) == 8L && out.getLong(2) == 2L)
    val bytes = out.getAs[Array[Byte]](3)
    assert(bytes.length == 4)
    // nearest-hold: output sample j comes from src index j*8000/2000 = 4j
    assert(bytes.toSeq == Seq(pcm(0), pcm(1), pcm(8), pcm(9)))
  }

  test("resampleAudioStub: identity rates copy the payload verbatim") {
    val pcm = Array.tabulate(10)(i => (i * 7).toByte)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, pcm)))
    val out = Multimodal.resampleAudioStub(d, "id", "payload", 16000, 16000).head()
    assert(out.getAs[Array[Byte]](3).toSeq == pcm.toSeq)
  }

  test("resampleAudioStub: upsampling repeats source samples") {
    val pcm = Array[Byte](1, 2, 3, 4) // two s16 samples
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, pcm)))
    val out = Multimodal.resampleAudioStub(d, "id", "payload",
      srcRate = 1000, dstRate = 2000).head()
    assert(out.getLong(2) == 4L)
    // src index for j in 0..3 is j/2: samples 0,0,1,1
    assert(out.getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 2, 1, 2, 3, 4, 3, 4))
  }

  test("null payloads (fetch failures) yield null-metric rows, never executor NPEs") {
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, null), Seq[Any](2L, Array[Byte](1, 2, 3, 4))))
    val dec = Multimodal.decodeImageStub(d, "id", "payload")
      .filter(col("id") === 1L).head()
    assert(dec.isNullAt(1) && dec.isNullAt(4))
    assert(Multimodal.sampleFramesStub(d, "id", "payload", frameBytes = 2, stride = 1)
      .filter(col("id") === 1L).count() == 0)
    val res = Multimodal.resampleAudioStub(d, "id", "payload")
      .filter(col("id") === 1L).head()
    assert(res.isNullAt(1) && res.isNullAt(3))
  }

  test("odd trailing byte is ignored: n_in floors to whole 16-bit samples") {
    val pcm = Array[Byte](1, 2, 3, 4, 5) // 2.5 samples -> n_in = 2
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, pcm)))
    val out = Multimodal.resampleAudioStub(d, "id", "payload", 16000, 16000).head()
    assert(out.getLong(1) == 2L)
    assert(out.getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 2, 3, 4))
  }
}
