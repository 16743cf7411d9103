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

  private def ppm(header: String, data: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ data

  test("decodePpm: parses a well-formed P6 and reports exact channel sums") {
    // 2×2 image: pixels (1,2,3) (4,5,6) (7,8,9) (10,11,12)
    val img = ppm("P6\n2 2\n255\n", Array.tabulate(12)(i => (i + 1).toByte))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val r = Multimodal.decodePpm(d, "id", "payload").head()
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)) == ((2, 2, 255, 4L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((1L + 4 + 7 + 10, 2L + 5 + 8 + 11, 3L + 6 + 9 + 12)))
  }

  test("decodePpm: comments and arbitrary whitespace in the header; high bytes unsigned") {
    val img = ppm("P6 # a comment\n# another\n 1\t1 # dims done\n255 ",
      Array(0xFF.toByte, 0x80.toByte, 0x00.toByte))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val r = Multimodal.decodePpm(d, "id", "payload").head()
    assert((r.getInt(1), r.getInt(2), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((1, 1, 255L, 128L, 0L)))
  }

  test("decodePpm: pixel data may begin with whitespace-looking bytes (single post-maxval separator)") {
    // first data byte is 0x0A ('\n') — a correct parser must not eat it
    val img = ppm("P6\n1 1\n255\n", Array[Byte](0x0A, 0x20, 0x0D))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val r = Multimodal.decodePpm(d, "id", "payload").head()
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((10L, 32L, 13L)))
  }

  test("decodePpm: bad magic, truncated data, maxval > 255, and null all yield null-metric rows") {
    val rows = Seq(
      Seq[Any](1L, "nope".getBytes("US-ASCII")),
      Seq[Any](2L, ppm("P6\n2 2\n255\n", Array[Byte](1, 2, 3))), // 3 of 12 bytes
      Seq[Any](3L, ppm("P6\n1 1\n65535\n", Array.fill(6)(1.toByte))),
      Seq[Any](4L, null))
    val d = createDf(spark, "id bigint, payload binary", rows)
    val out = Multimodal.decodePpm(d, "id", "payload").collect()
    assert(out.length == 4 && out.forall(r => r.isNullAt(1) && r.isNullAt(7)))
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
    val dec = Multimodal.decodePpm(d, "id", "payload")
      .filter(col("id") === 1L).head()
    assert(dec.isNullAt(1) && dec.isNullAt(7))
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

  test("resizePpmNearest: identity dims reproduce the payload byte-for-byte") {
    val img = ppm("P6\n2 2\n255\n", Array.tabulate(12)(i => (i + 1).toByte))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val out = Multimodal.resizePpmNearest(d, "id", "payload", 2, 2).head()
    assert(out.getAs[Array[Byte]](1).toSeq == img.toSeq)
  }

  test("resizePpmNearest: downsample picks floor-convention pixels; result decodes") {
    // 4×1 image, pixels P0..P3; resize to 2×1 keeps P0 and P2
    val img = ppm("P6\n4 1\n255\n", Array.tabulate(12)(i => (10 * (i / 3) + i % 3).toByte))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val small = Multimodal.resizePpmNearest(d, "id", "payload", 2, 0)
    val r = Multimodal.decodePpm(small, "id", "resized").head()
    assert((r.getInt(1), r.getInt(2)) == ((2, 1)))
    // P0 = (0,1,2), P2 = (20,21,22)
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((20L, 22L, 24L)))
  }

  test("resizePpmNearest: upsample repeats nearest pixels") {
    val img = ppm("P6\n1 1\n255\n", Array[Byte](9, 8, 7))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val big = Multimodal.resizePpmNearest(d, "id", "payload", 3, 2)
    val r = Multimodal.decodePpm(big, "id", "resized").head()
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((6L, 54L, 48L, 42L)))
  }

  test("near-Int.MaxValue dims cannot overflow the truncation guard into garbage stats") {
    // 3L * w * h wraps Long for w = h = Int.MaxValue; a correct guard
    // rejects the crafted header instead of summing 3 garbage bytes
    val evil = ppm(s"P6\n${Int.MaxValue} ${Int.MaxValue}\n255\n", Array[Byte](1, 2, 3))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, evil)))
    val dec = Multimodal.decodePpm(d, "id", "payload").head()
    assert(dec.isNullAt(1) && dec.isNullAt(5), s"crafted dims must null out: $dec")
    assert(Multimodal.resizePpmNearest(d, "id", "payload", 2, 2).head().isNullAt(1))
  }

  test("resizePpmNearest: malformed, truncated, or 0-area-to-positive yield null payloads") {
    val empty = ppm("P6\n4 0\n255\n", Array.empty[Byte])
    val rows = Seq(
      Seq[Any](1L, "nonsense".getBytes),
      Seq[Any](2L, ppm("P6\n4 2\n255\n", Array[Byte](1, 2, 3))), // truncated
      Seq[Any](3L, null),
      Seq[Any](4L, empty))
    val d = createDf(spark, "id bigint, payload binary", rows)
    val out = Multimodal.resizePpmNearest(d, "id", "payload", 2, 2).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true))
    // but 0-area → 0-area is representable and stays decodable
    val keep = Multimodal.resizePpmNearest(
      createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, empty))),
      "id", "payload", 2, 0)
    val r = Multimodal.decodePpm(keep, "id", "resized").head()
    assert((r.getInt(1), r.getInt(2), r.getLong(4)) == ((2, 0, 0L)))
    // a target too large for a JVM array is null, not a negative-size crash
    val one = ppm("P6\n1 1\n255\n", Array[Byte](1, 2, 3))
    val huge = Multimodal.resizePpmNearest(
      createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, one))),
      "id", "payload", 100000, 100000).head()
    assert(huge.isNullAt(1))
  }

  // ------------------------------------------------------------- WAV

  private def wavOf(id: Long, raw: Array[Byte], rate: Int = 8000): Array[Byte] = {
    val d = createDf(spark, "id bigint, bytes binary, rate int",
      Seq(Seq[Any](id, raw, rate)))
    Multimodal.encodeWavPcm16(d, "id", "bytes", "rate").head().getAs[Array[Byte]](1)
  }

  test("encodeWavPcm16 → decodeWav round trip: header facts and exact signed sums") {
    // samples (LE): 1, -1, -32768 → sum = -32768
    val raw = Array[Byte](1, 0, 0xFF.toByte, 0xFF.toByte, 0, 0x80.toByte)
    val payload = wavOf(1L, raw, rate = 44100)
    assert(payload.length == 44 + 6)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, payload)))
    val r = Multimodal.decodeWav(d, "id", "payload").head()
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)) ==
      ((1, 44100, 16, 3L, 1L - 1L - 32768L)))
    assert(r.isNullAt(6)) // mono: no second channel
  }

  test("encodeWavPcm16 drops an odd trailing byte and sizes the chunks to match") {
    val payload = wavOf(1L, Array[Byte](1, 0, 9)) // 1.5 samples → 1
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, payload)))
    val r = Multimodal.decodeWav(d, "id", "payload").head()
    assert((r.getLong(4), r.getLong(5)) == ((1L, 1L)))
  }

  test("decodeWav walks unknown chunks (with odd-size padding) before data, reads stereo") {
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    // stereo frames: (ch0, ch1) = (5, -5), (100, 200)
    val data = le16(5) ++ le16(-5 & 0xFFFF) ++ le16(100) ++ le16(200)
    val p = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(3) ++ Array[Byte](7, 7, 7, 0) ++ // odd size: 1 pad byte
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(8000 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, p)))
    val r = Multimodal.decodeWav(d, "id", "payload").head()
    assert((r.getInt(1), r.getInt(2), r.getLong(4)) == ((2, 8000, 2L)))
    assert((r.getLong(5), r.getLong(6)) == ((105L, 195L)))
  }

  test("decodeWav rejects malformation with null rows, never exceptions") {
    val good = wavOf(1L, Array[Byte](1, 0, 2, 0))
    val badMagic = good.clone(); badMagic(0) = 'X'
    val truncated = good.dropRight(1) // data chunk promises more than present
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt audioFormat = 3 (float)
    val rows = Seq(Seq[Any](1L, badMagic), Seq[Any](2L, truncated),
      Seq[Any](3L, nonPcm), Seq[Any](4L, null), Seq[Any](5L, "RIFF".getBytes))
    val d = createDf(spark, "id bigint, payload binary", rows)
    val out = Multimodal.decodeWav(d, "id", "payload").collect()
    assert(out.length == 5 && out.forall(r => r.isNullAt(1) && r.isNullAt(4)))
  }
}
