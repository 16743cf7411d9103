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

  // ------------------------------------------------------------- AVI

  private def aviOf(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val d = createDf(spark, "id bigint, rgb binary", Seq(Seq[Any](1L, rgb)))
    Multimodal.encodeAviRgb24(d, "id", "rgb", w, h).head().getAs[Array[Byte]](1)
  }

  test("encodeAviRgb24 → sampleAviFrames round trip: strided frames, exact channel sums") {
    // 3 frames of 2×2 RGB24 = 36 source bytes, values 0..35
    val rgb = Array.tabulate(36)(_.toByte)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, aviOf(rgb, 2, 2))))
    val rows = Multimodal.sampleAviFrames(d, "id", "payload", stride = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))
    // frames 0 and 2 sampled; frame f covers source bytes 12f..12f+11;
    // RGB→BGR means DIB channel B = source bytes ≡ 2 (mod 3), G ≡ 1, R ≡ 0;
    // image-top-left blue = source byte 12f+2 (pixel (0,0)'s B)
    def s(f: Int, m: Int) = (0 until 12).filter(_ % 3 == m).map(12 * f + _).sum.toLong
    assert(rows.toSeq == Seq(
      (0, 2, 2, s(0, 2), s(0, 1), s(0, 0), 2),
      (2, 2, 2, s(2, 2), s(2, 1), s(2, 0), 26)))
  }

  test("AVI frames honor DIB row padding and bottom-up row order") {
    // one 3×2 frame: 9-byte rows pad to 12; source bytes 1..18
    val payload = aviOf(Array.tabulate(18)(i => (i + 1).toByte), 3, 2)
    val Some((w, h, offs)) = Multimodal.parseAvi(payload): @unchecked
    assert((w, h, offs.length) == ((3, 2, 1)))
    val off = offs(0)
    // DIB buffer row 0 = SOURCE row 1 (bottom-up); its first sample is
    // B of source pixel (0,1) = source byte index 11 → value 12
    assert((payload(off) & 0xFF) == 12)
    // the 3 pad bytes of each 12-byte row stay zero
    assert((payload(off + 9) | payload(off + 10) | payload(off + 11)) == 0)
    // DIB buffer row 1 = source row 0: B of source pixel (0,0) → value 3
    assert((payload(off + 12) & 0xFF) == 3)
  }

  test("aviSceneCuts: black→black→white fires exactly one cut at frame 2") {
    // frames: black (12×0x00), black, white (12×0xFF): luma delta is 0
    // between frames 0-1 and full-scale between 1-2
    val rgb = Array.fill(12)(0.toByte) ++ Array.fill(12)(0.toByte) ++
      Array.fill(12)(0xFF.toByte)
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, aviOf(rgb, 2, 2))))
    val r = Multimodal.aviSceneCuts(d, "id", "payload",
      thresholdMicros = 250000L).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 2L)
    // a threshold above full scale never fires; first_cut_idx is null
    val r2 = Multimodal.aviSceneCuts(d, "id", "payload",
      thresholdMicros = 1000001L).head()
    assert(r2.getLong(2) == 0L && r2.isNullAt(3))
  }

  test("encodeAviRgb24 drops a trailing partial frame; stride 1 samples every frame") {
    val rgb = Array.tabulate(30)(_.toByte) // 2.5 frames of 2×2 → 2 frames
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, aviOf(rgb, 2, 2))))
    val idx = Multimodal.sampleAviFrames(d, "id", "payload")
      .collect().map(_.getInt(1)).toSeq
    assert(idx == Seq(0, 1))
  }

  test("parseAvi rejects malformation with no rows, never exceptions") {
    val good = aviOf(Array.tabulate(12)(_.toByte), 2, 2)
    val badMagic = good.clone(); badMagic(8) = 'X'
    val bad24 = good.clone(); bad24(186) = 32 // strf biBitCount 24 → 32
    val mismatch = good.clone(); mismatch(48) = 2 // avih dwTotalFrames 1 → 2
    val rows = Seq(Seq[Any](1L, badMagic), Seq[Any](2L, bad24),
      Seq[Any](3L, mismatch), Seq[Any](4L, good.dropRight(1)),
      Seq[Any](5L, null), Seq[Any](6L, "RIFF".getBytes))
    val d = createDf(spark, "id bigint, payload binary", rows)
    assert(Multimodal.sampleAviFrames(d, "id", "payload").count() == 0)
    // and the unmutated container does parse
    assert(Multimodal.parseAvi(good).isDefined)
  }

  // --------------------------------------------------- WAV resampling

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  test("resampleWav: 12→8 kHz decimation picks ⌊3j/2⌋ and re-encodes a valid container") {
    val raw = Seq(10, 20, 30, 40, 50, 60).flatMap(le16).toArray // 6 mono frames
    val d = createDf(spark, "id bigint, bytes binary, rate int",
      Seq(Seq[Any](1L, raw, 12000)))
    val wav = Multimodal.encodeWavPcm16(d, "id", "bytes", "rate")
    val res = Multimodal.resampleWav(wav, "id", "payload", dstRate = 8000)
    val dec = Multimodal.decodeWav(res, "id", "resampled").head()
    // n_out = ⌊6·8000/12000⌋ = 4, picking source frames 0,1,3,4
    assert((dec.getInt(2), dec.getLong(4), dec.getLong(5)) ==
      ((8000, 4L, 10L + 20 + 40 + 50)))
  }

  test("resampleWav: upsampling holds frames and preserves stereo channels") {
    // 2 stereo frames: (ch0, ch1) = (5, -5), (100, 200)
    val data = le16(5) ++ le16(-5 & 0xFFFF) ++ le16(100) ++ le16(200)
    val p = Multimodal.buildWavPcm16(data, 4000, channels = 2)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, p)))
    val res = Multimodal.resampleWav(d, "id", "payload", dstRate = 8000)
    val dec = Multimodal.decodeWav(res, "id", "resampled").head()
    // 4000→8000 doubles: frames 0,0,1,1 on both channels
    assert((dec.getInt(1), dec.getInt(2), dec.getLong(4)) == ((2, 8000, 4L)))
    assert((dec.getLong(5), dec.getLong(6)) == ((2L * 5 + 2 * 100, 2L * -5 + 2 * 200)))
  }

  test("resampleWav: identity rate reproduces the sample stream") {
    val raw = Seq(7, -7, 1000).flatMap(v => le16(v & 0xFFFF)).toArray
    val p = Multimodal.buildWavPcm16(raw, 16000)
    val out = Multimodal.resampleWavPure(p, 16000)
    assert(out.toSeq == p.toSeq) // same rate, same frames → identical container
  }

  test("resampleWav: malformed or null payloads yield null containers") {
    val good = Multimodal.buildWavPcm16(le16(1) ++ le16(2), 8000)
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt audioFormat = 3 (float)
    val rows = Seq(Seq[Any](1L, nonPcm), Seq[Any](2L, null),
      Seq[Any](3L, "RIFF".getBytes))
    val d = createDf(spark, "id bigint, payload binary", rows)
    val out = Multimodal.resampleWav(d, "id", "payload", 8000).collect()
    assert(out.length == 3 && out.forall(_.isNullAt(1)))
  }

  test("null payloads (fetch failures) yield null-metric rows, never executor NPEs") {
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, null), Seq[Any](2L, Array[Byte](1, 2, 3, 4))))
    val dec = Multimodal.decodePpm(d, "id", "payload")
      .filter(col("id") === 1L).head()
    assert(dec.isNullAt(1) && dec.isNullAt(7))
    assert(Multimodal.sampleAviFrames(d, "id", "payload")
      .filter(col("id") === 1L).count() == 0)
    assert(Multimodal.resampleWav(d, "id", "payload", 8000)
      .filter(col("id") === 1L).head().isNullAt(1))
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

  test("ppmLumaStats: hand-checked 601 luma sums, max, bright count") {
    // 1×2: black pixel and pure white pixel
    val img = ppm("P6\n1 2\n255\n",
      Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte))
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, img)))
    val r = Multimodal.ppmLumaStats(d, "id", "payload").head()
    // white: (299+587+114)*255 = 255000
    assert(r.getLong(1) == 2L && r.getLong(2) == 255000L)
    assert(r.getLong(3) == 255000L && r.getLong(4) == 1L)
  }

  test("ppmLumaStats: luma is NOT channel-symmetric (green dominates)") {
    val redOnly = ppm("P6\n1 1\n255\n", Array[Byte](200.toByte, 0, 0))
    val greenOnly = ppm("P6\n1 1\n255\n", Array[Byte](0, 200.toByte, 0))
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, redOnly), Seq[Any](2L, greenOnly)))
    val got = Multimodal.ppmLumaStats(d, "id", "payload").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 299L * 200 && got(2L) == 587L * 200)
  }

  test("ppmLumaStats: zero-pixel image folds 0/null/0; malformed is all-null") {
    val empty = ppm("P6\n0 0\n255\n", Array.empty[Byte])
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, empty), Seq[Any](2L, "nope".getBytes)))
    val got = Multimodal.ppmLumaStats(d, "id", "payload").collect()
      .sortBy(_.getLong(0))
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 0L
      && got(0).isNullAt(3) && got(0).getLong(4) == 0L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(3))
  }

  test("wavLoudness: energy, peak, and silence from a hand-built clip") {
    // samples: 0 (silent), 1000 (not <1000), -32768 (peak)
    val raw = le16(0) ++ le16(1000) ++ le16(-32768 & 0xFFFF)
    val wav = Multimodal.buildWavPcm16(raw, 8000)
    val d = createDf(spark, "id bigint, payload binary", Seq(Seq[Any](1L, wav)))
    val r = Multimodal.wavLoudness(d, "id", "payload", silenceThreshold = 1000).head()
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 1000L * 1000 + 32768L * 32768)
    assert(r.getInt(3) == 32768 && r.getLong(4) == 1L)
  }

  test("wavLoudness: malformed and empty payloads follow the decoder contract") {
    val empty = Multimodal.buildWavPcm16(Array.empty[Byte], 8000)
    val d = createDf(spark, "id bigint, payload binary",
      Seq(Seq[Any](1L, empty), Seq[Any](2L, "RIFF".getBytes), Seq[Any](3L, null)))
    val got = Multimodal.wavLoudness(d, "id", "payload").collect().sortBy(_.getLong(0))
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 0L
      && got(0).isNullAt(3) && got(0).getLong(4) == 0L)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
  }
}
