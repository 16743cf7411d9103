package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.multimodal.Multimodal
import graft.ops.{AsOf, Columns, Concat, Grouped, Merge, Pack, Profile, RangeJoin, Reshape, Sampling, Skew, Timeseries}
import graft.streaming.Streaming
import graft.text.{Boilerplate, Cluster, Dedup, Dsir, LangModel, Pq, Rank, Similarity, TextStats}

import graft.queries.Qh.{t, dsum}

/** Multimodal family: binary metadata, image decode/resize, WAV, frame sampling.
  *
  * Query defs + their DuckDB oracle SQL, split out of the former
  * monolithic SparkEntry (registry semantics unchanged — the maps merge
  * in [[graft.SparkEntry]]).
  */
object MultimodalQueries {

  /** Binary payload metadata (size, sha256 content key, format sniff) over
    * text-as-binary payloads.
    */
  private def qBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").withColumn("payload", col("text").cast("binary"))
    Multimodal.withBinaryMeta(d, "payload")
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"), col("sha"), col("format"))
      .orderBy(col("doc_id"))
  }

  /** REAL image decode ([[graft.multimodal.Multimodal.decodePpm]] — a
    * complete pure-JVM P6 parser). The testdata carries no image column,
    * so each document's bytes are wrapped in a genuine PPM container
    * (header + raw RGB data) in-query; the decoder then parses that
    * container from the payload bytes alone — magic, dimensions, maxval,
    * data offset — and computes per-channel pixel sums. The oracle
    * recomputes every output from the raw text independently, so a
    * misread header, a wrong data offset, or a channel-interleave slip
    * all hash-mismatch.
    */
  private def qDecode(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      // 4-pixel-wide rows: h = ⌊bytes/12⌋ full rows of 4 RGB pixels
      .withColumn("h", floor(octet_length(col("bytes")) / 12).cast("int"))
      .select(col("doc_id"),
        concat(
          concat(lit("P6\n4 "), col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("bytes").substr(lit(1), col("h") * 12)).as("payload"))
    Multimodal.decodePpm(d, "doc_id", "payload")
      .select(col("doc_id"), col("width"), col("height"), col("maxval"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** REAL image resize ([[graft.multimodal.Multimodal.resizePpmNearest]])
    * proven through the engine's own codec: each document's bytes become
    * a genuine 4×h P6 container (same synthesis as [[qDecode]]), the
    * resizer halves the width by nearest-neighbor (src_x = 2·dst_x), and
    * [[graft.multimodal.Multimodal.decodePpm]] then parses the RESIZED
    * container back — so the query only passes if the resizer emits a
    * valid P6 whose pixel grid is exactly the sampled sub-grid. The
    * oracle recomputes the resized channel sums from the raw text with
    * independent index arithmetic (byte (4·y + 2·x)·3 + c).
    */
  private def qResize(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .withColumn("h", floor(octet_length(col("bytes")) / 12).cast("int"))
      .select(col("doc_id"),
        concat(
          concat(lit("P6\n4 "), col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("bytes").substr(lit(1), col("h") * 12)).as("payload"))
    val small = Multimodal.resizePpmNearest(d, "doc_id", "payload", outW = 2, outH = 0)
    Multimodal.decodePpm(small, "doc_id", "resized")
      .select(col("doc_id"), col("width"), col("height"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio decode ([[graft.multimodal.Multimodal.decodeWav]] — a
    * complete pure-JVM RIFF/WAVE chunk walker). The testdata carries no
    * audio column, so each document's bytes are first wrapped in a genuine
    * 44-byte PCM WAV container ([[graft.multimodal.Multimodal.encodeWavPcm16]],
    * sample rate varying per row to exercise the header parse), then the
    * decoder recovers channel count, rate, bit width, frame count, and the
    * exact signed-sample sum from the payload bytes alone. The oracle
    * recomputes all of it from the raw text independently (16-bit LE
    * reassembly in SQL), so a wrong chunk offset, an endianness slip, or a
    * sign-extension bug all hash-mismatch.
    */
  private def qWav(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        (lit(8000) + (col("doc_id") % 3).cast("int") * lit(4000)).as("rate"))
    val wav = Multimodal.encodeWavPcm16(d, "doc_id", "bytes", "rate")
    Multimodal.decodeWav(wav, "doc_id", "payload")
      .select(col("doc_id"), col("n_channels"), col("sample_rate"), col("bits"),
        col("n_frames"), col("sum_ch0"))
      .orderBy(col("doc_id"))
  }

  /** REAL video frame sampling ([[graft.multimodal.Multimodal.sampleAviFrames]]
    * — a complete pure-JVM RIFF/AVI demuxer) proven through the engine's
    * own writer: each document's bytes become packed top-down RGB24
    * frames of a 2×2 video (12 source bytes per frame),
    * [[graft.multimodal.Multimodal.encodeAviRgb24]] wraps them in a
    * genuine AVI container (DIB convention: bottom-up rows, BGR samples,
    * rows padded to 4 bytes — 2·3=6-byte rows pad to 8), and the demuxer
    * samples every 2nd frame, so the query only passes if the chunk walk,
    * the pad-byte exclusion, AND the RGB→BGR/bottom-up round trip are all
    * exact. `top_b` pins the row order: the image-top-left blue sample of
    * sampled frame i is source byte 12·i+2, which the oracle recomputes
    * straight from the raw text with independent index arithmetic.
    */
  /** Scene cuts ([[graft.multimodal.Multimodal.aviSceneCuts]]) over the
    * genuine 2×2 RGB24 AVI containers built from each document's bytes:
    * global-luma frame differencing at a 25%-of-full-scale threshold —
    * the codec runs once, the detector is a lag window + integer
    * cross-multiply in the engine. The oracle recomputes every frame's
    * milli-luma straight from the raw text bytes by hex arithmetic and
    * replays the lag/threshold exactly.
    */
  private def qSceneCuts(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("rgb"))
    val avi = Multimodal.encodeAviRgb24(d, "doc_id", "rgb", width = 2, height = 2)
    Multimodal.aviSceneCuts(avi, "doc_id", "payload",
        thresholdMicros = 250000L)
      .orderBy(col("doc_id"))
  }

  private def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("rgb"))
    val avi = Multimodal.encodeAviRgb24(d, "doc_id", "rgb", width = 2, height = 2)
    Multimodal.sampleAviFrames(avi, "doc_id", "payload", stride = 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("top_left_b").cast("long")).as("top_b"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio resampling ([[graft.multimodal.Multimodal.resampleWav]])
    * container-to-container: each document's bytes become a genuine
    * 12 kHz PCM16 WAV ([[graft.multimodal.Multimodal.encodeWavPcm16]]),
    * the resampler decimates to 8 kHz by exact rational nearest-pick
    * (output frame j ← source frame ⌊3j/2⌋, n_out = ⌊2·n_in/3⌋) and
    * re-encodes a valid WAV, which
    * [[graft.multimodal.Multimodal.decodeWav]] then parses back — so the
    * query only passes if the resampled container is well-formed AND the
    * picked samples are exactly right: the oracle recomputes the signed
    * sum of every ⌊3j/2⌋-th 16-bit LE sample straight from the raw text.
    */
  private def qAudioResample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        lit(12000).as("rate"))
    val wav = Multimodal.encodeWavPcm16(d, "doc_id", "bytes", "rate")
    val res = Multimodal.resampleWav(wav, "doc_id", "payload", dstRate = 8000)
    Multimodal.decodeWav(res, "doc_id", "resampled")
      .select(col("doc_id"), col("sample_rate"), col("n_frames"), col("sum_ch0"))
      .orderBy(col("doc_id"))
  }

  /** Nonlinear image features ([[graft.multimodal.Multimodal.ppmLumaStats]]):
    * integer ITU-R 601 luma per pixel over the same synthesized 4×h P6
    * containers as q_decode — Σ/max/bright-count are NOT derivable from
    * the channel sums, so this exercises the per-pixel path end to end.
    * The oracle rebuilds every pixel's luma from the raw text bytes by
    * hex arithmetic, independent of the codec.
    */
  private def qImageLuma(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .withColumn("h", floor(octet_length(col("bytes")) / 12).cast("int"))
      .select(col("doc_id"),
        concat(
          concat(lit("P6\n4 "), col("h").cast("string"), lit("\n255\n")).cast("binary"),
          col("bytes").substr(lit(1), col("h") * 12)).as("payload"))
    Multimodal.ppmLumaStats(d, "doc_id", "payload")
      .select(col("doc_id"), col("n_pixels"), col("sum_luma_milli"),
        col("max_luma_milli"), col("n_bright"))
      .orderBy(col("doc_id"))
  }

  /** Nonlinear audio features ([[graft.multimodal.Multimodal.wavLoudness]]):
    * channel-0 energy, peak, and silence count over the same
    * round-tripped WAV containers as q_wav — none derivable from the
    * linear sample sums. The oracle reassembles each signed 16-bit
    * sample from the raw text bytes and folds the same three statistics.
    */
  private def qAudioLoudness(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        (lit(8000) + (col("doc_id") % 3).cast("int") * lit(4000)).as("rate"))
    val wav = Multimodal.encodeWavPcm16(d, "doc_id", "bytes", "rate")
    Multimodal.wavLoudness(wav, "doc_id", "payload", silenceThreshold = 1000)
      .select(col("doc_id"), col("n_frames"), col("sum_sq_ch0"),
        col("peak_abs_ch0"), col("n_silent"))
      .orderBy(col("doc_id"))
  }

  /** This family's slice of [[graft.SparkEntry.queries]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_luma" -> (qImageLuma _),
    "q_audio_loudness" -> (qAudioLoudness _),
    "q_binary_meta" -> (qBinaryMeta _),
    "q_decode" -> (qDecode _),
    "q_wav" -> (qWav _),
    "q_resize" -> (qResize _),
    "q_frame_sample" -> (qFrameSample _),
    "q_scene_cuts" -> (qSceneCuts _),
    "q_audio_resample" -> (qAudioResample _),
  )

  /** This family's slice of [[graft.SparkEntry.oracleSql]]. */
  def oracleSql: Map[String, String] = Map(
    "q_image_luma" ->
      // per-pixel luma rebuilt from the raw bytes: pixel i's channels
      // are bytes 3i..3i+2; empty images fold sum 0 / null max / 0 bright
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS h
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, h, list_transform(range(0, 4*h), i ->
        |      299 * CAST(('0x' || substr(hx, 2*(3*i)+1, 2)) AS BIGINT)
        |    + 587 * CAST(('0x' || substr(hx, 2*(3*i+1)+1, 2)) AS BIGINT)
        |    + 114 * CAST(('0x' || substr(hx, 2*(3*i+2)+1, 2)) AS BIGINT)) AS ls
        |  FROM b)
        |SELECT doc_id, CAST(4 * h AS BIGINT) AS n_pixels,
        |  coalesce(CAST(list_sum(ls) AS BIGINT), 0) AS sum_luma_milli,
        |  CAST(list_max(ls) AS BIGINT) AS max_luma_milli,
        |  CAST(len(list_filter(ls, x -> x >= 128000)) AS BIGINT) AS n_bright
        |FROM l ORDER BY doc_id""".stripMargin,
    "q_audio_loudness" ->
      // signed 16-bit reassembly as in q_wav, folded nonlinearly:
      // energy x², peak |x|, silent |x| < 1000
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS nf
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, nf, list_transform(range(0, nf), i ->
        |    CAST(('0x' || substr(hx, 4*i+3, 2) || substr(hx, 4*i+1, 2)) AS BIGINT)
        |    - CASE WHEN CAST(('0x' || substr(hx, 4*i+3, 2)) AS BIGINT) >= 128
        |           THEN 65536 ELSE 0 END) AS ss
        |  FROM b)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  coalesce(CAST(list_sum(list_transform(ss, x -> x * x)) AS BIGINT), 0) AS sum_sq_ch0,
        |  CAST(list_max(list_transform(ss, x -> abs(x))) AS INTEGER) AS peak_abs_ch0,
        |  CAST(len(list_filter(ss, x -> abs(x) < 1000)) AS BIGINT) AS n_silent
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha,
        |  'unknown' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scene_cuts" ->
      // Frame i's milli-luma recomputed straight from the raw text bytes
      // (channel mapping per the q_frame_sample note: R ≡ 0, G ≡ 1,
      // B ≡ 2 mod 3 within the 12-byte frame), then the exact lag window
      // and the integer cross-multiplied 25% threshold (w·h = 4).
      // n_cuts MUST stay CAST AS BIGINT: SUM(int) is HUGEINT in DuckDB
      // and an int128 final column is driver-red (the r12 red row's whole
      // cause — see q_fertility's docstring for the registry-wide scan).
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, hx, unnest(range(0, nf)) AS i FROM b WHERE nf > 0),
        |lm AS (
        |  SELECT doc_id, i,
        |    299 * list_sum(list_transform(range(0, 12, 3), j ->
        |      CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))
        |    + 587 * list_sum(list_transform(range(1, 12, 3), j ->
        |      CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))
        |    + 114 * list_sum(list_transform(range(2, 12, 3), j ->
        |      CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT))) AS l
        |  FROM fr),
        |lg AS (
        |  SELECT doc_id, i, l,
        |    lag(l) OVER (PARTITION BY doc_id ORDER BY i) AS pl
        |  FROM lm),
        |fl AS (
        |  SELECT doc_id, i,
        |    pl IS NOT NULL AND abs(l - pl) * 1000000
        |      > CAST(250000 AS BIGINT) * 255 * 4 * 1000 AS cut
        |  FROM lg)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |  CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        |  CAST(MIN(CASE WHEN cut THEN i END) AS BIGINT) AS first_cut_idx
        |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      // The oracle recomputes what the AVI demuxer must report straight
      // from the raw text bytes: nf = ⌊bytes/12⌋ full 2×2 RGB24 frames,
      // sampled at stride 2. The writer converts RGB→BGR, so DIB channel
      // B = source byte ≡ 2 (mod 3) within the frame (G ≡ 1, R ≡ 0), and
      // the image-top-left blue of frame i is source byte 12·i+2 (top
      // source row lands in the LAST bottom-up DIB row — independent
      // index arithmetic, not a replay of the codec). Docs shorter than
      // one frame produce a valid 0-frame AVI → no sampled rows → no
      // group on either side.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, hx, unnest(range(0, nf, 2)) AS i FROM b WHERE nf > 0)
        |SELECT doc_id, COUNT(*) AS n_sampled,
        |  CAST(SUM(list_sum(list_transform(range(2, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_b,
        |  CAST(SUM(list_sum(list_transform(range(1, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_g,
        |  CAST(SUM(list_sum(list_transform(range(0, 12, 3), j ->
        |    CAST(('0x' || substr(hx, 2*(12*i+j)+1, 2)) AS BIGINT)))) AS BIGINT) AS sum_r,
        |  CAST(SUM(CAST(('0x' || substr(hx, 2*(12*i+2)+1, 2)) AS BIGINT)) AS BIGINT) AS top_b
        |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_decode" ->
      // The oracle rebuilds what the PPM decoder must report, straight
      // from the raw text bytes: h = ⌊bytes/12⌋ rows of 4 RGB pixels;
      // channel c's sum = bytes at data positions ≡ c (mod 3), extracted
      // via hex-substr. coalesce: DuckDB list_sum([]) is NULL, the
      // decoder's empty-image fold is 0.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS h
        |  FROM documents)
        |SELECT doc_id, 4 AS width, CAST(h AS INTEGER) AS height,
        |  255 AS maxval, CAST(4 * h AS BIGINT) AS n_pixels,
        |  coalesce(CAST(list_sum(list_transform(range(0, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_r,
        |  coalesce(CAST(list_sum(list_transform(range(1, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_g,
        |  coalesce(CAST(list_sum(list_transform(range(2, 12*h, 3),
        |    i -> CAST(('0x' || substr(hx, 2*i+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_resize" ->
      // The resized 2×h image keeps source pixels at even columns:
      // out(x,y) = src(2x, y), so channel c of out pixel i (row-major,
      // i = 2y+x) is source byte (4*(i//2) + 2*(i%2))*3 + c — recomputed
      // here by hex-substr straight from the raw text, independent of
      // both the resizer and the decoder.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 12 AS h
        |  FROM documents)
        |SELECT doc_id, 2 AS width, CAST(h AS INTEGER) AS height,
        |  CAST(2 * h AS BIGINT) AS n_pixels,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 0)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_r,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 1)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_g,
        |  coalesce(CAST(list_sum(list_transform(range(0, 2*h), i ->
        |    CAST(('0x' || substr(hx, 2*((4*(i//2) + 2*(i%2))*3 + 2)+1, 2)) AS BIGINT))) AS BIGINT), 0) AS sum_b
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_wav" ->
      // The oracle reassembles what the WAV decoder must report straight
      // from the raw text bytes: mono 16-bit LE PCM, so frame i's sample
      // is byte(2i) | byte(2i+1)<<8, sign-extended — built here by hex
      // substring concatenation (high byte first makes the '0x' literal),
      // minus 65536 when the 16-bit pattern is negative. The rate mirrors
      // the per-row synthesis arithmetic.
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS nf
        |  FROM documents)
        |SELECT doc_id, 1 AS n_channels,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |  16 AS bits, CAST(nf AS BIGINT) AS n_frames,
        |  coalesce(CAST(list_sum(list_transform(range(0, nf), i ->
        |    CAST(('0x' || substr(hx, 4*i+3, 2) || substr(hx, 4*i+1, 2)) AS BIGINT)
        |    - CASE WHEN CAST(('0x' || substr(hx, 4*i+3, 2)) AS BIGINT) >= 128
        |           THEN 65536 ELSE 0 END)) AS BIGINT), 0) AS sum_ch0
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_audio_resample" ->
      // The oracle recomputes the resampled stream straight from the raw
      // text bytes: n_in = ⌊bytes/2⌋ mono 16-bit LE frames at 12 kHz,
      // n_out = 2·n_in//3 at 8 kHz, output frame j picks source frame
      // 3·j//2 — signed 16-bit reassembly by hex substring (high byte
      // first), minus 65536 when negative, summed over the PICKED frames
      // only. A 0-frame input still round-trips a valid container → a
      // 0/0 row on both sides (list_sum([]) is NULL → coalesce).
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) // 2 AS nin
        |  FROM documents)
        |SELECT doc_id, 8000 AS sample_rate,
        |  CAST(nin * 2 // 3 AS BIGINT) AS n_frames,
        |  coalesce(CAST(list_sum(list_transform(range(0, nin * 2 // 3), j ->
        |    CAST(('0x' || substr(hx, 4*(3*j//2)+3, 2) || substr(hx, 4*(3*j//2)+1, 2)) AS BIGINT)
        |    - CASE WHEN CAST(('0x' || substr(hx, 4*(3*j//2)+3, 2)) AS BIGINT) >= 128
        |           THEN 65536 ELSE 0 END)) AS BIGINT), 0) AS sum_ch0
        |FROM b ORDER BY doc_id""".stripMargin,
  )
}
