package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Real pipelines carry images/audio/video as parquet `binary` columns and
  * decode inside executor batches. [[decodePpm]] is a REAL pure-JVM
  * decoder for the binary PPM (P6) container — full header grammar,
  * data-offset arithmetic, per-channel pixel statistics — and
  * [[decodeWav]]/[[encodeWavPcm16]] are a REAL RIFF/WAVE chunk walker and
  * container writer (PCM 16-bit, mono/stereo, exact signed-sample sums).
  * Codecs that need native libraries (JPEG, ffmpeg demux, sinc resampling)
  * are represented by honestly-named byte-level stand-ins
  * ([[sampleFramesStub]], [[resampleAudioStub]]) whose Spark-side contract
  * — schema,
  * batch-iterator shape, partition-local execution, typed output encoder —
  * is the part the engine guarantees; swap the body for an actual codec
  * call (e.g. via JNI or an Arrow-backed worker) and nothing else changes.
  *
  * Scale notes: payload bytes never shuffle here — metadata extraction and
  * decode are narrow partition-local maps; keep it that way (repartition on
  * ids BEFORE attaching payloads if co-location is needed).
  */
object Multimodal {

  /** Metadata columns for a binary payload: size, content hash (storage
    * key / dedup key), magic-byte sniff of the format.
    */
  def withBinaryMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("sha", sha2(col(payloadCol), 256))
      .withColumn("format",
        when(col(payloadCol).startsWith(lit(Array[Byte](0x89.toByte, 'P', 'N', 'G'))), "png")
          .when(col(payloadCol).startsWith(lit(Array[Byte](0xFF.toByte, 0xD8.toByte))), "jpeg")
          .otherwise("unknown"))

  /** Output schema of the PPM decoder. */
  val ppmSchema: StructType = StructType.fromDDL(
    "width int, height int, maxval int, n_pixels bigint, sum_r bigint, sum_g bigint, sum_b bigint")

  /** A (w, h) pixel grid whose RGB bytes fit a JVM byte array. Guards the
    * `3L * w * h` arithmetic below: with both dims near Int.MaxValue the
    * product overflows even a Long and a crafted header would slip past
    * the truncation check with garbage stats instead of a null row.
    */
  private def pixelBytesFit(w: Int, h: Int): Boolean =
    w.toLong * h <= (Int.MaxValue - 64L) / 3

  /** Parse a binary-PPM (P6) header: magic, then width/height/maxval as
    * ASCII decimals separated by whitespace, with `#`-to-end-of-line
    * comments allowed anywhere whitespace is, then EXACTLY ONE whitespace
    * byte before the raw RGB data (the byte after the maxval digits —
    * per the netpbm spec, so pixel data may begin with what looks like
    * whitespace). Returns (width, height, maxval, dataOffset); None on
    * any malformation. Only 1-byte samples (maxval < 256) are accepted.
    */
  private[multimodal] def parsePpmHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p == null || p.length < 2 || p(0) != 'P' || p(1) != '6') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < p.length) {
        if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (isWs(p(i))) i += 1
        else go = false
      }
    }
    def readInt(): Int = { // -1 = no digits at the cursor
      skipWsAndComments()
      var v = -1L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (p(i) - '0'); i += 1
        if (v > Int.MaxValue) return -1
      }
      v.toInt
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    if (w < 0 || h < 0 || mv <= 0 || mv > 255 || i >= p.length || !isWs(p(i))) None
    else Some((w, h, mv, i + 1)) // consume the single post-maxval whitespace
  }

  /** REAL image decode for the PPM/P6 container — a complete pure-JVM
    * parser (header grammar incl. comments, data offset, sample reads),
    * no native codec needed. Emits dimensions plus per-channel unsigned
    * byte sums: the value-exact statistics an oracle can recompute
    * independently, and the shape a real feature extractor would extend.
    * Truncated pixel data, bad magic, oversized maxval, or a null
    * payload (crawl fetch failures) emit a null-metric row instead of
    * failing the job.
    *
    * Shape matters: `mapPartitions` receives an iterator per partition
    * (the JVM analog of a pandas-batch UDF) — amortize codec/model init
    * across the batch at the top of the closure, then map lazily.
    * Payload bytes never shuffle; the decode is a narrow map.
    */
  def decodePpm(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ ppmSchema.fields)
    val nulls = Seq(null, null, null, null, null, null, null)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights)
      rows.map { r =>
        val p = r.getAs[Array[Byte]](inIdx)
        parsePpmHeader(p) match {
          case Some((w, h, mv, off)) if pixelBytesFit(w, h) &&
              p.length >= off + 3L * w * h =>
            val n = 3 * w * h
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < n) {
              val v = (p(off + i) & 0xFF).toLong
              (i % 3: @annotation.switch) match {
                case 0 => sr += v
                case 1 => sg += v
                case _ => sb += v
              }
              i += 1
            }
            Row.fromSeq(Seq(r.get(idIdx), w, h, mv, w.toLong * h, sr, sg, sb))
          case _ => Row.fromSeq(r.get(idIdx) +: nulls)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Output schema of the WAV decoder. */
  val wavSchema: StructType = StructType.fromDDL(
    "n_channels int, sample_rate int, bits int, n_frames bigint, sum_ch0 bigint, sum_ch1 bigint")

  private def leU16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def leU32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Wrap raw 16-bit little-endian PCM sample bytes in a canonical 44-byte
    * RIFF/WAVE container (PCM format 1, mono, per-row sample rate). An odd
    * trailing byte is not half a sample and is dropped. Writing the
    * container is a real pipeline capability in its own right (audio
    * artifacts are stored as WAV, not bare sample arrays); it is also the
    * inverse [[decodeWav]] is tested against. Null payloads pass through
    * as null containers.
    */
  def encodeWavPcm16(df: DataFrame, idCol: String, bytesCol: String,
                     rateCol: String): DataFrame = {
    val inIdx = df.schema.fieldIndex(bytesCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val rateIdx = df.schema.fieldIndex(rateCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]](inIdx)
        if (r.isNullAt(rateIdx) || raw == null)
          Row.fromSeq(Seq(r.get(idIdx), null))
        else Row.fromSeq(Seq(r.get(idIdx),
          buildWavPcm16(raw, r.getAs[Number](rateIdx).intValue())))
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio decode for the RIFF/WAVE container — a complete pure-JVM
    * chunk walker (RIFF framing, odd-size chunk padding, unknown chunks
    * skipped, `fmt `/`data` extraction), accepting PCM (format 1) with
    * 16-bit samples in 1 or 2 channels. Emits the header facts plus exact
    * per-channel signed-sample sums — independently recomputable by an
    * oracle, and the shape a real feature extractor (loudness, VAD)
    * extends. Malformed framing, truncated sample data, a missing
    * `fmt `/`data` chunk, non-PCM encodings, or a null payload emit a
    * null-metric row instead of failing the job.
    *
    * Same executor shape as [[decodePpm]]: `mapPartitions`, per-partition
    * init site, payload bytes never shuffle.
    */
  def decodeWav(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ wavSchema.fields)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights)
      rows.map { r =>
        Row.fromSeq(r.get(idIdx) +: parseWav(r.getAs[Array[Byte]](inIdx)))
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize for PPM/P6 payloads — nearest-neighbor sampling
    * (`src = floor(dst · srcDim / dstDim)`, the floor convention), pure
    * JVM, emitting a VALID P6 container that [[decodePpm]] (or any
    * netpbm reader) parses back. `outW`/`outH` of 0 preserve that source
    * dimension, so a per-row-sized corpus can be resized along one axis
    * with fixed arguments. Malformed or null payloads yield a null
    * payload row (same crawl-failure contract as the decoders).
    *
    * Same executor shape as the codecs: narrow `mapPartitions`, payload
    * bytes never shuffle. A real bilinear/Lanczos kernel slots into the
    * same per-pixel loop.
    */
  def resizePpmNearest(df: DataFrame, idCol: String, payloadCol: String,
                       outW: Int, outH: Int): DataFrame = {
    require(outW >= 0 && outH >= 0, "target dims must be >= 0 (0 = preserve)")
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("resized", BinaryType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(Seq(r.get(idIdx),
          resizePpmPure(r.getAs[Array[Byte]](inIdx), outW, outH)))
      }
    }(Encoders.row(outSchema))
  }

  /** Pure PPM resize (the whole of [[resizePpmNearest]]'s per-row logic,
    * factored out for direct property testing): a valid P6 byte array of
    * the target dims, or null on any malformation.
    */
  private[multimodal] def resizePpmPure(p: Array[Byte], outW: Int, outH: Int): Array[Byte] =
    parsePpmHeader(p) match {
      case Some((w, h, mv, off)) if pixelBytesFit(w, h) &&
          p.length >= off + 3L * w * h =>
        val dw = if (outW > 0) outW else w
        val dh = if (outH > 0) outH else h
        // a 0-area source has no pixels to sample from — only a
        // 0-area target is representable; and a target too large for
        // a JVM byte array is unrepresentable at any source size
        if (((w == 0 || h == 0) && dw * dh > 0) ||
            3L * dw * dh > Int.MaxValue - 64L) null
        else {
          val header = s"P6\n$dw $dh\n$mv\n".getBytes("US-ASCII")
          val out = new Array[Byte](header.length + 3 * dw * dh)
          System.arraycopy(header, 0, out, 0, header.length)
          var y = 0
          while (y < dh) {
            val sy = (y.toLong * h / dh).toInt
            var x = 0
            while (x < dw) {
              val sx = (x.toLong * w / dw).toInt
              val src = off + (sy * w + sx) * 3
              val dst = header.length + (y * dw + x) * 3
              out(dst) = p(src); out(dst + 1) = p(src + 1); out(dst + 2) = p(src + 2)
              x += 1
            }
            y += 1
          }
          out
        }
      case _ => null
    }

  /** Pure WAV container build (the whole of [[encodeWavPcm16]]'s per-row
    * logic, factored out for direct property testing).
    */
  private[multimodal] def buildWavPcm16(raw: Array[Byte], rate: Int): Array[Byte] = {
    val dataLen = raw.length & ~1 // whole 16-bit samples only
    "RIFF".getBytes("US-ASCII") ++ leU32(36L + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ leU32(16L) ++
      leU16(1) ++ leU16(1) ++ leU32(rate.toLong) ++
      leU32(rate.toLong * 2) ++ leU16(2) ++ leU16(16) ++
      "data".getBytes("US-ASCII") ++ leU32(dataLen.toLong) ++
      raw.take(dataLen)
  }

  /** Pure WAV parse (the whole of [[decodeWav]]'s per-row logic, factored
    * out for direct property testing): returns the 6 metric values in
    * [[wavSchema]] order, all null on any malformation.
    */
  private[multimodal] def parseWav(p: Array[Byte]): Seq[Any] = {
    val nulls = Seq(null, null, null, null, null, null)
    def u16(i: Int) = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def u32(i: Int) = (p(i) & 0xFF).toLong | ((p(i + 1) & 0xFF).toLong << 8) |
      ((p(i + 2) & 0xFF).toLong << 16) | ((p(i + 3) & 0xFF).toLong << 24)
    def tag(i: Int, s: String) =
      p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    var result: Seq[Any] = nulls
    if (p != null && p.length >= 12 && tag(0, "RIFF") && tag(8, "WAVE")) {
      // walk the chunk list; fmt must precede data (per spec order)
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
      var done = false
      while (!done && i + 8 <= p.length) {
        val size = u32(i + 4)
        val off = i + 8
        if (tag(i, "fmt ") && size >= 16 && off + 16 <= p.length)
          fmt = Some((u16(off), u16(off + 2), u32(off + 4).toInt, u16(off + 14)))
        else if (tag(i, "data")) {
          done = true
          fmt match {
            case Some((1, ch, rate, 16)) if (ch == 1 || ch == 2) &&
                off + size <= p.length =>
              val blockAlign = 2 * ch
              val nFrames = size / blockAlign
              var s0 = 0L; var s1 = 0L
              var f = 0L
              while (f < nFrames) {
                val base = off + (f * blockAlign).toInt
                s0 += u16(base).toShort // sign-extend via Short
                if (ch == 2) s1 += u16(base + 2).toShort
                f += 1
              }
              result = Seq(ch, rate, 16, nFrames, s0,
                if (ch == 2) s1 else null)
            case _ => // non-PCM, exotic width, or truncated data → nulls
          }
        }
        i = off + size.toInt + (size.toInt & 1) // chunks pad to even
        if (size > Int.MaxValue - 8 || i < off) done = true // overflow guard
      }
    }
    result
  }

  /** STUB video frame sampling: treat the payload as a frame container and
    * emit every `stride`-th fixed-size chunk as a frame row. A real
    * implementation demuxes with ffmpeg; the explode-shaped output contract
    * (one row per sampled frame, frame index attached) is the real part.
    */
  def sampleFramesStub(df: DataFrame, idCol: String, payloadCol: String,
                       frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++
      StructType.fromDDL("frame_idx int, frame binary").fields)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](inIdx)
        // null payload (fetch failure) → no frames, not an executor NPE
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (chunk, i) => Row.fromSeq(Seq(r.get(idIdx), i, chunk)) }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB audio resampling (the third modality, completing image/video/
    * audio): interpret the payload as mono 16-bit little-endian PCM and
    * decimate/hold to the target rate by nearest-sample pick — a real
    * implementation swaps in a windowed-sinc resampler (libsamplerate/
    * soxr) behind the same contract. The real parts are the partition-
    * local batch shape, the sample-count arithmetic
    * (`n_out = floor(n_in · dstRate / srcRate)`, oracle-verifiable from
    * byte lengths alone), and payloads never shuffling.
    *
    * Null payloads (fetch failures) emit a null-metric row; an odd
    * trailing byte is NOT half a 16-bit sample and is deliberately
    * ignored (`n_in = len / 2`, floor).
    */
  def resampleAudioStub(df: DataFrame, idCol: String, payloadCol: String,
                        srcRate: Int = 44100, dstRate: Int = 16000): DataFrame = {
    require(srcRate > 0 && dstRate > 0, "rates must be positive")
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++
      StructType.fromDDL("n_samples_in bigint, n_samples_out bigint, resampled binary").fields)
    df.mapPartitions { rows =>
      // <- per-partition init site (resampler state) — STUB
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](inIdx)
        if (payload == null) Row.fromSeq(Seq(r.get(idIdx), null, null, null))
        else {
        val nIn = payload.length / 2
        val nOut = (nIn * dstRate.toLong / srcRate).toInt
        val out = new Array[Byte](2 * nOut)
        var j = 0
        while (j < nOut) {
          // nearest-sample hold: src index of output sample j
          val si = (j * srcRate.toLong / dstRate).toInt
          out(2 * j) = payload(2 * si)
          out(2 * j + 1) = payload(2 * si + 1)
          j += 1
        }
        Row.fromSeq(Seq(r.get(idIdx), nIn.toLong, nOut.toLong, out))
        }
      }
    }(Encoders.row(outSchema))
  }
}
