package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Real pipelines carry images/audio/video as parquet `binary` columns and
  * decode inside executor batches. All three modalities have REAL pure-JVM
  * codecs here: [[decodePpm]]/[[resizePpmNearest]] for the binary PPM (P6)
  * image container — full header grammar, data-offset arithmetic,
  * per-channel pixel statistics, nearest-neighbor resize;
  * [[decodeWav]]/[[encodeWavPcm16]]/[[resampleWav]] for RIFF/WAVE audio —
  * chunk walker, container writer, exact rational nearest-sample
  * resampling (PCM 16-bit, mono/stereo, exact signed-sample sums); and
  * [[sampleAviFrames]]/[[encodeAviRgb24]] for RIFF/AVI uncompressed-RGB24
  * video — list/chunk demuxer over the DIB frame convention (bottom-up
  * rows, BGR samples, 4-byte row padding). Codecs that genuinely need
  * native libraries (JPEG entropy decode, H.264, windowed-sinc kernels)
  * slot into the same per-row loops behind the same contracts — schema,
  * batch-iterator shape, partition-local execution, typed output encoder —
  * without changing anything else.
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

  /** Output schema of the luma extractor. */
  val lumaSchema: StructType = StructType.fromDDL(
    "n_pixels bigint, sum_luma_milli bigint, max_luma_milli bigint, n_bright bigint")

  /** Per-image luma statistics over PPM/P6 payloads — the first REAL
    * nonlinear feature extractor on the image path (the channel sums in
    * [[decodePpm]] are linear, so brightness filtering/near-black
    * detection can't be derived from them). Per pixel the integer ITU-R
    * 601 luma in milli-units,
    *
    *   L = 299·R + 587·G + 114·B   (0 .. 255000),
    *
    * is folded into (Σ L, max L, #pixels with L ≥ threshold) — exact
    * integers, independently recomputable byte-by-byte by an oracle.
    * The shape a real exposure/quality gate extends (histograms, CLIP
    * pre-filters slot into the same per-pixel loop). Zero-pixel images
    * report sum 0, null max, 0 bright; malformed/null payloads a
    * null-metric row (the crawl-failure contract).
    *
    * Same executor shape as [[decodePpm]]: `mapPartitions`, payload
    * bytes never shuffle.
    */
  def ppmLumaStats(df: DataFrame, idCol: String, payloadCol: String,
                   brightThresholdMilli: Long = 128000L): DataFrame = {
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ lumaSchema.fields)
    val nulls = Seq(null, null, null, null)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights)
      rows.map { r =>
        val p = r.getAs[Array[Byte]](inIdx)
        parsePpmHeader(p) match {
          case Some((w, h, _, off)) if pixelBytesFit(w, h) &&
              p.length >= off + 3L * w * h =>
            val nPix = w.toLong * h
            var sum = 0L; var mx = -1L; var bright = 0L
            var i = 0L
            while (i < nPix) {
              val base = off + 3 * i.toInt
              val l = 299L * (p(base) & 0xFF) + 587L * (p(base + 1) & 0xFF) +
                114L * (p(base + 2) & 0xFF)
              sum += l
              if (l > mx) mx = l
              if (l >= brightThresholdMilli) bright += 1
              i += 1
            }
            Row.fromSeq(Seq(r.get(idIdx), nPix, sum,
              if (nPix == 0) null else mx, bright))
          case _ => Row.fromSeq(r.get(idIdx) +: nulls)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Output schema of the loudness extractor. */
  val loudnessSchema: StructType = StructType.fromDDL(
    "n_frames bigint, sum_sq_ch0 bigint, peak_abs_ch0 int, n_silent bigint")

  /** Per-clip loudness statistics over WAV payloads — the nonlinear
    * audio features ([[decodeWav]]'s signed sums are linear, so energy
    * and silence can't be derived from them): channel-0 energy Σ s²,
    * peak |s|, and the silent-frame count |s| < threshold — the inputs
    * to RMS loudness and threshold VAD, as exact integers an oracle
    * recomputes byte-by-byte. Zero-frame clips report energy 0, null
    * peak, 0 silent; malformed/non-PCM/null payloads a null-metric row.
    *
    * Same executor shape as the codecs: `mapPartitions`, payload bytes
    * never shuffle.
    */
  def wavLoudness(df: DataFrame, idCol: String, payloadCol: String,
                  silenceThreshold: Int = 1000): DataFrame = {
    require(silenceThreshold >= 0, s"threshold must be >= 0: $silenceThreshold")
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ loudnessSchema.fields)
    val nulls = Seq(null, null, null, null)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights)
      rows.map { r =>
        val p = r.getAs[Array[Byte]](inIdx)
        wavPcm16Info(p) match {
          case Some((ch, _, off, nFrames)) =>
            def u16(i: Int) = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
            val blockAlign = 2 * ch
            var sq = 0L; var peak = -1L; var silent = 0L
            var f = 0L
            while (f < nFrames) {
              val s = u16(off + (f * blockAlign).toInt).toShort.toLong
              sq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              if (a < silenceThreshold) silent += 1
              f += 1
            }
            Row.fromSeq(Seq(r.get(idIdx), nFrames, sq,
              if (nFrames == 0) null else peak.toInt, silent))
          case None => Row.fromSeq(r.get(idIdx) +: nulls)
        }
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
    * logic, factored out for direct property testing). Trailing bytes
    * that are not a whole frame (`2·channels` bytes) are dropped.
    */
  private[multimodal] def buildWavPcm16(raw: Array[Byte], rate: Int,
                                        channels: Int = 1): Array[Byte] = {
    val blockAlign = 2 * channels
    val dataLen = raw.length - raw.length % blockAlign // whole frames only
    "RIFF".getBytes("US-ASCII") ++ leU32(36L + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ leU32(16L) ++
      leU16(1) ++ leU16(channels) ++ leU32(rate.toLong) ++
      leU32(rate.toLong * blockAlign) ++ leU16(blockAlign) ++ leU16(16) ++
      "data".getBytes("US-ASCII") ++ leU32(dataLen.toLong) ++
      raw.take(dataLen)
  }

  /** Locate the PCM16 stream of a RIFF/WAVE container — the acceptance
    * set of [[decodeWav]]: format 1 (PCM), 16-bit samples, 1 or 2
    * channels, `fmt ` before `data` (per spec order), sample data fully
    * present. Returns (channels, rate, dataOffset, frameCount); None on
    * any malformation.
    */
  private[multimodal] def wavPcm16Info(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (p == null || p.length < 12) return None
    def u16(i: Int) = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def u32(i: Int) = (p(i) & 0xFF).toLong | ((p(i + 1) & 0xFF).toLong << 8) |
      ((p(i + 2) & 0xFF).toLong << 16) | ((p(i + 3) & 0xFF).toLong << 24)
    def tag(i: Int, s: String) =
      p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // walk the chunk list; fmt must precede data (per spec order)
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var result: Option[(Int, Int, Int, Long)] = None
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
            result = Some((ch, rate, off, size / (2 * ch)))
          case _ => // non-PCM, exotic width, or truncated data → None
        }
      }
      i = off + size.toInt + (size.toInt & 1) // chunks pad to even
      if (size > Int.MaxValue - 8 || i < off) done = true // overflow guard
    }
    result
  }

  /** Pure WAV parse (the whole of [[decodeWav]]'s per-row logic, factored
    * out for direct property testing): returns the 6 metric values in
    * [[wavSchema]] order, all null on any malformation.
    */
  private[multimodal] def parseWav(p: Array[Byte]): Seq[Any] =
    wavPcm16Info(p) match {
      case Some((ch, rate, off, nFrames)) =>
        def u16(i: Int) = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
        val blockAlign = 2 * ch
        var s0 = 0L; var s1 = 0L
        var f = 0L
        while (f < nFrames) {
          val base = off + (f * blockAlign).toInt
          s0 += u16(base).toShort // sign-extend via Short
          if (ch == 2) s1 += u16(base + 2).toShort
          f += 1
        }
        Seq(ch, rate, 16, nFrames, s0, if (ch == 2) s1 else null)
      case None => Seq(null, null, null, null, null, null)
    }

  // ----------------------------------------------------------- AVI video

  /** Output schema of the AVI frame sampler. */
  val aviFrameSchema: StructType = StructType.fromDDL(
    "frame_idx int, width int, height int, sum_b bigint, sum_g bigint, sum_r bigint, top_left_b int")

  /** DIB rows pad to 4-byte boundaries. */
  private def dibStride(w: Int): Int = (w * 3 + 3) & ~3

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Pure AVI container build (the whole of [[encodeAviRgb24]]'s per-row
    * logic, factored out for direct property testing): wrap packed
    * top-down RGB24 frames (3·w·h bytes each; a trailing partial frame is
    * dropped) in a genuine RIFF/AVI container — a `hdrl` list (`avih`
    * main header, `vids`/`DIB ` stream header, BITMAPINFOHEADER) and a
    * `movi` list of uncompressed `00db` frames in the DIB convention:
    * rows bottom-up, samples BGR, rows padded to 4-byte boundaries.
    * Null on null input, non-positive dims/fps, or an output too large
    * for a JVM array.
    */
  private[multimodal] def buildAviRgb24(rgb: Array[Byte], w: Int, h: Int,
                                        fps: Int = 25): Array[Byte] = {
    if (rgb == null || w <= 0 || h <= 0 || fps <= 0) return null
    if (3L * w * h > Int.MaxValue - 64L) return null
    val srcFrame = 3 * w * h
    val nFrames = rgb.length / srcFrame
    val stride = dibStride(w)
    val dib = stride.toLong * h
    if (dib > Int.MaxValue - 64L) return null
    val moviData = nFrames * (8L + dib) // stride·h is 4-aligned: no pad byte
    val total = 12L + 200 + 12 + moviData
    if (total > Int.MaxValue - 64L) return null
    val out = new java.io.ByteArrayOutputStream(total.toInt)
    def u16(v: Int): Unit = out.write(leU16(v), 0, 2)
    def u32(v: Long): Unit = out.write(leU32(v), 0, 4)
    def tag4(s: String): Unit = out.write(fcc(s), 0, 4)
    tag4("RIFF"); u32(total - 8); tag4("AVI ")
    tag4("LIST"); u32(192); tag4("hdrl") // 4 + avih(64) + strl(124)
    tag4("avih"); u32(56)
    u32(1000000L / fps); u32(0); u32(0); u32(0)      // usPerFrame, maxBps, padGranularity, flags
    u32(nFrames); u32(0); u32(1); u32(dib)           // totalFrames, initialFrames, streams, sugBuf
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)   // width, height, reserved[4]
    tag4("LIST"); u32(116); tag4("strl") // 4 + strh(64) + strf(48)
    tag4("strh"); u32(56)
    tag4("vids"); tag4("DIB "); u32(0); u16(0); u16(0) // flags, priority, language
    u32(0); u32(1); u32(fps); u32(0); u32(nFrames)     // initialFrames, scale, rate, start, length
    u32(dib); u32(0); u32(0)                           // sugBuf, quality, sampleSize
    u16(0); u16(0); u16(w); u16(h)                     // rcFrame
    tag4("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24)           // biSize, width, height (+ = bottom-up), planes, bitCount
    u32(0); u32(dib); u32(0); u32(0); u32(0); u32(0)   // BI_RGB, sizeImage, pelsPerMeter×2, clr×2
    tag4("LIST"); u32(4 + moviData); tag4("movi")
    val frame = new Array[Byte](dib.toInt) // pad bytes stay zeroed across reuse
    var f = 0
    while (f < nFrames) {
      tag4("00db"); u32(dib)
      val sB = f * srcFrame
      var y = 0
      while (y < h) {
        val dRow = (h - 1 - y) * stride // top source row → bottom DIB row
        var x = 0
        while (x < w) {
          val sPx = sB + (y * w + x) * 3
          val d = dRow + 3 * x
          frame(d) = rgb(sPx + 2) // RGB → BGR
          frame(d + 1) = rgb(sPx + 1)
          frame(d + 2) = rgb(sPx)
          x += 1
        }
        y += 1
      }
      out.write(frame, 0, frame.length)
      f += 1
    }
    out.toByteArray
  }

  /** Parse a RIFF/AVI container holding a single uncompressed-RGB24 video
    * stream: validates `avih` dims, a `vids` stream header, a 24-bit
    * BI_RGB BITMAPINFOHEADER, walks `movi` (including nested `rec `
    * interleave lists), and requires every `00db`/`00dc` frame chunk to
    * be exactly stride·h bytes with the chunk count matching the declared
    * total. Returns (width, height, frame data offsets); None on any
    * malformation.
    */
  private[multimodal] def parseAvi(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p == null || p.length < 12) return None
    def u16(i: Int) = (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
    def u32(i: Int) = (p(i) & 0xFF).toLong | ((p(i + 1) & 0xFF).toLong << 8) |
      ((p(i + 2) & 0xFF).toLong << 16) | ((p(i + 3) & 0xFF).toLong << 24)
    def tag(i: Int, s: String) =
      p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return None
    // honor the RIFF size field: trailing bytes beyond it are not chunks
    val riffEnd = math.min(p.length.toLong, 8L + u32(4)).toInt
    var w = -1; var h = -1; var totalDeclared = -1L
    var fmtOk = false; var vids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, size)
    // walk a chunk run [from, until); LIST chunks recurse with their type
    // as the context — false = structural malformation (truncation/overflow)
    def walk(from: Int, until: Int, ctx: String): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val size = u32(i + 4)
        val off = i + 8
        if (size > Int.MaxValue - 8L || off + size > until) return false
        val end = off + size.toInt
        if (tag(i, "LIST") && size >= 4) {
          if (!walk(off + 4, end, new String(p, off, 4, "US-ASCII"))) return false
        } else ctx match {
          case "hdrl" if tag(i, "avih") && size >= 56 =>
            totalDeclared = u32(off + 16)
            if (u32(off + 32) > Int.MaxValue || u32(off + 36) > Int.MaxValue) return false
            w = u32(off + 32).toInt; h = u32(off + 36).toInt
          case "strl" if tag(i, "strh") && size >= 8 =>
            vids = vids || tag(off, "vids")
          case "strl" if tag(i, "strf") && size >= 40 =>
            fmtOk = fmtOk || (u16(off + 14) == 24 && u32(off + 16) == 0L)
          case "movi" | "rec " if tag(i, "00db") || tag(i, "00dc") =>
            frames += ((off, size.toInt))
          case _ => // unknown chunk (idx1, JUNK, vendor): skip
        }
        i = end + (size.toInt & 1) // chunks pad to even
      }
      true
    }
    if (riffEnd < 12 || !walk(12, riffEnd, "riff")) return None
    val ok = w > 0 && h > 0 && vids && fmtOk &&
      3L * w * h <= Int.MaxValue - 64L &&
      totalDeclared == frames.length &&
      frames.forall(_._2.toLong == dibStride(w).toLong * h)
    if (ok) Some((w, h, frames.map(_._1).toArray)) else None
  }

  /** Wrap packed top-down RGB24 frame bytes in a genuine AVI container
    * ([[buildAviRgb24]] per row). Null payloads pass through as null
    * containers (same contract as [[encodeWavPcm16]]).
    */
  def encodeAviRgb24(df: DataFrame, idCol: String, rgbCol: String,
                     width: Int, height: Int, fps: Int = 25): DataFrame = {
    require(width > 0 && height > 0 && fps > 0, "dims and fps must be positive")
    val inIdx = df.schema.fieldIndex(rgbCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol), StructField("payload", BinaryType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(Seq(r.get(idIdx),
          buildAviRgb24(r.getAs[Array[Byte]](inIdx), width, height, fps)))
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video frame sampling for the RIFF/AVI uncompressed-RGB24
    * container — a complete pure-JVM demuxer ([[parseAvi]]: list/chunk
    * walk, header validation, `movi` frame chunks incl. `rec ` interleave
    * lists, odd-size chunk padding) over the DIB frame convention
    * (bottom-up rows, BGR samples, rows padded to 4 bytes). Emits one row
    * per sampled frame (every `stride`-th, frame 0 always) with exact
    * per-channel sums — row-pad bytes excluded — plus the image-top-left
    * blue sample, which pins the bottom-up row order to something an
    * oracle recomputes independently. Null or malformed payloads
    * contribute no rows (explode shape; a crawl fetch failure must not
    * kill the job). A real compressed demux (H.264 via JNI) slots into
    * the same per-frame loop; the container walk, explode shape, and
    * partition-local execution don't change. Frame bytes never shuffle.
    */
  def sampleAviFrames(df: DataFrame, idCol: String, payloadCol: String,
                      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ aviFrameSchema.fields)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights)
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]](inIdx)
        parseAvi(p) match {
          case Some((w, h, offs)) =>
            val rowBytes = dibStride(w)
            Iterator.range(0, offs.length, stride).map { fi =>
              val off = offs(fi)
              var sb = 0L; var sg = 0L; var sr = 0L
              var y = 0
              while (y < h) {
                val base = off + y * rowBytes
                var x = 0
                while (x < w) {
                  sb += p(base + 3 * x) & 0xFF
                  sg += p(base + 3 * x + 1) & 0xFF
                  sr += p(base + 3 * x + 2) & 0xFF
                  x += 1
                }
                y += 1
              }
              // image top-left = LAST buffer row, first sample (bottom-up)
              Row.fromSeq(Seq(r.get(idIdx), fi, w, h, sb, sg, sr,
                p(off + (h - 1) * rowBytes) & 0xFF))
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio resampling over genuine WAV containers: decode the PCM16
    * stream ([[wavPcm16Info]] — the same acceptance set as [[decodeWav]]),
    * resample to `dstRate` by exact rational nearest-sample pick
    * (`src = ⌊j·srcRate/dstRate⌋`, all integer arithmetic — downsampling
    * decimates, upsampling holds; `n_out = ⌊n_in·dstRate/srcRate⌋`), and
    * re-encode a VALID WAV container at the target rate with the channel
    * count preserved, so the result feeds any downstream WAV consumer —
    * including [[decodeWav]], which is how the oracle query proves the
    * container survives the round trip. A real windowed-sinc kernel
    * (polyphase FIR, libsamplerate-class) slots into the same per-frame
    * loop; the container walk, index arithmetic shape, and partition-local
    * batch shape don't change. Null or malformed payloads yield a null
    * payload row (fetch-failure contract); payload bytes never shuffle.
    */
  def resampleWav(df: DataFrame, idCol: String, payloadCol: String,
                  dstRate: Int): DataFrame = {
    require(dstRate > 0, "dstRate must be positive")
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol), StructField("resampled", BinaryType)))
    df.mapPartitions { rows =>
      // <- per-partition init site (resampler state, FIR tables)
      rows.map { r =>
        Row.fromSeq(Seq(r.get(idIdx),
          resampleWavPure(r.getAs[Array[Byte]](inIdx), dstRate)))
      }
    }(Encoders.row(outSchema))
  }

  /** Pure WAV resample (the whole of [[resampleWav]]'s per-row logic,
    * factored out for direct property testing): a valid WAV container at
    * `dstRate`, or null on any malformation.
    */
  private[multimodal] def resampleWavPure(p: Array[Byte], dstRate: Int): Array[Byte] =
    wavPcm16Info(p) match {
      case Some((ch, rate, off, nFrames)) if rate > 0 =>
        val blockAlign = 2 * ch
        val nOut = nFrames * dstRate / rate
        if (nOut * blockAlign > Int.MaxValue - 64L) null
        else {
          val raw = new Array[Byte]((nOut * blockAlign).toInt)
          var j = 0L
          while (j < nOut) {
            val si = j * rate / dstRate // exact rational nearest-pick
            System.arraycopy(p, off + (si * blockAlign).toInt,
              raw, (j * blockAlign).toInt, blockAlign)
            j += 1
          }
          buildWavPcm16(raw, dstRate, ch)
        }
      case _ => null
    }

  /** Scene-cut detection over AVI video — global-luma frame differencing,
    * the classic first-pass shot segmenter (frame t is a CUT when the
    * mean ITU-601 luma jumps by more than `thresholdMicros` of full
    * scale vs frame t−1). Composed ENTIRELY in the engine: the byte
    * codec runs once per payload ([[sampleAviFrames]] at stride 1 — the
    * only `mapPartitions`), and the detector is a lag window + integer
    * cross-multiplication over the frame-stats stream:
    *
    *   |L_t − L_{t−1}| · 10⁶  >  θ_micros · 255 · w · h · 1000
    *
    * with L = 299·ΣR + 587·ΣG + 114·ΣB (milli-luma, exact integers) —
    * no float thresholds anywhere. Per video:
    * `(id, n_frames, n_cuts, first_cut_idx)` — all BIGINT
    * (first_cut_idx null when no cut fires).
    *
    * Scale shape: payload bytes never shuffle (the demux emits 8-column
    * stats rows); one id-keyed window + one aggregation over the
    * frame-stats stream — frames-per-video bounded, the q_rolling
    * contract. A learned shot detector slots into the same shape with
    * the luma proxy swapped for its per-frame embedding.
    */
  def aviSceneCuts(df: DataFrame, idCol: String, payloadCol: String,
                   thresholdMicros: Long): DataFrame = {
    require(thresholdMicros > 0L, s"thresholdMicros must be positive: $thresholdMicros")
    val fr = sampleAviFrames(df, idCol, payloadCol, stride = 1)
    val luma = lit(299L) * col("sum_r") + lit(587L) * col("sum_g") +
      lit(114L) * col("sum_b")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__i"))
    fr.select(col(idCol), col("frame_idx").cast("long").as("__i"),
        col("width"), col("height"), luma.as("__l"))
      .withColumn("__pl", lag(col("__l"), 1).over(w))
      .withColumn("__cut", col("__pl").isNotNull &&
        abs(col("__l") - col("__pl")) * lit(1000000L) >
          lit(thresholdMicros) * lit(255L) *
            col("width").cast("long") * col("height").cast("long") * lit(1000L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__cut"), 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("__cut"), col("__i"))).as("first_cut_idx"))
  }
}
