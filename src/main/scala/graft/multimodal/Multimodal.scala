package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Real pipelines carry images/audio/video as parquet `binary` columns and
  * decode inside executor batches. The decode itself needs native codec
  * libraries that are NOT in this environment, so [[decodeImageStub]] is a
  * clearly-marked deterministic STUB — the Spark-side contract around it
  * (schema, batch-iterator shape, partition-local execution, typed output
  * encoder) is real and is what the engine guarantees. Swap the stub body
  * for an actual codec call (e.g. via JNI or an Arrow-backed worker) and
  * nothing else changes.
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

  /** Output schema of the stub decoder. */
  val decodedSchema: StructType = StructType.fromDDL(
    "width int, height int, n_channels int, feature array<float>")

  /** STUB image decode + feature extraction over partition-local batches.
    *
    * ??? REAL DECODE GOES HERE: an actual implementation feeds `payload`
    * to a codec (libjpeg/ffmpeg/...) and a vision encoder. This stub
    * derives deterministic fake dimensions and a 8-dim fake feature vector
    * from the payload bytes so the plumbing is testable end-to-end.
    *
    * Shape matters: `mapPartitions` receives an iterator per partition
    * (the JVM analog of a pandas-batch UDF) — amortize model/codec init
    * across the batch at the top of the closure, then map lazily.
    */
  def decodeImageStub(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val inIdx = df.schema.fieldIndex(payloadCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol)) ++ decodedSchema.fields)
    df.mapPartitions { rows =>
      // <- per-partition init site (codec handles, model weights) — STUB
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](inIdx)
        // Crawl corpora carry null payloads (fetch failures): emit a
        // null-metric row instead of NPE-ing the whole job.
        if (payload == null) Row.fromSeq(Seq(r.get(idIdx), null, null, null, null))
        else {
        // Position-weighted unsigned-byte sum: overflow-free up to ~8 MB
        // payloads, and exactly replicable by the SQL oracle (hex-substr
        // byte extraction), so the mapPartitions plumbing is verifiable
        // end-to-end. A real decoder replaces everything below.
        var h = 0L
        var i = 0
        while (i < payload.length) { h += (payload(i) & 0xFF).toLong * (i + 1); i += 1 }
        val width = 64 + (h % 512).toInt
        val height = 64 + ((h / 512) % 512).toInt
        val feature = Array.tabulate(8)(i => ((h >> (i * 8)) % 1000).toInt / 1000.0f)
        Row.fromSeq(Seq(r.get(idIdx), width, height, 3, feature.toSeq))
        }
      }
    }(Encoders.row(outSchema))
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
