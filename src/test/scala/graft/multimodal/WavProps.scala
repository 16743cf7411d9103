package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip and robustness laws for the pure-JVM RIFF/WAVE codec:
  * encode(raw, rate) must decode back to exactly the frame count, rate,
  * and signed-sample sum computable from the raw bytes directly; chunk
  * walking must survive arbitrary unknown chunks (with odd-size padding)
  * before `data`; and arbitrary byte garbage must be rejected with null
  * metrics, never an exception or a mis-parse. Driver-side (the codec is
  * plain functions); MultimodalSpec pins the Spark path on top.
  */
object WavProps extends Properties("WavCodec") {

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def signedSum(raw: Array[Byte]): Long = {
    val n = raw.length & ~1
    var s = 0L; var i = 0
    while (i < n) { s += (((raw(i) & 0xFF) | ((raw(i + 1) & 0xFF) << 8)).toShort: Short); i += 2 }
    s
  }

  private val rawGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  private val rateGen: Gen[Int] = Gen.chooseNum(1, 192000)

  property("encode → parse round-trips frames, rate, and the exact signed sum") =
    forAll(rawGen, rateGen) { (raw, rate) =>
      Multimodal.parseWav(Multimodal.buildWavPcm16(raw, rate)) ==
        Seq(1, rate, 16, (raw.length / 2).toLong, signedSum(raw), null)
    }

  private val junkChunk: Gen[Array[Byte]] = for {
    id <- Gen.listOfN(4, Gen.alphaChar).map(_.mkString)
      .suchThat(s => s != "fmt " && s != "data")
    body <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  } yield id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
    (if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])

  property("unknown chunks (odd sizes padded) before fmt/data are walked over") =
    forAll(rawGen, rateGen, Gen.listOfN(2, junkChunk)) { (raw, rate, junk) =>
      val canonical = Multimodal.buildWavPcm16(raw, rate)
      // splice the junk between "WAVE" and the fmt chunk
      val spliced = canonical.take(12) ++ junk.flatten ++ canonical.drop(12)
      Multimodal.parseWav(spliced) ==
        Seq(1, rate, 16, (raw.length / 2).toLong, signedSum(raw), null)
    }

  property("truncating the data payload rejects with all-null metrics") =
    forAll(rawGen.suchThat(_.length >= 2), rateGen, Gen.chooseNum(1, 100)) {
      (raw, rate, cut) =>
        val p = Multimodal.buildWavPcm16(raw, rate)
        val n = math.min(cut, (raw.length & ~1)) // keep the 44-byte header intact
        Multimodal.parseWav(p.dropRight(n)).forall(_ == null)
    }

  property("arbitrary garbage never throws and never fabricates metrics") =
    forAll(rawGen) { bytes =>
      val r = Multimodal.parseWav(bytes)
      r.length == 6 && (r.forall(_ == null) || r.forall(_ != null) ||
        (r(5) == null && r.take(5).forall(_ != null))) // mono: only ch1 null
    }

  property("a stereo container sums each channel independently") =
    forAll(Gen.listOf(Gen.zip(
      Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt),
      Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))), rateGen) {
      (frames, rate) =>
        val data = frames.toArray.flatMap { case (a, b) => le16(a) ++ le16(b) }
        val p = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
          "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(rate) ++
          le32(rate * 4) ++ le16(4) ++ le16(16) ++
          "data".getBytes ++ le32(data.length) ++ data
        Multimodal.parseWav(p) == Seq(2, rate, 16, frames.length.toLong,
          frames.map(_._1.toLong).sum, frames.map(_._2.toLong).sum)
    }
}
