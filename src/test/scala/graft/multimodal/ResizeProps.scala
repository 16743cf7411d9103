package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws for the pure nearest-neighbor PPM resize: output is a valid P6
  * of exactly the target dims whose every pixel equals the
  * floor-convention source pixel; identity dims are a byte-for-byte
  * no-op; malformed input is rejected with null, never an exception.
  * Driver-side (plain function); MultimodalSpec pins the Spark path.
  */
object ResizeProps extends Properties("PpmResize") {

  private def mkPpm(w: Int, h: Int, px: (Int, Int, Int) => Byte): Array[Byte] = {
    val data = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      data((y * w + x) * 3 + c) = px(x, y, c)
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ data
  }

  private val dims: Gen[(Int, Int)] =
    Gen.zip(Gen.chooseNum(1, 24), Gen.chooseNum(1, 24))

  property("output parses to the target dims and every pixel is the floor-sampled source") =
    forAll(dims, dims) { case ((w, h), (dw, dh)) =>
      // pixel value encodes its (x, y, c) coordinates — sampling errors show
      val src = mkPpm(w, h, (x, y, c) => (x * 29 + y * 13 + c * 7 + 1).toByte)
      val out = Multimodal.resizePpmPure(src, dw, dh)
      Multimodal.parsePpmHeader(out) match {
        case Some((`dw`, `dh`, 255, off)) =>
          (0 until dh).forall { y =>
            val sy = (y.toLong * h / dh).toInt
            (0 until dw).forall { x =>
              val sx = (x.toLong * w / dw).toInt
              (0 until 3).forall { c =>
                out(off + (y * dw + x) * 3 + c) == (sx * 29 + sy * 13 + c * 7 + 1).toByte
              }
            }
          }
        case _ => false
      }
    }

  property("identity dims reproduce the container byte-for-byte") =
    forAll(dims) { case (w, h) =>
      val src = mkPpm(w, h, (x, y, c) => (x + y + c).toByte)
      Multimodal.resizePpmPure(src, w, h).toSeq == src.toSeq
    }

  property("preserve-dimension zeros behave as identity on that axis") =
    forAll(dims, Gen.chooseNum(1, 24)) { case ((w, h), dw) =>
      val src = mkPpm(w, h, (x, y, c) => (x * 3 + y * 5 + c).toByte)
      val out = Multimodal.resizePpmPure(src, dw, 0)
      Multimodal.parsePpmHeader(out).exists { case (pw, ph, _, _) => pw == dw && ph == h }
    }

  property("truncated pixel data or garbage rejects with null, never throws") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      dims) { case (junk, (dw, dh)) =>
      Multimodal.resizePpmPure(junk, dw, dh) == null ||
        Multimodal.parsePpmHeader(junk).isDefined // junk accidentally valid: fine
    }
}
