package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip laws for the pure-JVM P6 header parser: any well-formed
  * header — arbitrary dims, maxval, whitespace runs, interleaved
  * comments — must parse back to exactly what was encoded, with the
  * data offset landing on the first pixel byte; malformed variants must
  * be rejected, never mis-parsed. Driver-side (the parser is a plain
  * function); MultimodalSpec pins the Spark decode path on top of it.
  */
object PpmProps extends Properties("PpmHeader") {

  private val ws: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n', '\r'))
    .map(_.mkString)
  private val comment: Gen[String] = for {
    body <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    pre <- ws
  } yield s"#$body\n$pre" // a comment runs to newline; more ws after
  private val sep: Gen[String] = Gen.frequency(4 -> ws, 1 -> comment.flatMap(c => ws.map(_ + c)))

  private val dims: Gen[(Int, Int, Int)] = for {
    w <- Gen.chooseNum(0, 40); h <- Gen.chooseNum(0, 40)
    mv <- Gen.chooseNum(1, 255)
  } yield (w, h, mv)

  property("well-formed headers round-trip (dims, maxval, exact data offset)") =
    forAll(dims, sep, sep, sep, Gen.oneOf(' ', '\n')) { case ((w, h, mv), s1, s2, s3, last) =>
      val header = s"P6$s1$w$s2$h$s3$mv$last"
      val data = Array.tabulate(3 * w * h)(i => (i * 31 + 7).toByte)
      val p = header.getBytes("US-ASCII") ++ data
      Multimodal.parsePpmHeader(p).contains((w, h, mv, header.length))
    }

  private val dimsPos: Gen[(Int, Int, Int)] = for {
    w <- Gen.chooseNum(1, 40); h <- Gen.chooseNum(1, 40)
    mv <- Gen.chooseNum(1, 255)
  } yield (w, h, mv)

  property("data bytes that LOOK like whitespace are not consumed") =
    forAll(dimsPos, sep) { case ((w, h, mv), s1) =>
      val header = s"P6$s1$w $h $mv\n"
      val data = Array.fill(3 * w * h)('\n'.toByte) // all-whitespace pixel data
      Multimodal.parsePpmHeader(header.getBytes("US-ASCII") ++ data)
        .contains((w, h, mv, header.length))
    }

  property("bad magic never parses") =
    forAll(dims) { case (w, h, mv) =>
      val p = s"P5\n$w $h\n$mv\n".getBytes("US-ASCII") ++ Array.fill(3 * w * h)(1.toByte)
      Multimodal.parsePpmHeader(p).isEmpty
    }

  property("maxval over 255 (two-byte samples) is rejected, not misread") =
    forAll(Gen.chooseNum(256, 65535)) { mv =>
      Multimodal.parsePpmHeader(s"P6\n2 2\n$mv\n".getBytes("US-ASCII") ++
        Array.fill(24)(1.toByte)).isEmpty
    }

  property("truncation anywhere inside the header is rejected") =
    forAll(dims, Gen.chooseNum(0, 7)) { case ((w, h, mv), cut) =>
      val header = s"P6\n$w $h\n$mv\n"
      val keep = math.min(header.length - 1, math.max(0, header.length - 1 - cut))
      Multimodal.parsePpmHeader(header.substring(0, keep).getBytes("US-ASCII")).isEmpty
    }
}
