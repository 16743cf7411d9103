package graft.text

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws for the PII patterns (driver-side java.util.regex — the same
  * dialect Spark's regexp_replace compiles; RE2 parity is covered by the
  * q_redact oracle).
  */
object RedactProps extends Properties("RedactPatterns") {

  private val emailRe = TextStats.emailPattern.r
  private val ipRe = TextStats.ipv4Pattern.r

  private val local = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '_', '%', '+', '-'))).map(_.mkString)
    .suchThat(_.exists(_.isLetterOrDigit))
  private val hostLabel = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
  private val tld = Gen.listOfN(3, Gen.alphaChar).map(_.mkString)
  private val email = for {
    l <- local; h <- hostLabel; t <- tld
  } yield s"$l@$h.$t"

  private val octet = Gen.choose(0, 255)
  private val ip = for {
    a <- octet; b <- octet; c <- octet; d <- octet
  } yield s"$a.$b.$c.$d"

  property("every generated email is matched in full") =
    forAll(email) { e => emailRe.findFirstIn(e).contains(e) }

  property("every generated IPv4 is matched in full") =
    forAll(ip) { s => ipRe.findFirstIn(s).contains(s) }

  property("alpha-only text with no @ or digits is untouched by both patterns") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.const(' '))).map(_.mkString)) { s =>
      emailRe.findFirstIn(s).isEmpty && ipRe.findFirstIn(s).isEmpty
    }

  property("dotted runs with a 4+-digit final part never match (no partial eats)") =
    forAll(octet, octet, octet, Gen.choose(1000, 999999)) { (a, b, c, big) =>
      ipRe.findFirstIn(s"$a.$b.$c.$big").isEmpty
    }

  property("redaction order is safe: replacing emails first leaves IPs intact") =
    forAll(email, ip) { (e, s) =>
      val text = s"x $e y $s z"
      val afterEmail = emailRe.replaceAllIn(text, "<EMAIL>")
      ipRe.replaceAllIn(afterEmail, "<IP>") == s"x <EMAIL> y <IP> z"
    }
}
