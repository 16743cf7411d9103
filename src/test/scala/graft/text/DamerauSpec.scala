package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{StringDist, StringDistances}
import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Unrestricted Damerau-Levenshtein vs hand-checked values — including
  * the cases that separate it from plain Levenshtein and from the
  * restricted (optimal-string-alignment) variant.
  */
class DamerauSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def d(a: String, b: String): Int =
    StringDistances.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand-checked distances match the Lowrance-Wagner definition") {
    assert(d("", "") == 0)
    assert(d("", "abc") == 3)
    assert(d("abc", "") == 3)
    assert(d("same", "same") == 0)
    assert(d("kitten", "sitting") == 3)   // plain Levenshtein case
    assert(d("ab", "ba") == 1)            // adjacent transposition is 1
    assert(d("abc", "acb") == 1)
    assert(d("abcdef", "abcfed") == 2)    // f<->e then d<->e region
    // the unrestricted hallmark: edit INSIDE a transposed block.
    // OSA gives 3 here; true DL gives 2 (transpose CA, insert B)
    assert(d("CA", "ABC") == 2)
    assert(d("ca", "abc") == 2)
  }

  test("symmetry and triangle sanity on a small sample") {
    val words = Seq("apple", "aple", "appel", "maple", "apples", "papel")
    for (a <- words; b <- words) {
      assert(d(a, b) == d(b, a), s"symmetry($a,$b)")
      assert((d(a, b) == 0) == (a == b))
    }
  }

  test("code points: surrogate-pair characters count once") {
    // U+1F600 is two UTF-16 chars but one code point
    val s1 = new String(Character.toChars(0x1F600))
    val s2 = new String(Character.toChars(0x1F601))
    assert(d(s1, s2) == 1)      // one substitution, not two
    assert(d(s1 + "a", "a" + s1) == 1) // transposition of cp pair
  }

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinklerSim.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler matches the textbook values DuckDB also produces") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r6(jw("MARTHA", "MARHTA")) == 0.961111)
    assert(r6(jw("DIXON", "DICKSONX")) == 0.813333)
    assert(r6(jw("JELLYFISH", "SMELLYFISH")) == 0.896296) // no shared prefix: no boost
    assert(r6(jw("DWAYNE", "DUANE")) == 0.84)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)   // no matches in window
    assert(jw("ab", "ba") == 0.0)     // window 0 for length-2 strings
    // prefix boost: digit transposition deep in a long shared prefix
    assert(r6(jw("Customer#000000012", "Customer#000000021")) == 0.988889)
  }

  test("signature pair source equals the quadratic scan (DL completeness)") {
    // transposition-heavy rows: the case plain Levenshtein signatures
    // would justify but DL must ALSO cover (each unit op repairable by
    // one deletion per side)
    val names = Seq("abcdef", "abcdfe", "bacdef", "abdcef", "abcxef",
      "abcdefg", "xbcdef", "azcdeb", "fedcba")
    val df = createDf(spark, "id int, s string, blk int",
      names.zipWithIndex.map { case (n, i) => Seq[Any](i, n, 0) })
    // pairBudget = 0 forces the signature path (the cost-based default
    // would pick the quadratic branch at this size and test nothing)
    val sig = Fuzzy.damerauDupPairs(df, "id", "s", Seq(col("blk")), maxDist = 2,
      pairBudget = 0L)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b").collect().toSeq
    val a = df.select(col("id").as("id_a"), col("s").as("sa"), col("blk"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"), col("blk"))
    val quad = a.join(b, "blk").filter(col("id_a") < col("id_b"))
      .withColumn("dist", graft.functions.StringDist.damerau(col("sa"), col("sb")))
      .filter(col("dist") <= 2)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b").collect().toSeq
    assert(sig == quad)
    assert(quad.nonEmpty)
  }

  test("the Column wrapper runs inside a dataframe and matches eval") {
    val df = createDf(spark, "a string, b string",
      Seq(Seq[Any]("CA", "ABC"), Seq[Any]("ab", "ba"),
        Seq[Any]("kitten", "sitting"), Seq[Any](null, "x")))
    val out = df.select(StringDist.damerau(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getInt(0) == 2)
    assert(out(1).getInt(0) == 1)
    assert(out(2).getInt(0) == 3)
    assert(out(3).isNullAt(0)) // null propagates
  }
}
