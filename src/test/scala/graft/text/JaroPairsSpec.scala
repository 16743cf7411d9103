package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** [[Fuzzy.jaroDupPairs]] exactness: the sorted-multiset deletion-
  * signature pair source must return EXACTLY the pairs the in-block
  * quadratic scan returns, at every threshold it claims — including
  * rows past the length cap (which ride the quadratic fallback) and
  * boundary-similarity pairs where a sloppy cap would lose matches.
  */
class JaroPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def quadratic(df: DataFrame, threshold: Double): Seq[(Long, Long, Double)] = {
    val a = df.select(col("id").cast("long").as("id_a"), col("s").as("sa"), col("blk"))
    val b = df.select(col("id").cast("long").as("id_b"), col("s").as("sb"), col("blk"))
    a.join(b, "blk").filter(col("id_a") < col("id_b"))
      .withColumn("jw", graft.functions.StringDist.jaroWinkler(col("sa"), col("sb")))
      .filter(col("jw") >= threshold)
      .select("id_a", "id_b", "jw").orderBy("id_a", "id_b")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
  }

  private def sigged(df: DataFrame, threshold: Double): Seq[(Long, Long, Double)] =
    // pairBudget = 0 FORCES the signature path — small fixtures would
    // otherwise take the cost-based quadratic branch and test nothing
    Fuzzy.jaroDupPairs(df, "id", "s", Seq(col("blk")), threshold, pairBudget = 0L)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("jw"))
      .orderBy("id_a", "id_b")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private def costBased(df: DataFrame, threshold: Double): Seq[(Long, Long, Double)] =
    Fuzzy.jaroDupPairs(df, "id", "s", Seq(col("blk")), threshold)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("jw"))
      .orderBy("id_a", "id_b")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("signature pair source equals the quadratic scan on typo-heavy rows") {
    // transpositions, substitutions, indels, a long row past the cap,
    // and unrelated strings — one block so every pair is in play
    val names = Seq("MARTHA", "MARHTA", "MARTHAX", "MARSHA", "DWAYNE",
      "DUANE", "Customer#000000012", "Customer#000000021",
      "Customer#000000012ABCDEFGHIJKLMNOPQRSTUVWXYZ", // past lenCap: quadratic path
      "JELLYFISH", "SMELLYFISH", "")
    val df = createDf(spark, "id int, s string, blk int",
      names.zipWithIndex.map { case (n, i) => Seq[Any](i, n, 0) })
    for (th <- Seq(0.975, 0.92, 0.85)) {
      val sig = sigged(df, th)
      val quad = quadratic(df, th)
      assert(sig == quad, s"threshold $th")
    }
    assert(quadratic(df, 0.92).nonEmpty)
  }

  test("boundary similarity: pairs at exactly the threshold are kept") {
    // jw(MARTHA, MARHTA) = 0.961111... — threshold set exactly there
    val df = createDf(spark, "id int, s string, blk int",
      Seq(Seq[Any](0, "MARTHA", 0), Seq[Any](1, "MARHTA", 0)))
    val th = graft.functions.JaroWinklerSim.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString("MARTHA"),
      org.apache.spark.unsafe.types.UTF8String.fromString("MARHTA"))
    assert(sigged(df, th) == quadratic(df, th))
    assert(sigged(df, th).size == 1)
  }

  test("signature pair source equals the quadratic on real customer names") {
    val c = graft.sources.Sources.readTable(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"),
        concat_ws("|", col("c_nationkey"), col("c_mktsegment")).as("blk"))
    val sig = sigged(c, 0.975)
    val quad = quadratic(c, 0.975)
    assert(sig == quad)
    assert(quad.nonEmpty) // the dataset must actually exercise the path
    // and the cost-based default (which picks the quadratic branch at
    // this size) returns the same pairs
    assert(costBased(c, 0.975) == quad)
  }

  test("rows past lenCap match the quadratic scan in BOTH regimes") {
    // two long near-duplicates (one transposition at 40+ chars — far past
    // the threshold-0.92 cap), a long/short unrelated mix, and short
    // near-pairs: the overflow route must surface the long-long match in
    // the forced-signature regime, and the cost-based default (quadratic
    // at this size) must agree pair-for-pair
    val longA = "Customer#000000012ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val longB = "Customer#000000012ABCDEFGHIJKLMNOPQRSTUVWXZY" // swap tail
    val names = Seq(longA, longB, "MARTHA", "MARHTA", "DWAYNE",
      "Customer#000000099", longA + "0123456789")
    val df = createDf(spark, "id int, s string, blk int",
      names.zipWithIndex.map { case (n, i) => Seq[Any](i, n, 0) })
    for (th <- Seq(0.975, 0.92)) {
      val quad = quadratic(df, th)
      assert(sigged(df, th) == quad, s"signature regime, threshold $th")
      assert(costBased(df, th) == quad, s"cost-based regime, threshold $th")
    }
    // the long-long pair is really there (exercises the overflow union)
    assert(quadratic(df, 0.92).exists { case (a, b, _) => a == 0L && b == 1L })
  }

  test("customer names ride the signature path, not the quadratic fallback") {
    // at threshold 0.975 / k=2 the length cap is 23; 18-char customer
    // names must all be on the sub-quadratic side. Proxy check: a block
    // with ONLY short strings and no near-pairs produces no candidates
    // (the quadratic path would still score C(n,2) pairs, but both
    // paths return the empty result — so instead pin the cap math).
    val jMin = (0.975 - 0.4) / 0.6
    val rate = 3.0 * (1.0 - jMin) * (1.0 + 1e-12) + 1e-15
    val lenCap = (math.ceil(3.0 / rate) - 1).toInt
    assert(lenCap == 23)
    assert("Customer#000000012".length <= lenCap)
  }
}
