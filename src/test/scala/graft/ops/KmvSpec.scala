package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def items(rows: (Int, String)*) =
    createDf(spark, "g int, k string", rows.map { case (g, k) => Seq[Any](g, k) })

  test("kmvDistinct is EXACT below k (est = n_distinct, rel_err 0)") {
    val df = items((1 to 40).map(i => 1 -> s"v${i % 25}"): _*) // 25 distinct
    val r = Kmv.kmvDistinct(df, Seq("g"), col("k"), k = 256).head()
    assert(r.getLong(1) == 25L && r.getLong(2) == 25L)
    assert(r.getDouble(4) == 25.0 && r.getDouble(5) == 0.0)
  }

  test("kmvDistinct above k estimates within ~3/sqrt(k) relative error") {
    val df = items((1 to 20000).map(i => 1 -> s"value$i"): _*)
    val r = Kmv.kmvDistinct(df, Seq("g"), col("k"), k = 256).head()
    assert(r.getLong(1) == 20000L && r.getLong(2) == 256L)
    val relErr = r.getDouble(5)
    assert(relErr < 3.0 / math.sqrt(256.0), s"rel_err $relErr out of KMV tolerance")
  }

  test("kmvDistinct is deduplicating (multiplicity-invariant) and partitioning-invariant") {
    val once = items((1 to 500).map(i => 1 -> s"x$i"): _*)
    val thrice = items((1 to 1500).map(i => 1 -> s"x${i % 500 + 1}"): _*)
    val a = Kmv.kmvDistinct(once, Seq("g"), col("k"), 64).head()
    val b = Kmv.kmvDistinct(thrice, Seq("g"), col("k"), 64).head()
    assert(a.getDouble(4) == b.getDouble(4))
    val c = Kmv.kmvDistinct(once.repartition(7), Seq("g"), col("k"), 64).head()
    assert(a == c)
  }

  test("kmvJaccard: identical sets estimate 1, disjoint sets 0, half-overlap lands near 1/3") {
    val ident = items(((1 to 600).map(i => 1 -> s"t$i") ++ (1 to 600).map(i => 2 -> s"t$i")): _*)
    val ri = Kmv.kmvJaccard(ident, "g", col("k"), k = 64).head()
    assert(ri.getDouble(4) == 1.0)
    val disj = items(((1 to 600).map(i => 1 -> s"a$i") ++ (1 to 600).map(i => 2 -> s"b$i")): _*)
    val rd = Kmv.kmvJaccard(disj, "g", col("k"), k = 64).head()
    assert(rd.getDouble(4) == 0.0)
    // |A|=|B|=600 sharing 300: J = 300/900 = 1/3
    val half = items(((1 to 600).map(i => 1 -> s"s$i") ++ (301 to 900).map(i => 2 -> s"s$i")): _*)
    val rh = Kmv.kmvJaccard(half, "g", col("k"), k = 64).head()
    val est = rh.getDouble(4)
    assert(est > 0.15 && est < 0.55, s"half-overlap estimate $est too far from 1/3")
  }

  test("kmvJaccard emits every group pair once, ordered a < b") {
    val df = items(((1 to 50).flatMap(i => Seq(1 -> s"v$i", 2 -> s"v$i", 3 -> s"w$i"))): _*)
    val got = Kmv.kmvJaccard(df, "g", col("k"), k = 32)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 2), (1, 3), (2, 3)))
  }
}
