package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class FrequencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 hot keys (100 each) + 300 singleton cold keys, n = 600
  private def skewed = (
    Seq.tabulate(300)(i => s"hot${i % 3}") ++ Seq.tabulate(300)(i => s"cold$i")
  ).toDF("k").repartition(7) // deliberately many partitions for the sketch

  test("heavyHitters: exactly the keys above total/k, with exact counts") {
    val got = Frequency.heavyHitters(skewed, "k", k = 10) // threshold 60
    val m = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("hot0" -> 100L, "hot1" -> 100L, "hot2" -> 100L))
  }

  test("heavyHitters: threshold is strict (boundary key excluded)") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("k")
    assert(Frequency.heavyHitters(df, "k", k = 2).count() == 0) // 50*2 = 100, not >
  }

  test("misraGries: every true heavy hitter survives the sketch") {
    val cand = Frequency.misraGries(skewed, "k", capacity = 10)
      .select("key").as[String].collect().toSet
    assert(Set("hot0", "hot1", "hot2").subsetOf(cand))
  }

  test("misraGries: estimates are lower bounds of true counts") {
    val est = Frequency.misraGries(skewed, "k", capacity = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k2, e) <- est) assert(e <= truth(k2), s"$k2 est $e > true ${truth(k2)}")
  }

  test("misraGries: summary size bounded by partitions * capacity") {
    val n = Frequency.misraGries(skewed, "k", capacity = 5).count()
    assert(n <= 7 * 5)
  }

  test("misraGries degenerate capacity=1 still finds a majority key") {
    val df = (Seq.fill(900)("maj") ++ Seq.tabulate(100)(i => s"x$i")).toDF("k")
      .repartition(3)
    val cand = Frequency.misraGries(df, "k", capacity = 1)
      .select("key").as[String].collect().toSet
    assert(cand.contains("maj"))
  }

  test("numeric keys cast to string consistently across both paths") {
    val df = (Seq.fill(80)(7L) ++ (1L to 20L)).toDF("k")
    val hh = Frequency.heavyHitters(df, "k", k = 4) // threshold 25
    assert(hh.collect().map(_.getString(0)).toSeq == Seq("7"))
    assert(Frequency.misraGries(df, "k", 4).filter(col("key") === "7").count() == 1)
  }
}
