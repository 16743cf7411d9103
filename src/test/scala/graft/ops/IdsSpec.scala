package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class IdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dense ids are 0..n-1 and follow the total order") {
    val df = spark.range(1000).toDF("k")
      .withColumn("k", (col("k") * 7919) % 1000) // scrambled but unique
      .repartition(7)
    val got = Ids.withDenseId(df, Seq("k"), numPartitions = Some(5))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == (0L until 1000L))
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }

  test("ids are contiguous regardless of partition count") {
    val df = spark.range(100).toDF("k")
    for (np <- Seq(1, 3, 11)) {
      val ids = Ids.withDenseId(df, Seq("k"), numPartitions = Some(np))
        .select("row_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until 100L), s"np=$np")
    }
  }

  test("no single-partition exchange: the data never collapses to one partition") {
    val df = spark.range(5000).toDF("k")
    val p = Ids.withDenseId(df, Seq("k"), numPartitions = Some(8))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition") || p.contains("rangepartitioning"),
      s"dense ids must not plan a global single-partition sort over the DATA:\n${p.take(1500)}")
    assert(p.contains("rangepartitioning"), s"expected a range repartition:\n${p.take(1500)}")
  }

  test("reserved-name collision fails loudly") {
    val df = spark.range(5).toDF("row_id")
    intercept[IllegalArgumentException] {
      Ids.withDenseId(df, Seq("row_id"))
    }
  }
}
