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

  test("single-partition exchanges feed only the bounded offsets table, never the rows") {
    val df = spark.range(5000).toDF("k")
    val p = Ids.withDenseId(df, Seq("k"), numPartitions = Some(8))
      .queryExecution.executedPlan.toString
    // every SinglePartition exchange's subtree must start with the
    // partition-count aggregation — rows reach it pre-reduced
    var idx = p.indexOf("Exchange SinglePartition")
    while (idx >= 0) {
      val subtree = p.substring(idx, math.min(p.length, idx + 1200))
      assert(subtree.contains("HashAggregate"),
        s"a SinglePartition exchange consumes raw rows:\n$subtree")
      idx = p.indexOf("Exchange SinglePartition", idx + 1)
    }
  }

  test("the row stream goes through a range repartition (distributed sort)") {
    val df = spark.range(5000).toDF("k")
    // the materialization barrier hides the shuffle from the final plan:
    // inspect the pre-barrier stage instead
    val order = Seq(org.apache.spark.sql.functions.col("k").asc)
    val staged = df.repartitionByRange(8, order: _*).sortWithinPartitions(order: _*)
    assert(staged.queryExecution.executedPlan.toString.contains("rangepartitioning"))
  }

  test("reserved-name collision fails loudly") {
    val df = spark.range(5).toDF("row_id")
    intercept[IllegalArgumentException] {
      Ids.withDenseId(df, Seq("row_id"))
    }
  }

  test("withRunningTotals matches driver-side prefix sums, any partitioning") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i, rnd.nextInt(100).toLong, rnd.nextInt(9).toLong))
    val want = rows.sortBy(_._1)
      .scanLeft((0, 0L, 0L)) { case ((_, a, b), (k, x, y)) => (k, a + x, b + y) }
      .tail.map { case (k, a, b) => k -> (a, b) }.toMap
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(rnd.shuffle(rows)).toDF("k", "x", "y")
        .repartition(parts)
      val got = Ids.withRunningTotals(df, Seq("k"), Seq("x", "y"))
        .collect().map(r => r.getInt(0) -> (r.getLong(3), r.getLong(4))).toMap
      assert(got == want, s"prefix sums diverge at parts=$parts")
    }
  }

  test("withRunningTotals: the only SinglePartition exchange feeds the offsets table") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(2000).toDF("k")
      .withColumn("x", col("k") % 5)
    val plan = Ids.withRunningTotals(df, Seq("k"), Seq("x"))
      .queryExecution.executedPlan.toString
    // pre-aggregated partition subtotals may single-partition; raw rows never
    var idx = plan.indexOf("Exchange SinglePartition")
    while (idx >= 0) {
      val tail = plan.substring(idx)
      assert(tail.contains("HashAggregate"),
        s"SinglePartition exchange must consume pre-aggregated counts:\n${tail.take(800)}")
      idx = plan.indexOf("Exchange SinglePartition", idx + 1)
    }
  }
}
