package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}

class ColumnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mapCol decodes via literal map; unmapped keys yield null") {
    val df = createDf(spark, Seq("code"), Seq(Seq("F"), Seq("O"), Seq("P")))
    val out = df.withColumn("name", Columns.mapCol("code", Seq("F" -> "full", "O" -> "open")))
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("F" -> "full", "O" -> "open", "P" -> null))
  }

  test("mapCol supports array-valued mappings (reference general.py:156-158)") {
    val df = createDf(spark, Seq("code"), Seq(Seq("a")))
    val out = df.withColumn("arr", Columns.mapCol("code", Seq("a" -> Seq(1.0f, 2.0f))))
    assert(out.head().getSeq[Float](1) == Seq(1.0f, 2.0f))
  }

  test("mapColumnNames renames only mapped columns") {
    val df = createDf(spark, Seq("a", "b"), Seq(Seq(1, 2)))
    val out = Columns.mapColumnNames(df, Map("a" -> "x"))
    assert(out.columns.toSeq == Seq("x", "b"))
  }

  test("arrayDiff matches naive successive differences, incl. degenerate sizes") {
    val df = createDf(spark, "a array<double>", Seq(
      Seq(Seq(1.0, 3.0, 6.0, 10.0)), Seq(Seq(5.0)), Seq(Seq.empty[Double])))
    val got = df.select(Columns.arrayDiff(col("a"))).collect().map(_.getSeq[Double](0).toSeq).toSet
    assert(got == Set(Seq(2.0, 3.0, 4.0), Seq.empty[Double]))
  }

  test("arrayDiff law: matches naive sliding difference on random arrays") {
    val rnd = new scala.util.Random(11)
    val arrays = Seq.fill(60)(Seq.fill(rnd.nextInt(8))(
      math.round(rnd.nextDouble() * 1000) / 10.0))
    val df = createDf(spark, "i int, a array<double>",
      arrays.zipWithIndex.map { case (a, i) => Seq[Any](i, a) })
    val got = df.select(col("i"), Columns.arrayDiff(col("a")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val naive = if (a.length < 2) Seq.empty[Double]
                  else a.sliding(2).map(p => p(1) - p(0)).toSeq
      assert(got(i) == naive, s"diff law failed for $a")
    }
  }

  test("getFirstGroup keeps exactly one group; firstGroupOrdered keeps the min") {
    val df = createDf(spark, Seq("g", "v"), Seq(Seq("b", 1), Seq("a", 2), Seq("a", 3)))
    val first = Columns.firstGroupOrdered(df, Seq("g"))
    assert(first.select("g").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(first.count() == 2)
    assert(Columns.getFirstGroup(df, Seq("g")).select("g").distinct().count() == 1)
  }

  test("windowSpec: grouped vs whole-frame sums") {
    val df = createDf(spark, Seq("g", "v"), Seq(Seq("a", 1), Seq("a", 2), Seq("b", 3)))
    val out = df.select(col("g"),
      sum("v").over(Columns.windowSpec(Seq("g"))).as("per_g"),
      sum("v").over(Columns.windowSpec()).as("total"))
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a", 3L, 6L), ("b", 3L, 6L)))
  }

  test("toList: single column flattens, multi column nests") {
    val df = createDf(spark, Seq("a", "b"), Seq(Seq(1, "x")))
    assert(Columns.toList(df.select("a")) == Seq(1))
    assert(Columns.toList(df) == Seq(Seq(1, "x")))
  }
}

class TimeseriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("ffill fills forward within partition, bfill backward") {
    val df = createDf(spark, "g string, t timestamp, v double", Seq(
      Seq("a", ts("2024-01-01 00:00:00"), 1.0),
      Seq("a", ts("2024-01-02 00:00:00"), null),
      Seq("a", ts("2024-01-03 00:00:00"), 3.0),
      Seq("b", ts("2024-01-01 00:00:00"), null)))
    val f = Timeseries.ffill(df, Seq("g"), Seq("t"), Seq("v"))
      .orderBy("g", "t").collect().map(r => Option(r.get(2)))
    assert(f.toSeq == Seq(Some(1.0), Some(1.0), Some(3.0), None))
    val b = Timeseries.bfill(df, Seq("g"), Seq("t"), Seq("v"))
      .orderBy("g", "t").collect().map(r => Option(r.get(2)))
    assert(b.toSeq == Seq(Some(1.0), Some(3.0), Some(3.0), None))
  }

  test("shifted year: January belongs to the previous year") {
    val df = createDf(spark, "t timestamp", Seq(
      Seq(ts("2024-01-15 00:00:00")), Seq(ts("2024-02-01 00:00:00")), Seq(ts("2024-12-31 00:00:00"))))
    val got = df.select(Timeseries.shiftedYear(col("t"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2023, 2024, 2024))
  }

  test("shiftedWithinYearFfill does not fill across the February boundary") {
    val df = createDf(spark, "g string, t timestamp, v double", Seq(
      Seq("a", ts("2024-01-15 00:00:00"), 7.0),
      Seq("a", ts("2024-02-02 00:00:00"), null),
      Seq("a", ts("2024-03-01 00:00:00"), 9.0),
      Seq("a", ts("2024-03-02 00:00:00"), null)))
    val got = Timeseries.shiftedWithinYearFfill(df, Seq("g"), "t", Seq("v"))
      .orderBy("t").collect().map(r => Option(r.get(2)))
    assert(got.toSeq == Seq(Some(7.0), None, Some(9.0), Some(9.0)))
  }

  test("withRollingMean: trailing-n mean with partial leading windows") {
    val df = createDf(spark, "g string, t timestamp, v double", Seq(
      Seq("a", ts("2024-01-01 00:00:00"), 1.0),
      Seq("a", ts("2024-01-02 00:00:00"), 2.0),
      Seq("a", ts("2024-01-03 00:00:00"), 6.0),
      Seq("a", ts("2024-01-04 00:00:00"), 10.0),
      Seq("b", ts("2024-01-01 00:00:00"), 5.0)))
    val got = Timeseries.withRollingMean(df, Seq("g"), Seq("t"), col("v"), 3, "rm")
      .orderBy("g", "t").collect().map(_.getDouble(3)).toSeq
    assert(got == Seq(1.0, 1.5, 3.0, 6.0, 5.0))
  }

  test("shiftedWithinYearApply with ffill method equals shiftedWithinYearFfill (W2≡W3)") {
    val df = createDf(spark, "g string, t timestamp, v double", Seq(
      Seq("a", ts("2024-01-15 00:00:00"), 7.0),
      Seq("a", ts("2024-02-02 00:00:00"), null),
      Seq("a", ts("2024-03-01 00:00:00"), 9.0),
      Seq("a", ts("2024-03-02 00:00:00"), null),
      Seq("b", ts("2023-12-31 00:00:00"), 1.0),
      Seq("b", ts("2024-01-01 00:00:00"), null)))
    val viaApply = Timeseries.shiftedWithinYearApply(df, Seq("g"), "t") { (d, groups) =>
      Timeseries.ffill(d, groups, Seq("t"), Seq("v"))
    }.orderBy("g", "t").collect().map(r => Option(r.get(2))).toSeq
    val viaFfill = Timeseries.shiftedWithinYearFfill(df, Seq("g"), "t", Seq("v"))
      .orderBy("g", "t").collect().map(r => Option(r.get(2))).toSeq
    assert(viaApply == viaFfill)
    // b's Dec 31 (shifted-year 2023) and Jan 1 (also 2023) share a group → fill crosses
    assert(viaApply == Seq(Some(7.0), None, Some(9.0), Some(9.0), Some(1.0), Some(1.0)))
  }

  test("shiftedWithinYearApply supports non-fill methods (mean impute per shifted year)") {
    val df = createDf(spark, "g string, t timestamp, v double", Seq(
      Seq("a", ts("2024-02-01 00:00:00"), 2.0),
      Seq("a", ts("2024-03-01 00:00:00"), null),
      Seq("a", ts("2024-04-01 00:00:00"), 4.0),
      Seq("a", ts("2025-01-15 00:00:00"), null), // Jan 2025 → shifted-year 2024
      Seq("a", ts("2025-02-01 00:00:00"), 10.0),
      Seq("a", ts("2025-03-01 00:00:00"), null)))
    val got = Timeseries.shiftedWithinYearApply(df, Seq("g"), "t") { (d, groups) =>
      Timeseries.meanImpute(d, groups, Seq("v"))
    }.orderBy("t").collect().map(_.getDouble(2)).toSeq
    // shifted-year 2024 mean = (2+4)/2 = 3.0; shifted-year 2025 mean = 10.0
    assert(got == Seq(2.0, 3.0, 4.0, 3.0, 10.0, 10.0))
  }

  test("ewmaHalf matches pandas ewm(alpha=0.5, adjust=True) closed form") {
    val df = createDf(spark, "g string, t int, c bigint", Seq(
      Seq[Any]("a", 1, 100L), Seq[Any]("a", 2, 200L), Seq[Any]("a", 3, 50L),
      Seq[Any]("b", 1, 7L)))
    val got = Timeseries.ewmaHalf(df, Seq("g"), Seq("t"), "c")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got(("a", 1)) == 100.0)                     // S=100, denom 1
    assert(got(("a", 2)) == 500.0 / 3)                 // (100 + 2·200)/3
    assert(got(("a", 3)) == 100.0)                     // (100 + 400 + 200)/7
    assert(got(("b", 1)) == 7.0)
  }

  test("ewmaHalf is bit-deterministic across partitionings") {
    val rows = (0 until 30).map(i => Seq[Any]("s", i, (i * 37 % 997).toLong))
    val df = createDf(spark, "g string, t int, c bigint", rows)
    val a = Timeseries.ewmaHalf(df, Seq("g"), Seq("t"), "c")
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    val b = Timeseries.ewmaHalf(df.repartition(13), Seq("g"), Seq("t"), "c")
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    assert(a == b)
    assert(a.length == 30) // 30 observations fit the default maxLength
  }

  test("ewmaHalf raises (never silently wraps) past maxLength observations") {
    val rows = (0 until 5).map(i => Seq[Any]("s", i, 1L))
    val df = createDf(spark, "g string, t int, c bigint", rows)
    val ex = intercept[Exception] {
      Timeseries.ewmaHalf(df, Seq("g"), Seq("t"), "c", maxLength = 4).collect()
    }
    assert(ex.getMessage.contains("maxLength") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxLength")))
  }
}

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("packSequences: exclusive-cumsum chunking, shard-local ids") {
    val df = createDf(spark, "shard string, id int, toks long", Seq(
      Seq[Any]("a", 1, 300L), // offset 0   -> pack 0
      Seq[Any]("a", 2, 300L), // offset 300 -> pack 0 (straddles)
      Seq[Any]("a", 3, 100L), // offset 600 -> pack 1
      Seq[Any]("b", 1, 700L), // offset 0   -> pack 0 (own shard)
      Seq[Any]("b", 2, 10L))) // offset 700 -> pack 1
    val packed = Pack.packSequences(df, Seq("shard"), Seq("id"), "toks", 512)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getAs[Long]("pack_offset"), r.getAs[Long]("pack_id")))).toMap
    assert(packed(("a", 1)) == ((0L, 0L)))
    assert(packed(("a", 2)) == ((300L, 0L)))
    assert(packed(("a", 3)) == ((600L, 1L)))
    assert(packed(("b", 1)) == ((0L, 0L)))
    assert(packed(("b", 2)) == ((700L, 1L)))
  }

  test("packSummary aggregates docs and tokens per (shard, pack)") {
    val df = createDf(spark, "shard string, id int, toks long", Seq(
      Seq[Any]("a", 1, 300L), Seq[Any]("a", 2, 300L), Seq[Any]("a", 3, 100L)))
    val sm = Pack.packSummary(
        Pack.packSequences(df, Seq("shard"), Seq("id"), "toks", 512), Seq("shard"), "toks")
      .collect().map(r => (r.getString(0), r.getAs[Long]("pack_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(sm(("a", 0L)) == ((2L, 600L)))
    assert(sm(("a", 1L)) == ((1L, 100L)))
  }

  test("packSequences matches a sequential fold model on random data") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 300).map(i =>
      Seq[Any](("shard" + rnd.nextInt(5)): String, i, (1 + rnd.nextInt(600)).toLong))
    val df = createDf(spark, "shard string, id int, toks long", rows)
    val got = Pack.packSequences(df, Seq("shard"), Seq("id"), "toks", 512)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getAs[Long]("pack_offset"), r.getAs[Long]("pack_id")))).toMap
    // driver-side reference model: per shard, fold ids in order
    val model = rows.groupBy(_(0)).flatMap { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_(1).asInstanceOf[Int]).map { r =>
        val off = cum
        cum += r(2).asInstanceOf[Long]
        (shard.asInstanceOf[String], r(1).asInstanceOf[Int]) -> ((off, off / 512))
      }
    }
    assert(got == model)
  }

  test("packSequences has no single-partition window in its plan") {
    val df = createDf(spark, "shard string, id int, toks long",
      Seq(Seq[Any]("a", 1, 1L)))
    val p = Pack.packSequences(df, Seq("shard"), Seq("id"), "toks", 512)
      .queryExecution.executedPlan.toString
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("shard")))
  }
}

class ReshapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unstack then stack round-trips (modulo row order)") {
    val long = createDf(spark, Seq("row", "piv", "v"), Seq(
      Seq("r1", "a", 1.0), Seq("r1", "b", 2.0), Seq("r2", "a", 3.0), Seq("r2", "b", 4.0)))
    val wide = Reshape.unstack(long, Seq("row"), "piv", "v", Seq("a", "b"))
    assert(wide.columns.toSeq == Seq("row", "a", "b"))
    val back = Reshape.stack(wide, Seq("row"), Seq("a", "b"), "piv", "v")
    assertDfEquality(back, long)
  }

  test("stack drops null cells (pandas dropna semantics)") {
    val long = createDf(spark, Seq("row", "piv", "v"), Seq(Seq("r1", "a", 1.0), Seq("r2", "b", 4.0)))
    val wide = Reshape.unstack(long, Seq("row"), "piv", "v", Seq("a", "b"))
    val back = Reshape.stack(wide, Seq("row"), Seq("a", "b"), "piv", "v")
      .filter(col("v").isNotNull)
    assertDfEquality(back, long)
  }

  test("unstackTransposed swaps axes (Stacker transpose=True)") {
    val long = createDf(spark, Seq("row", "piv", "v"), Seq(
      Seq("r1", "a", 1.0), Seq("r1", "b", 2.0), Seq("r2", "a", 3.0), Seq("r2", "b", 4.0)))
    val t = Reshape.unstackTransposed(long, Seq("row"), "piv", "v", Seq("a", "b"))
    assert(t.columns.toSeq.sorted == Seq("piv", "r1", "r2"))
    val rows = t.collect().map(r => r.getAs[String]("piv") ->
      (r.getAs[Double]("r1"), r.getAs[Double]("r2"))).toMap
    assert(rows == Map("a" -> (1.0, 3.0), "b" -> (2.0, 4.0)))
  }

  test("transposeWide is an involution on a square frame (T∘T = id)") {
    val long = createDf(spark, Seq("row", "piv", "v"), Seq(
      Seq("r1", "a", 1.0), Seq("r1", "b", 2.0), Seq("r2", "a", 3.0), Seq("r2", "b", 4.0)))
    val wide = Reshape.unstack(long, Seq("row"), "piv", "v", Seq("a", "b"))
    val twice = Reshape.transposeWide(
      Reshape.transposeWide(wide, Seq("row"), headerName = "piv"),
      Seq("piv"), headerName = "row")
    assertDfEquality(twice.select("row", "a", "b"), wide)
  }

  test("levelSlicer builds the conjunction filter and validates arity") {
    val df = createDf(spark, Seq("a", "b", "v"), Seq(Seq("x", 1, 10), Seq("x", 2, 20), Seq("y", 1, 30)))
    val got = df.filter(Reshape.levelSlicer(Seq("a", "b"), Seq("x", 1))).select("v").head().getInt(0)
    assert(got == 10)
    intercept[IllegalArgumentException] { Reshape.levelSlicer(Seq("a", "b"), Seq("x")) }
  }

  test("fillTuples pads per method (reference generic.py:28-65)") {
    assert(Reshape.fillTuples(Seq(Seq("a"), Seq("b", "c")), "ffill") == Seq(Seq("a", "a"), Seq("b", "c")))
    assert(Reshape.fillTuples(Seq(Seq("a"), Seq("b", "c")), "bfill") == Seq(Seq("a", "a"), Seq("b", "c")))
    assert(Reshape.fillTuples(Seq(Seq("z"), Seq("b", "c", "d")), "bfill") == Seq(Seq("z", "z", "z"), Seq("b", "c", "d")))
  }

  test("keyValuePairs explodes seq values; invertNestedKeys reverses key paths") {
    assert(Reshape.keyValuePairs(Seq("a" -> Seq(1, 2), "b" -> 3)) ==
      Seq("a" -> 1, "a" -> 2, "b" -> 3))
    assert(Reshape.invertNestedKeys(Map(Seq("x", "y") -> 1)) == Map(Seq("y", "x") -> 1))
  }

  test("flattenNested produces full-depth key paths") {
    val m = Map("a" -> Map("b" -> 1, "c" -> 2), "d" -> 3)
    assert(Reshape.flattenNested(m).toSet ==
      Set((Seq("a", "b"), 1), (Seq("a", "c"), 2), (Seq("d"), 3)))
  }

  test("nestedDictToDf: level columns with ffill-padded key paths (R3)") {
    val m = Map("a" -> Map("b" -> 1), "d" -> 3)
    val df = Reshape.nestedDictToDf(spark, m, Seq("l1", "l2"))
    assert(df.columns.toSeq == Seq("l1", "l2", "value"))
    val got = df.collect().map(_.toSeq).toSet
    assert(got == Set(Seq("a", "b", "1"), Seq("d", "d", "3")))
  }
}

class GroupedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("applyPerGroup re-attaches group keys and applies the function per group") {
    val df = createDf(spark, Seq("g", "v"), Seq(Seq("a", 1.0), Seq("a", 3.0), Seq("b", 10.0)))
    val out = Grouped.applyPerGroup(df, Seq("g"), StructType.fromDDL("demeaned double")) {
      (_, rows) =>
        val buf = rows.toSeq
        val mean = buf.map(_.getDouble(1)).sum / buf.size
        buf.iterator.map(r => Row(r.getDouble(1) - mean))
    }
    assert(out.columns.toSeq == Seq("g", "demeaned"))
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set(("a", -1.0), ("a", 1.0), ("b", 0.0)))
  }

  test("applyPerGroup supports shrinking output (per-group summary rows)") {
    val df = createDf(spark, Seq("g", "v"), Seq(Seq("a", 1.0), Seq("a", 3.0), Seq("b", 10.0)))
    val out = Grouped.applyPerGroupSeq(df, Seq("g"), StructType.fromDDL("n int, total double")) {
      rows => Seq(Row(rows.size, rows.map(_.getDouble(1)).sum))
    }
    val got = out.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 2, 4.0), ("b", 1, 10.0)))
  }
}
