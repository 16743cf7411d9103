package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("readTable normalizes the harness events ts to session TIMESTAMP") {
    val e = Sources.readTable(spark, "/root/testdata/sf0.001", "events")
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.count() == 1000)
    // chrono functions that reject TIMESTAMP_NTZ must analyze cleanly
    assert(e.selectExpr("unix_micros(ts)").count() == 1000)
  }

  test("readTable handles both physical ts shapes: NTZ micros and nanos-as-long") {
    val dir = Files.createTempDirectory("graft-ts-shapes")
    // NTZ shape (current harness producer: timestamp[us], not UTC-adjusted)
    val ntz = dir.resolve("ntz").toFile; ntz.mkdir()
    spark.sql("SELECT TIMESTAMP_NTZ '2024-03-01 12:34:56.789012' AS ts, 1L AS id")
      .write.parquet(s"$ntz/events.parquet")
    val eNtz = Sources.readTable(spark, ntz.toString, "events")
    assert(eNtz.schema("ts").dataType.typeName == "timestamp")
    // UTC session: wall-clock value survives the cast exactly
    assert(eNtz.selectExpr("CAST(ts AS STRING)").head().getString(0)
      == "2024-03-01 12:34:56.789012")
    // nanos shape (former producer): surfaces as long under nanosAsLong;
    // a raw long ts column exercises the same conversion branch
    val nanos = dir.resolve("nanos").toFile; nanos.mkdir()
    spark.sql("SELECT 1709296496789012345L AS ts, 1L AS id")
      .write.parquet(s"$nanos/events.parquet")
    val eNanos = Sources.readTable(spark, nanos.toString, "events")
    assert(eNanos.schema("ts").dataType.typeName == "timestamp")
    assert(eNanos.selectExpr("unix_micros(ts)").head().getLong(0) == 1709296496789012L)
  }

  test("readCsv with explicit schema (no inference scan)") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("data.csv"), "id,name\n1,alpha\n2,beta\n")
    val df = Sources.readCsv(spark, dir.toString, "id int, name string")
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "alpha"), (2, "beta")))
  }

  test("ORC round-trip preserves values; pinned ddl prunes columns; filters push down") {
    val dir = Files.createTempDirectory("graft-orc").resolve("t").toString
    val df = spark.range(100).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
    Sources.writeOrc(df, dir)
    // full round-trip
    val back = Sources.readOrc(spark, dir)
    assert(back.count() == 100)
    assert(back.agg(sum("v")).head().getLong(0) == 9900L)
    // pinned-schema read prunes to the requested columns
    val pruned = Sources.readOrc(spark, dir, Some("id bigint, s string"))
    assert(pruned.columns.toSeq == Seq("id", "s"))
    // predicate pushdown reaches the ORC scan
    val plan = Sources.readOrc(spark, dir).filter(col("id") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"),
      s"expected pushed filters in ORC scan:\n$plan")
  }

  test("overwritePartitionsDynamic replaces only the touched partitions") {
    val dir = Files.createTempDirectory("graft-dyn").resolve("t").toString
    val day1 = spark.range(10).selectExpr("id", "'d1' AS day")
    val day2 = spark.range(20).selectExpr("id + 100 AS id", "'d2' AS day")
    Sources.overwritePartitionsDynamic(day1.union(day2), dir, Seq("day"))
    // reprocess day2 only, with different content
    val day2v2 = spark.range(5).selectExpr("id + 500 AS id", "'d2' AS day")
    Sources.overwritePartitionsDynamic(day2v2, dir, Seq("day"))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("day") === "d1").count() == 10) // untouched survives
    assert(back.filter(col("day") === "d2").count() == 5)  // replaced, not appended
    assert(back.filter(col("day") === "d2").agg(min("id")).head().getLong(0) == 500L)
  }

  test("readJsonlQuarantine isolates malformed lines instead of nulling or failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-dirty")
    java.nio.file.Files.writeString(dir.resolve("part.jsonl"),
      "{\"id\": 1, \"v\": 2.5}\n" +
        "{\"id\": 2 \"v\": BROKEN\n" +
        "\n" +          // blank line: a non-record, dropped (as read.json does)
        "   \n" +       // whitespace-only: same
        "null\n" +      // parses to no struct: corrupt, not a phantom row
        "{\"id\": 3, \"v\": 7.0}\n")
    val df = Sources.readJsonlQuarantine(spark, dir.toString, "id int, v double")
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.select("id").collect().map(_.getInt(0)).toSet == Set(1, 3))
    // quarantined rows carry the raw line for a replay/debug sink
    val rawLines = bad.select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(rawLines.exists(_.contains("BROKEN")) && rawLines.contains("null"))
    assert(bad.collect().forall(_.isNullAt(0))) // schema fields stay null on bad rows
  }

  test("readJsonl with explicit schema") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("data.json"), """{"id":1,"v":2.5}""" + "\n" + """{"id":2,"v":3.5}""" + "\n")
    val df = Sources.readJsonl(spark, dir.toString, "id int, v double")
    assert(df.agg(sum("v")).head().getDouble(0) == 6.0)
  }

  test("writePartitioned prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").resolve("t").toString
    val df = spark.range(100).toDF("id")
      .withColumn("part", col("id") % 4)
    Sources.writePartitioned(df, dir, Seq("part"))
    val pruned = spark.read.parquet(dir).filter(col("part") === 2)
    assert(pruned.count() == 25)
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filters reach the scan node rather than a post-filter
    assert(scan.contains("PartitionFilters") || pruned.inputFiles.length <= 1,
      s"expected pruned scan, got:\n$scan")
  }

  test("bucketed tables join WITHOUT a shuffle on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS bucket_a")
    spark.sql("DROP TABLE IF EXISTS bucket_b")
    val a = spark.range(1000).toDF("k").withColumn("va", col("k") * 2)
    val b = spark.range(1000).toDF("k").withColumn("vb", col("k") + 1)
    Sources.writeBucketed(a, "bucket_a", Seq("k"), 4)
    Sources.writeBucketed(b, "bucket_b", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucket_a")
      spark.sql("DROP TABLE IF EXISTS bucket_b")
    }
  }

  private def parquetDataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compact collapses a many-small-file directory to the size-planned count") {
    val root = Files.createTempDirectory("graft-compact")
    val in = root.resolve("in").toString
    val out = root.resolve("out").toString
    // 64 deliberately tiny files
    spark.range(20000).toDF("id").withColumn("payload", md5(col("id").cast("string")))
      .repartition(64).write.parquet(in)
    assert(parquetDataFiles(in).size == 64)
    val totalBytes = Sources.dataFileBytes(spark, in)
    val target = totalBytes / 3 // plan should land on ceil(total/target) = 3..4 files
    val planned = Sources.compact(spark, in, out, target)
    assert(planned == ((totalBytes + target - 1) / target).toInt)
    assert(parquetDataFiles(out).size == planned)
    assert(planned < 64)
    // content preserved exactly
    val a = spark.read.parquet(in); val b = spark.read.parquet(out)
    assert(b.count() == 20000 && a.exceptAll(b).count() == 0)
  }

  test("fileStatsIndex + pruneFilesByRange: narrow predicates skip most files, results intact") {
    val root = Files.createTempDirectory("graft-skip")
    val path = root.resolve("t").toString
    // range-clustered layout: each file owns a contiguous id band
    spark.range(10000).toDF("id").withColumn("v", col("id") % 97)
      .repartitionByRange(8, col("id")).write.parquet(path)
    val idx = Sources.fileStatsIndex(spark, path, Seq("id", "v"))
    assert(idx.count() == 8)
    assert(idx.columns.toSeq == Seq("file", "n_rows", "min_id", "max_id", "min_v", "max_v"))
    assert(idx.agg(sum("n_rows")).head().getLong(0) == 10000L)
    val files = Sources.pruneFilesByRange(idx, "id", 2000L, 2100L)
    assert(files.size <= 2, s"expected <=2 surviving files, got ${files.size}")
    // reading only surviving files loses no matching rows
    val pruned = spark.read.parquet(files: _*).filter(col("id").between(2000, 2100))
    assert(pruned.count() == 101)
  }

  test("pruneFilesByRange keeps files with null bounds (skip only provably-irrelevant)") {
    val root = Files.createTempDirectory("graft-skip2")
    val path = root.resolve("t").toString
    spark.range(10).toDF("k")
      .withColumn("v", when(col("k") < 5, col("k").cast("double")))
      .repartitionByRange(2, col("k")).write.parquet(path)
    val idx = Sources.fileStatsIndex(spark, path, Seq("v"))
    // the all-null file has null min/max and must survive any range
    assert(Sources.pruneFilesByRange(idx, "v", 100.0, 200.0).size >= 1)
  }

  test("compact floors at one file and refuses in-place rewrites") {
    val root = Files.createTempDirectory("graft-compact2")
    val in = root.resolve("in").toString
    spark.range(10).toDF("id").repartition(5).write.parquet(in)
    val planned = Sources.compact(spark, in, root.resolve("out").toString,
      targetFileBytes = Long.MaxValue)
    assert(planned == 1)
    intercept[IllegalArgumentException] {
      Sources.compact(spark, in, in)
    }
    // an equivalent spelling of the same directory must also be refused
    intercept[IllegalArgumentException] {
      Sources.compact(spark, in, s"file:$in")
    }
  }

  test("readEvolved: added columns merge; a pinned target also widens types") {
    val dir = Files.createTempDirectory("graft-evolve").resolve("t").toString
    // month 1: (id int, v int); month 2 adds a column and widens v
    spark.range(3).selectExpr("CAST(id AS INT) AS id", "CAST(id * 10 AS INT) AS v")
      .write.parquet(dir)
    spark.range(3, 5).selectExpr("CAST(id AS INT) AS id", "CAST(id * 10 AS BIGINT) AS v",
        "CONCAT('tag', id) AS label")
      .write.mode("append").parquet(dir)
    // pinned target: absent columns null out, int32 v files widen to bigint
    val target = Sources.readEvolved(spark, dir, Some("id bigint, v bigint, label string"))
    assert(target.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("id" -> "bigint", "v" -> "bigint", "label" -> "string"))
    assert(target.agg(sum(col("v"))).head().getLong(0) == 100L)
    assert(target.filter(col("label").isNull).count() == 3)
    // no target: mergeSchema handles the added column (types here agree
    // per-column only in the label case — so restrict to a single-typed
    // subdir for the merge path)
    val dir2 = Files.createTempDirectory("graft-evolve2").resolve("t").toString
    spark.range(3).selectExpr("CAST(id AS INT) AS id").write.parquet(dir2)
    spark.range(3, 5).selectExpr("CAST(id AS INT) AS id", "CONCAT('tag', id) AS label")
      .write.mode("append").parquet(dir2)
    val merged = Sources.readEvolved(spark, dir2)
    assert(merged.count() == 5 && merged.filter(col("label").isNull).count() == 3)
  }
}
