package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark plans a naive
  * `p.key = i.key AND i.start <= p.ts AND p.ts <= i.end` as a
  * BroadcastNestedLoopJoin (or worse, a cartesian) — O(|points|·|intervals|)
  * per key. The scale-safe spelling BUCKETIZES time: each interval
  * explodes to the coarse buckets it covers, each point maps to its one
  * bucket, and the join runs as an ordinary hash equi-join on
  * (keys, bucket) with the exact containment predicate as a residual
  * filter. Cost: one shuffle each side on (keys, bucket); pair work is
  * bounded by per-bucket occupancy, tuned by `bucketWidthUs` (≈ the
  * typical interval length keeps the per-interval explosion factor
  * near 1-2).
  *
  * A point lives in exactly one bucket, so no post-join dedup is needed
  * — each (point, interval) match is produced once.
  */
object RangeJoin {

  /** @param points        left side; `ptTsCol` is a timestamp column
    * @param intervals     right side; `[startCol, endCol]` inclusive
    * @param keys          equi-join keys present on both sides
    * @param bucketWidthUs coarse bucket width in microseconds
    *                      (default 1 hour)
    * @param inclusiveEnd  true → containment is start <= pt <= end;
    *                      false → half-open start <= pt < end (the right
    *                      choice when intervals tile adjacently, e.g.
    *                      session windows where end = next start)
    * @param maxSpanBuckets opt-in guard: drop intervals spanning more
    *                      than this many buckets. A single forward
    *                      extreme-span row — a year-9999 "open" sentinel
    *                      end, an epoch-0 start — explodes one row PER
    *                      BUCKET (~70M rows/interval for a 9999-end at
    *                      1-hour buckets), the same corrupt-row hazard
    *                      the reversed-interval pre-filter guards. The
    *                      default `None` keeps every interval: SCD2-style
    *                      open-ended rows (end = 9999-12-31 sentinel) are
    *                      a legitimate pattern and silently dropping them
    *                      would corrupt results. If you opt in with
    *                      `Some(m)`, size `bucketWidthUs` so real
    *                      intervals stay under `m` buckets.
    * @return every (point row ++ interval payload) pair inside the
    *         interval; interval columns are prefixed with `ivPrefix` to
    *         avoid collisions
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptTsCol: String, startCol: String, endCol: String,
      ivPayload: Seq[String],
      bucketWidthUs: Long = 3600L * 1000000,
      ivPrefix: String = "iv_",
      inclusiveEnd: Boolean = true,
      maxSpanBuckets: Option[Long] = None,
  ): DataFrame = {
    require(bucketWidthUs > 0, s"bucketWidthUs must be positive: $bucketWidthUs")
    maxSpanBuckets.foreach(m => require(m > 0, s"maxSpanBuckets must be positive: $m"))
    val w = lit(bucketWidthUs)

    val iv = intervals.select(
        keys.map(col) ++
          Seq(col(startCol).as(s"$ivPrefix$startCol"), col(endCol).as(s"$ivPrefix$endCol")) ++
          ivPayload.map(c => col(c).as(s"$ivPrefix$c")): _*)
      // Reversed intervals (end < start — corrupt rows or swapped
      // columns) are dropped BEFORE the explode: sequence(a, b) with
      // a > b silently generates a descending range, so one corrupt
      // epoch-0/year-9999 end would otherwise explode millions of
      // bucket rows that all die in the residual filter.
      .filter(col(s"$ivPrefix$startCol") <= col(s"$ivPrefix$endCol"))
      // Forward extreme spans (sentinel ends) are dropped by the same
      // logic BEFORE the explode — see maxSpanBuckets above.
      .transform(df => maxSpanBuckets.fold(df)(m => df.filter(
        floor(unix_micros(col(s"$ivPrefix$endCol")) / w) -
          floor(unix_micros(col(s"$ivPrefix$startCol")) / w) <= lit(m))))
      .withColumn("__bucket",
        explode(sequence(
          floor(unix_micros(col(s"$ivPrefix$startCol")) / w),
          floor(unix_micros(col(s"$ivPrefix$endCol")) / w))))

    val pt = points.withColumn("__bucket", floor(unix_micros(col(ptTsCol)) / w))

    val endPred =
      if (inclusiveEnd) col(ptTsCol) <= col(s"$ivPrefix$endCol")
      else col(ptTsCol) < col(s"$ivPrefix$endCol")
    pt.join(iv, keys :+ "__bucket")
      .filter(col(s"$ivPrefix$startCol") <= col(ptTsCol) && endPred)
      .drop("__bucket")
  }

  /** Interval × interval overlap join (the two-sided sibling of
    * [[pointInInterval]]): pairs whose spans intersect under half-open
    * semantics (`aStart < bEnd AND bStart < aEnd` — touching endpoints
    * do NOT overlap, the right contract for adjacent tiling).
    *
    * Both sides explode to coarse time buckets and meet in a hash
    * equi-join on (keys, bucket). An overlapping pair shares every
    * bucket its overlap covers, so matches are restricted to the ONE
    * canonical bucket containing the overlap start
    * (`greatest(aStart, bStart)`) — each pair is emitted exactly once
    * with no post-join `distinct` (a full-output dedup would shuffle
    * the entire result a second time).
    *
    * Same corrupt-row guards as [[pointInInterval]]: reversed intervals
    * and extreme spans are dropped before the explode, on both sides.
    */
  def intervalOverlap(
      a: DataFrame, b: DataFrame,
      keys: Seq[String],
      aStartCol: String, aEndCol: String,
      bStartCol: String, bEndCol: String,
      bPayload: Seq[String],
      bucketWidthUs: Long = 3600L * 1000000,
      bPrefix: String = "b_",
      maxSpanBuckets: Option[Long] = Some(100000L),
  ): DataFrame = {
    require(bucketWidthUs > 0, s"bucketWidthUs must be positive: $bucketWidthUs")
    maxSpanBuckets.foreach(m => require(m > 0, s"maxSpanBuckets must be positive: $m"))
    val w = lit(bucketWidthUs)

    def guarded(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) <= col(e))
        .transform(d => maxSpanBuckets.fold(d)(m => d.filter(
          floor(unix_micros(col(e)) / w) - floor(unix_micros(col(s)) / w) <= lit(m))))
        .withColumn("__bucket", explode(sequence(
          floor(unix_micros(col(s)) / w), floor(unix_micros(col(e)) / w))))

    val bs = s"$bPrefix$bStartCol"
    val be = s"$bPrefix$bEndCol"
    val bSide = guarded(
      b.select(keys.map(col) ++
        Seq(col(bStartCol).as(bs), col(bEndCol).as(be)) ++
        bPayload.map(c => col(c).as(s"$bPrefix$c")): _*), bs, be)
    val aSide = guarded(a, aStartCol, aEndCol)

    aSide.join(bSide, keys :+ "__bucket")
      .filter(col(aStartCol) < col(be) && col(bs) < col(aEndCol))
      .filter(col("__bucket") ===
        floor(unix_micros(greatest(col(aStartCol), col(bs))) / w))
      .drop("__bucket")
  }

  /** Peak concurrency over half-open intervals [start, end) — the
    * sweep-line classic (max simultaneous sessions, peak open orders,
    * connection-pool sizing): each interval contributes a +1 event at
    * start and a −1 at end; the running sum's maximum IS the peak, and
    * the earliest time attaining it is reported with it. Same-instant
    * ties process ends before starts (the half-open convention: a
    * session ending exactly when another starts never overlaps it);
    * zero/negative-length intervals drop. Returns one row per group
    * `(groups..., max_concurrent, at_ts)` — `at_ts` has `startCol`'s
    * type.
    *
    * Determinism: within a (time, delta) tie block the running sum
    * passes through the same value set in any order, and the argmax
    * tie resolves to the earliest time — exact under any partitioning,
    * no quantization needed.
    *
    * Scale shape: grouped → one group-partitioned sort window over the
    * 2× event rows; ungrouped → [[Ids.withRunningTotals]] (range
    * repartition + bounded offset windows), NEVER a whole-frame
    * `Window.orderBy` — the global sweep stays distributed at any
    * event count. One final 1-row (or group-keyed) min-struct rollup.
    */
  def maxConcurrency(df: DataFrame, startCol: Column, endCol: Column,
                     groupBy: Seq[String] = Nil): DataFrame = {
    val gCols = groupBy.map(col)
    val base = df.filter(endCol > startCol)
    val ev = base.select(gCols :+ startCol.as("__t") :+ lit(1L).as("__d"): _*)
      .unionAll(base.select(gCols :+ endCol.as("__t") :+ lit(-1L).as("__d"): _*))
    val best: Column => Column = cum =>
      min(struct((-cum).as("nc"), col("__t").as("t")))
    if (groupBy.isEmpty) {
      val cum = Ids.withRunningTotals(ev, Seq("__t", "__d"), Seq("__d"))
      cum.agg(best(col("__d_cum")).as("__b"))
        .select((-col("__b.nc")).as("max_concurrent"), col("__b.t").as("at_ts"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(gCols: _*).orderBy(col("__t"), col("__d"))
        .rowsBetween(Long.MinValue, 0)
      ev.withColumn("__cum", sum(col("__d")).over(w))
        .groupBy(gCols: _*)
        .agg(best(col("__cum")).as("__b"))
        .select(gCols :+ (-col("__b.nc")).as("max_concurrent")
          :+ col("__b.t").as("at_ts"): _*)
    }
  }
}
