package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series fill / shifted-year operators (W2-W3).
  *
  * The reference implements these driver-side on pandas MultiIndex frames
  * (reference: ons_utils/pandas.py:121-138 `shifted_within_year_apply` /
  * `shifted_within_year_ffill`); here they are distributed window
  * operations: one hash-partition shuffle on the series keys, then
  * partition-local sorted scans — no driver materialization, scales with
  * cluster width.
  */
object Timeseries {

  /** Forward-fill nulls in `valueCols`, per `parts` partition, ordered by
    * `orderCols` (give enough columns for a total order — ties make fill
    * results nondeterministic) — the classic
    * `last(ignoreNulls).over(unboundedPreceding)` frame.
    */
  def ffill(df: DataFrame, parts: Seq[String], orderCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Backward-fill complement of [[ffill]]. */
  def bfill(df: DataFrame, parts: Seq[String], orderCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Trailing-n-rows window per series (the pandas `rolling(n)` frame):
    * current row plus the n-1 preceding, ordered by `orderCols` (total
    * order required for determinism).
    */
  def rollingWindow(parts: Seq[String], orderCols: Seq[String], n: Int) = {
    require(n > 0, s"window size must be positive: $n")
    Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
  }

  /** Rolling mean over the trailing `n` rows (pandas
    * `rolling(n, min_periods=1).mean()` — partial leading windows
    * included). Takes a Column like [[withRollingSum]], so casts (e.g.
    * through decimal for cross-engine exactness) compose.
    */
  def withRollingMean(df: DataFrame, parts: Seq[String], orderCols: Seq[String],
                      value: Column, n: Int, outCol: String): DataFrame =
    df.withColumn(outCol, avg(value).over(rollingWindow(parts, orderCols, n)))

  /** Rolling sum over the trailing `n` rows. For oracle-exact cross-engine
    * comparison route the value through a decimal cast (sliding-window
    * engines reassociate float additions; decimals are associative).
    */
  def withRollingSum(df: DataFrame, parts: Seq[String], orderCols: Seq[String],
                     value: Column, n: Int, outCol: String): DataFrame =
    df.withColumn(outCol, sum(value).over(rollingWindow(parts, orderCols, n)))

  /** The reference's "shifted year": a Feb→Jan+1 fiscal-style year obtained
    * by shifting the timestamp back one month before extracting the year
    * (behavioral equivalent of the pandas shift(-1)/shift(1) sandwich in
    * reference pandas.py:121-133).
    */
  def shiftedYear(ts: Column): Column = year(add_months(ts, -1))

  /** W2 — the generic shifted-year apply (reference pandas.py:121-133
    * `shifted_within_year_apply`): tag each row with its Feb→Jan+1
    * [[shiftedYear]], hand the tagged frame plus the FULL partition
    * column list (series keys + the year tag) to `method`, and drop the
    * tag afterwards. `method` is any per-group transform — fill, impute,
    * normalize — expressed as distributed window/group operations over
    * the given partition columns, so the composition stays one shuffle
    * wide no matter what the method does.
    */
  def shiftedWithinYearApply(df: DataFrame, parts: Seq[String], tsCol: String)(
      method: (DataFrame, Seq[String]) => DataFrame): DataFrame = {
    val tagged = df.withColumn("__shifted_year", shiftedYear(col(tsCol)))
    method(tagged, parts :+ "__shifted_year").drop("__shifted_year")
  }

  /** W3 — forward-fill within the shifted year (reference pandas.py:136-138):
    * the ffill specialization of [[shiftedWithinYearApply]] — fill only
    * propagates inside a (series keys × shifted-year) partition.
    */
  def shiftedWithinYearFfill(
      df: DataFrame,
      parts: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieBreakCols: Seq[String] = Nil,
  ): DataFrame =
    shiftedWithinYearApply(df, parts, tsCol) { (tagged, groups) =>
      ffill(tagged, groups, tsCol +: tieBreakCols, valueCols)
    }

  /** Per-group mean imputation: replace nulls in `valueCols` with the
    * group mean (a common non-fill `method` for
    * [[shiftedWithinYearApply]]). Window aggregation, not a join — one
    * shuffle on the group keys.
    */
  def meanImpute(df: DataFrame, parts: Seq[String], valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, coalesce(col(c), avg(col(c)).over(w))))
  }

  /** Rolling z-score anomaly flags: annotate each row with the trailing-n
    * mean/std of `value` within its series and flag rows whose |z|
    * exceeds `z` — the drift/outage tripwire for metric streams (and the
    * per-series sibling of [[Outliers]]' whole-column fences).
    *
    * Determinism across engines: the rolling moments go through exact
    * decimal sums (sum/sum-of-squares are associative in decimal, so
    * window-frame evaluation order can't change them), then ONE cast to
    * double and IEEE-exact arithmetic (div/mul/sub/sqrt) — bit-equal in
    * any IEEE-754 engine evaluating the same expression tree, no libm
    * involved. Scale: one hash shuffle on the series keys; the window
    * scan is partition-local. Rows with fewer than `minPeriods`
    * observations (or zero variance) get null z and never flag.
    */
  def flagAnomalies(
      df: DataFrame,
      parts: Seq[String],
      orderCols: Seq[String],
      value: Column,
      n: Int,
      z: Double,
      minPeriods: Int = 2,
  ): DataFrame = {
    require(n > 1, s"window size must exceed 1: $n")
    require(minPeriods >= 2, "minPeriods must be at least 2 (std needs two points)")
    require(z > 0, s"z threshold must be positive: $z")
    val internal = Seq("__an_c1", "__an_c2", "__an_cn")
    Guards.requireNoReservedNames(df,
      Seq("roll_mean", "roll_std", "zscore", "is_anomaly") ++ internal, "flagAnomalies")
    // Trailing-frame moments as DIFFERENCES of running prefix sums:
    // Spark re-aggregates a bounded sliding frame from scratch per row
    // (O(n) each), while the cumulative frame is incremental (O(1)) and
    // lag is free — decimal prefix sums are exact, so cum(i) - cum(i-n)
    // IS the trailing-n sum, bit-for-bit. Both Window nodes share one
    // exchange + sort (same partitioning and ordering).
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val wCum = Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
    val cumed = df
      .withColumn("__an_c1", sum(value.cast(dec)).over(wCum))
      .withColumn("__an_c2", sum((value * value).cast(dec)).over(wCum))
      .withColumn("__an_cn", count(value).over(wCum))
    val cnt = col("__an_cn") - coalesce(lag(col("__an_cn"), n).over(wLag), lit(0L))
    val s1 = (col("__an_c1") - coalesce(lag(col("__an_c1"), n).over(wLag),
      lit(java.math.BigDecimal.ZERO).cast(org.apache.spark.sql.types.DecimalType(38, 10)))).cast("double")
    val s2 = (col("__an_c2") - coalesce(lag(col("__an_c2"), n).over(wLag),
      lit(java.math.BigDecimal.ZERO).cast(org.apache.spark.sql.types.DecimalType(38, 10)))).cast("double")
    val mean = s1 / cnt
    val variance = greatest((s2 - s1 * s1 / cnt) / cnt, lit(0.0))
    val std = sqrt(variance)
    val zc = when(cnt >= minPeriods && std > 0, (value - mean) / std)
    cumed
      .withColumn("roll_mean", mean)
      .withColumn("roll_std", std)
      .withColumn("zscore", zc)
      .withColumn("is_anomaly", coalesce(abs(zc) > z, lit(false)))
      .drop(internal: _*)
  }

  /** Floor a timestamp onto a fixed `stepSeconds` grid (microsecond
    * arithmetic — exact, no timezone round-trip).
    */
  def timeBucket(ts: Column, stepSeconds: Long): Column =
    timestamp_micros((floor(unix_micros(ts) / (stepSeconds * 1000000L)) *
      (stepSeconds * 1000000L)).cast("long"))

  /** Resample each series onto a regular `stepSeconds` grid with gap
    * filling — the pandas `resample().agg().ffill()` pipeline as three
    * co-partitioned distributed stages:
    *
    *  1. aggregate observations per (series, bucket) with caller-supplied
    *     aggregates (`aggs` must carry explicit aliases);
    *  2. build each series' dense grid — `sequence(min, max, step)` per
    *     series, exploded; grid SIZE scales with span/step, rows never
    *     re-shuffle because min/max ride the same groupBy;
    *  3. left-join observations onto the grid (same (series, bucket)
    *     partitioning) and forward-fill the aggregate columns; empty
    *     buckets are flagged `is_gap`.
    *
    * All three shuffles hash on the series keys, so AQE coalesces them
    * onto one layout; no global sort anywhere. At 100 TB the only hazard
    * is a pathological span/step ratio (one series spanning years at
    * 1-second steps explodes its grid) — size `stepSeconds` to the span,
    * same contract as [[graft.ops.RangeJoin.pointInInterval]] bucketing.
    */
  def resampleGapFill(df: DataFrame, parts: Seq[String], tsCol: String,
                      stepSeconds: Long, aggs: Seq[Column]): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    require(parts.nonEmpty, "need at least one series key")
    val reserved = Seq("__bucket", "bucket_ts", "is_gap")
    Guards.requireNoReservedNames(df, reserved, "resampleGapFill")
    val bucketed = df.withColumn("__bucket", timeBucket(col(tsCol), stepSeconds))
    val observed = bucketed.groupBy((parts :+ "__bucket").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val aggNames = observed.columns.diff(parts :+ "__bucket")
    // caller-supplied agg aliases become columns beside ours: same rules
    Guards.requireNoReserved(aggNames, reserved ++ parts, "resampleGapFill aggregate alias")
    val grid = bucketed.groupBy(parts.map(col): _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
      .select((parts.map(col) :+ explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECOND"))).as("__bucket")): _*)
    val joined = grid.join(observed, parts :+ "__bucket", "left")
      .withColumn("is_gap", aggNames.map(col(_).isNull).reduce(_ && _))
    ffill(joined, parts, Seq("__bucket"), aggNames)
      .withColumnRenamed("__bucket", "bucket_ts")
  }

  /** Exponentially-weighted moving average with α = 1/2, EXACT — the
    * recency-weighted feature (engagement decay, EW baselines) in the
    * repo's rational-arithmetic form (same doctrine as the integer
    * PageRank: no float recurrence, so the result is bit-identical on
    * any engine and any partitioning).
    *
    * pandas `ewm(alpha=0.5, adjust=True)` semantics over each series'
    * observation INDEX t (gaps don't decay extra):
    *
    *   ewma_t = Σ_{i<=t} 2^{-(t-i)} x_i / Σ_{i<=t} 2^{-(t-i)}
    *          = S_t / (2^{t+1} − 1),   S_t = Σ_{i<=t} c_i·2^i
    *
    * with `c_i` the integer `centsCol`. S_t is an exact long prefix sum
    * (one window, partition-local); the one division happens in double —
    * a single correctly-rounded IEEE op. Exactness holds while
    * S_t < 2^53 (≈ c_max·2^{t+1}), so series are capped at
    * `maxLength` observations — long, unbounded-decay series should
    * bucket time coarser or chunk (the raise is per-row and explicit,
    * never a silent wrap; ANSI mode would catch the long overflow too).
    *
    * @param centsCol integer observations (pre-scale doubles with
    *                 `round(x·100)` — see the q_corr convention)
    * @return input + (out) double column, `out` in `centsCol` units
    */
  def ewmaHalf(df: DataFrame, parts: Seq[String], orderCols: Seq[String],
               centsCol: String, out: String = "ewma",
               maxLength: Int = 36): DataFrame = {
    require(parts.nonEmpty, "need at least one series key")
    require(maxLength >= 1 && maxLength <= 44,
      s"maxLength must be in [1, 44] (2^45 cents overflows the exact window): $maxLength")
    Guards.requireNoReservedNames(df, Seq(out, "__t", "__s"), "ewmaHalf")
    val wo = Window.partitionBy(parts.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__t", row_number().over(wo) - 1)
      .withColumn("__t",
        when(col("__t") >= maxLength, raise_error(concat(
          lit(s"ewmaHalf: series "), concat_ws(",", parts.map(col): _*),
          lit(s" exceeds maxLength=$maxLength observations"))))
          .otherwise(col("__t")))
      .withColumn("__s",
        sum(call_function("shiftleft", col(centsCol).cast("long"), col("__t")))
          .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(out, col("__s").cast("double") /
        (call_function("shiftleft", lit(1L), col("__t") + 1) - 1).cast("double"))
      .drop("__t", "__s")
  }

  /** Multiplicative seasonal factors per series — the classic
    * ratio-to-mean decomposition (the CPI domain's seasonal-adjustment
    * primer step): for each series (`parts`) and each seasonal bucket
    * (day-of-week, month-of-year — any CALLER-SUPPLIED bucket
    * expression, so calendar semantics stay in one visible place), the
    * bucket's mean value over the series mean. Factor > 1 = the bucket
    * runs hot. Returns `parts :+ (bucket, n, bucket_mean, factor)`.
    *
    * Determinism: values micro-quantize per row; bucket sums/counts are
    * exact longs, the series totals are SUMS OF THE BUCKET SUMS (one
    * series-keyed window over the bucket-level frame — bounded by
    * bucket count, never a data-sized window), and each emitted number
    * is a fixed sequence of IEEE double divisions on exact integers,
    * rounded to 6 dp.
    *
    * Scale shape: ONE shuffle keyed (parts, bucket) reduces the scan to
    * a bucket-level frame (series × buckets rows); the series-total
    * window rides that tiny frame. A 100 TB event history costs one
    * map-side-combined aggregation.
    */
  def seasonalFactors(df: DataFrame, parts: Seq[String], bucket: Column,
                      value: Column): DataFrame = {
    require(parts.nonEmpty, "need at least one series key")
    val byBucket = df
      .groupBy(parts.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(value * lit(1e6), 0).cast("long")).as("__sm"))
    val ws = Window.partitionBy(parts.map(col): _*)
    val bucketMean = col("__sm").cast("double") / col("n").cast("double")
    val seriesMean =
      sum(col("__sm")).over(ws).cast("double") / sum(col("n")).over(ws).cast("double")
    byBucket
      .select(parts.map(col) ++ Seq(
        col("bucket"), col("n"),
        round(bucketMean / lit(1e6), 6).as("bucket_mean"),
        round(bucketMean / seriesMean, 6).as("factor")): _*)
  }

  /** Per-series autocorrelation function at lags 1..maxLag — the
    * seasonality/persistence screen (does yesterday predict today? is
    * there a weekly cycle?) run before any forecasting model:
    *
    *   r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
    *
    * with the SERIES mean in both factors (the standard ACF estimator —
    * denominators don't re-center per lag). Returns one row per
    * (series, lag): `(parts..., lag, n_pairs, acf)`, 6 dp.
    *
    * Determinism: values micro-quantize to longs; clearing the x̄
    * fractions by n² turns each r_k into a ratio of exact DECIMAL(38,0)
    * integer sums,
    *
    *   n²·num_k = n²·Σ x_t x_{t−k} − n·S·(H_k + T_k) + (n−k)·S²
    *   n²·den   = n·(n·Σx² − S²)
    *
    * (S = Σx; H_k/T_k the head/tail partial sums over the aligned
    * pairs), so the double division at the end is the only IEEE step.
    *
    * Scale shape: all maxLag lag() windows share ONE series-keyed
    * exchange and sort; one map-combined aggregation per series; the
    * per-lag unpivot is arrayexplode over maxLag elements. No joins, no
    * whole-frame window — safe at any series count, with per-series
    * length only bounding the sort (the usual long-series caveat).
    */
  /** Tabular CUSUM changepoint screen per series — Page's test, the
    * standard "did the mean shift?" monitor for pipelines (ingest rate,
    * quality score, revenue): with target μ = the series mean and
    * allowance k,
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k))
    *   S⁻_t = max(0, S⁻_{t−1} + (μ − x_t − k))
    *
    * alarm when either exceeds h. The recursion LOOKS sequential, but
    * obeys the prefix identity  S⁺_t = P_t − min(0, min_{j≤t} P_j)
    * with P_t = Σ_{i≤t}(x_i − μ − k) — so it is two windows (prefix
    * sum + running min) over one series-keyed exchange, not a
    * per-series sequential scan.
    *
    * Determinism: x micro-quantizes; μ = S/n is kept RATIONAL by
    * clearing denominators (everything scales by n in DECIMAL(38,0)),
    * so P, the running min, and both CUSUM numerators are exact
    * integers; the only IEEE steps are the final /n/1e6 and the
    * h-comparison. Alarm is therefore exactly reproducible — no
    * accumulated float drift, which plagues naive CUSUM ports.
    *
    * Scale shape: four windows (count/sum unbounded + two ordered
    * prefixes) all PARTITIONED BY the series keys, sharing one
    * exchange; no joins, no whole-frame window.
    *
    * @param k allowance (slack) in value units — typically σ/2
    * @param h decision threshold in value units — typically 4-5σ
    * @param targetMean fixed μ instead of the series mean — the control
    *        target a production chart (and the streaming twin
    *        [[graft.streaming.Streaming.cusumStateful]]) runs against;
    *        None = center on the series mean (two windows, one pass)
    * @return input columns + (cusum_plus, cusum_minus, cusum_alarm)
    */
  def cusum(df: DataFrame, parts: Seq[String], orderCol: Column,
            valueCol: Column, k: Double, h: Double,
            targetMean: Option[Double] = None): DataFrame = {
    require(parts.nonEmpty, "cusum needs series keys")
    require(k >= 0.0 && h > 0.0, s"need k >= 0 and h > 0: k=$k h=$h")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = round(valueCol * lit(1e6), 0).cast("long").cast(dec)
    val kMicros = lit(math.round(k * 1e6)).cast(dec)
    val wAll = Window.partitionBy(parts.map(col): _*)
    val wOrd = wAll.orderBy(orderCol)
    val wCum = wOrd.rowsBetween(Long.MinValue, 0)
    val n = count(lit(1)).over(wAll).cast(dec)
    val s = sum(x).over(wAll)
    val t = row_number().over(wOrd).cast(dec)
    val cum = sum(x).over(wCum)
    // n-cleared prefix walks: P⁺ = n·Σx_i − t·(S + n·k), P⁻ mirrored
    // (a fixed target needs no clearing — μ is already integral micros).
    // Materialized before the running-min pass (window-over-window is
    // not one projection); both passes share the series exchange.
    val reserved = Seq("__cp_p", "__cp_m", "__cp_n")
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved names: ${reserved.mkString(", ")}")
    val pre = targetMean match {
      case Some(m) =>
        val tM = lit(math.round(m * 1e6)).cast(dec)
        df.withColumn("__cp_p", cum - t * (tM + kMicros))
          .withColumn("__cp_m", t * (tM - kMicros) - cum)
          .withColumn("__cp_n", lit(1L).cast(dec))
      case None =>
        df.withColumn("__cp_p", n * cum - t * (s + n * kMicros))
          .withColumn("__cp_m", t * (s - n * kMicros) - n * cum)
          .withColumn("__cp_n", n)
    }
    def cusumCol(p: Column): Column = {
      val runMin = min(p).over(wCum)
      round((p - least(lit(0).cast(dec), runMin)).cast("double")
        / col("__cp_n").cast("double") / lit(1e6), 6)
    }
    val cp = cusumCol(col("__cp_p"))
    val cm = cusumCol(col("__cp_m"))
    pre
      .withColumn("cusum_plus", cp)
      .withColumn("cusum_minus", cm)
      .withColumn("cusum_alarm", col("cusum_plus") > h || col("cusum_minus") > h)
      .drop(reserved: _*)
  }

  def autocorrelation(df: DataFrame, parts: Seq[String], orderCol: Column,
                      valueCol: Column, maxLag: Int): DataFrame = {
    require(parts.nonEmpty, "autocorrelation needs series keys")
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val q = round(valueCol * lit(1e6), 0).cast("long")
    val base = df.select(pCols :+ orderCol.as("__o") :+ q.as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base.select(
      pCols :+ col("__x")
        :++ (1 to maxLag).map(k => lag(col("__x"), k).over(w).as(s"__l$k")): _*)
    val perLagAggs = (1 to maxLag).flatMap { k =>
      val lk = col(s"__l$k")
      Seq(
        sum(when(lk.isNotNull, col("__x").cast(dec) * lk.cast(dec))).as(s"__sxy$k"),
        sum(when(lk.isNotNull, col("__x").cast(dec))).as(s"__h$k"),
        sum(when(lk.isNotNull, lk.cast(dec))).as(s"__t$k"),
        sum(when(lk.isNotNull, 1L).otherwise(0L)).as(s"__np$k"))
    }
    val seriesAggs = Seq(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
    val aggs = seriesAggs ++ perLagAggs
    val agg = lagged.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    // unpivot to (lag, n_pairs, acf) rows
    val lagStructs = array((1 to maxLag).map { k =>
      struct(lit(k).as("lag"),
        coalesce(col(s"__np$k"), lit(0L)).as("np"),
        col(s"__sxy$k").as("sxy"), col(s"__h$k").as("h"), col(s"__t$k").as("tl"))
    }: _*)
    val nDec = col("__n").cast(dec)
    val num = (nDec * nDec * col("__e.sxy")
      - nDec * col("__s") * (col("__e.h") + col("__e.tl"))
      + (nDec - col("__e.lag").cast(dec)) * col("__s") * col("__s")).cast("double")
    val den = (nDec * (nDec * col("__sxx") - col("__s") * col("__s"))).cast("double")
    agg
      .select(pCols :+ col("__n") :+ col("__s") :+ col("__sxx")
        :+ explode(lagStructs).as("__e"): _*)
      .select(
        pCols :+ col("__e.lag").as("lag") :+ col("__e.np").as("n_pairs")
          :+ when(col("__e.np") >= 2 && den > 0.0, round(num / den, 6))
            .as("acf"): _*)
  }

  /** Wald-Wolfowitz runs test — randomness judged on the SEQUENCE of
    * above/below-median flags (where [[turningPointTest]] judges local
    * shape): too few runs means clustering/trend, too many means
    * alternation. Per series: `(parts..., n, n_above, n_below, runs,
    * z)` with
    *
    *   E[R] = 2·n₁n₂/n + 1,   Var = 2n₁n₂(2n₁n₂ − n) / (n²(n−1))
    *
    * Rows AT the median drop (the standard convention — a tie has no
    * side); the cut is the exact per-series lower median off the
    * distinct-value table (the [[graft.ops.Stats.moodMedianTest]]
    * machinery, per series). z is null when either side is empty or
    * Var ≤ 0.
    *
    * Determinism: the median is an exact order statistic; run starts
    * are integer comparisons over the series sort; z is one IEEE tree.
    *
    * Scale shape: one distinct-value aggregation + series-bounded
    * cumulative window for the cut, a series-keyed median join
    * (bounded — one row per series), and one ordered window pass for
    * the run starts.
    */
  def runsTest(df: DataFrame, parts: Seq[String], orderCol: Column,
               valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "runsTest needs series keys")
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val pCols = parts.map(col)
    val base = df.select(pCols :+ orderCol.as("__o") :+ q(valueCol).as("__x"): _*)
      .filter(col("__x").isNotNull)
    val byVal = base.groupBy(pCols :+ col("__x"): _*).agg(count(lit(1)).as("__nv"))
    val wCum = Window.partitionBy(pCols: _*).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(pCols: _*)
    val med = byVal
      .withColumn("__cum", sum(col("__nv")).over(wCum))
      .withColumn("__N", sum(col("__nv")).over(wAll))
      .filter(col("__cum") * lit(2L) >= col("__N"))
      .groupBy(pCols: _*).agg(min(col("__x")).as("__med"))
    val signed = base.join(med, parts)
      .filter(col("__x") =!= col("__med"))
      .withColumn("__s", when(col("__x") > col("__med"), 1).otherwise(-1))
    val wOrd = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val withRun = signed.withColumn("__p", lag(col("__s"), 1).over(wOrd))
    val agg = withRun.groupBy(pCols: _*).agg(
      count(lit(1)).as("n"),
      sum(when(col("__s") === 1, 1L).otherwise(0L)).as("n_above"),
      sum(when(col("__s") === -1, 1L).otherwise(0L)).as("n_below"),
      sum(when(col("__p").isNull || col("__p") =!= col("__s"), 1L)
        .otherwise(0L)).as("runs"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val nD = col("n").cast("double")
    val eR = lit(2.0) * n1 * n2 / nD + lit(1.0)
    val vR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nD) /
      (nD * nD * (nD - lit(1.0)))
    val ok = col("n_above") > 0L && col("n_below") > 0L && vR > 0.0
    agg.select(pCols :+ col("n") :+ col("n_above") :+ col("n_below") :+ col("runs")
      :+ when(ok, round((col("runs").cast("double") - eR) / sqrt(vR), 6))
        .as("z"): _*)
  }

  /** Cross-correlation function — which series LEADS: ccf(k) =
    * corr(x_t, y_{t+k}) for k ∈ −maxLag..maxLag, the lead-lag screen
    * before anyone claims causality between two aligned series
    * (marketing→sales, clicks→purchases). Positive k means x leads y.
    * One row per lag: `(parts..., lag, n_pairs, ccf)`; ccf null when
    * a lag has < 2 pairs or either side is constant over its pairs.
    *
    * Determinism: both series micro-quantize; each lag's Pearson
    * moments (5 sums over that lag's complete pairs) are exact decimal
    * accumulations, and each ccf is one IEEE tree — pairwise-complete
    * like [[autocorrelation]], never imputed.
    *
    * Scale shape: one series-keyed exchange shared by all 2·maxLag
    * shift windows, one map-combined per-series aggregation, a
    * lag-bounded explode.
    */
  def crossCorrelation(df: DataFrame, parts: Seq[String], orderCol: Column,
                       xCol: Column, yCol: Column, maxLag: Int): DataFrame = {
    require(parts.nonEmpty, "crossCorrelation needs series keys")
    require(maxLag >= 1 && maxLag <= 24, s"maxLag out of range: $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val pCols = parts.map(col)
    val base = df.select(pCols :+ orderCol.as("__o")
        :+ q(xCol).as("__x") :+ q(yCol).as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lags = (-maxLag to maxLag).filter(_ != 0)
    val shifted = base.select(
      pCols :+ col("__x") :+ col("__y")
        :++ lags.map { k =>
          val c = if (k > 0) lead(col("__y"), k).over(w)
                  else lag(col("__y"), -k).over(w)
          c.as(s"__y$k")
        }: _*)
    def mom(k: Int): Seq[Column] = {
      val yk = if (k == 0) col("__y") else col(s"__y$k")
      val ok = yk.isNotNull
      Seq(
        sum(when(ok, 1L).otherwise(0L)).as(s"__n$k"),
        sum(when(ok, col("__x").cast(dec))).as(s"__sx$k"),
        sum(when(ok, yk.cast(dec))).as(s"__sy$k"),
        sum(when(ok, col("__x").cast(dec) * col("__x").cast(dec))).as(s"__sxx$k"),
        sum(when(ok, yk.cast(dec) * yk.cast(dec))).as(s"__syy$k"),
        sum(when(ok, col("__x").cast(dec) * yk.cast(dec))).as(s"__sxy$k"))
    }
    val allLags = 0 +: lags
    val aggs = allLags.flatMap(mom)
    val agg = shifted.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    val lagStructs = array(allLags.map { k =>
      struct(lit(k).as("lag"), col(s"__n$k").as("n"),
        col(s"__sx$k").as("sx"), col(s"__sy$k").as("sy"),
        col(s"__sxx$k").as("sxx"), col(s"__syy$k").as("syy"),
        col(s"__sxy$k").as("sxy"))
    }: _*)
    val e = agg.select(pCols :+ explode(lagStructs).as("__e"): _*)
    // moment algebra stays exact decimal, cast to double only at the
    // end (the autocorrelation discipline — double-domain n·Σxy would
    // diverge from an integer-domain oracle past 2^53)
    val nDec = col("__e.n").cast(dec)
    val num = (nDec * col("__e.sxy") - col("__e.sx") * col("__e.sy")).cast("double")
    val dx = (nDec * col("__e.sxx") - col("__e.sx") * col("__e.sx")).cast("double")
    val dy = (nDec * col("__e.syy") - col("__e.sy") * col("__e.sy")).cast("double")
    e.select(pCols :+ col("__e.lag").as("lag")
      :+ col("__e.n").as("n_pairs")
      :+ when(col("__e.n") >= 2L && dx > 0.0 && dy > 0.0,
        round(num / sqrt(dx * dy), 6)).as("ccf"): _*)
  }

  /** Newey-West (HAC) standard error of a series mean — the honest
    * uncertainty for an autocorrelated series, where the i.i.d. s/√n
    * understates (positive autocorrelation) or overstates (negative)
    * the truth:
    *
    *   Var(μ̂) = (γ₀ + 2·Σ_{k≤L} (1 − k/(L+1))·γ_k) / n
    *
    * (Bartlett weights — the kernel that keeps the estimate
    * nonnegative). Per series: `(parts..., n, mean, se_iid, se_nw)` —
    * quote se_nw/se_iid as the "effective sample size" deflation.
    * se_nw is null when n ≤ maxLag.
    *
    * Determinism: autocovariance numerators clear the mean exactly —
    * Σ(n·x_t − S)(n·x_{t+k} − S) is an exact decimal sum (the
    * [[autocorrelation]] identity), so γ_k = A_k/n³ and both SEs are
    * fixed IEEE trees; the k-fold over Bartlett weights is a literal
    * fixed-order expression.
    *
    * Scale shape: one series-keyed exchange shared by the lag and
    * whole-series windows, one map-combined per-series aggregation.
    * The exact decimal products bound the contract to rolled-up
    * series (the [[autocorrelation]]/[[graft.ops.Stats.kendallTau]]
    * posture), not raw corpora.
    */
  def neweyWestMeanSe(df: DataFrame, parts: Seq[String], orderCol: Column,
                      valueCol: Column, maxLag: Int): DataFrame = {
    require(parts.nonEmpty, "neweyWestMeanSe needs series keys")
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val pCols = parts.map(col)
    val base = df.select(pCols :+ orderCol.as("__o") :+ q(valueCol).as("__x"): _*)
      .filter(col("__x").isNotNull)
    val wAll = Window.partitionBy(pCols: _*)
    val wOrd = wAll.orderBy(col("__o"))
    val lagged = base.select(
      pCols :+ col("__x")
        :+ count(lit(1)).over(wAll).as("__n")
        :+ sum(col("__x")).over(wAll).as("__S")
        :++ (1 to maxLag).map(k => lag(col("__x"), k).over(wOrd).as(s"__l$k")): _*)
    val nDec = col("__n").cast(dec)
    val sDec = col("__S").cast(dec)
    val cx = nDec * col("__x").cast(dec) - sDec
    val aggs = Seq(
      max(col("__n")).as("n"),
      max(col("__S")).as("__sum"),
      sum(cx * cx).as("__a0")) ++
      (1 to maxLag).map { k =>
        sum(when(col(s"__l$k").isNotNull,
          cx * (nDec * col(s"__l$k").cast(dec) - sDec))).as(s"__a$k")
      }
    val agg = lagged.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    val n3 = nD * nD * nD
    def g(c: String): Column = coalesce(col(c).cast("double"), lit(0.0)) / n3
    val weighted = (1 to maxLag).map { k =>
      lit(1.0 - k.toDouble / (maxLag + 1).toDouble) * g(s"__a$k")
    }.reduce(_ + _)
    val varNw = (g("__a0") + lit(2.0) * weighted) / nD
    val seIid = sqrt(col("__a0").cast("double") /
      (nD * nD * (nD - lit(1.0))) / nD) / lit(1e6)
    val mean = col("__sum").cast("double") / nD / lit(1e6)
    agg.select(pCols :+ col("n")
      :+ round(mean, 6).as("mean")
      :+ when(col("n") >= 2L, round(seIid, 6)).as("se_iid")
      :+ when(col("n") > maxLag && varNw >= 0.0,
        round(sqrt(varNw) / lit(1e6), 6)).as("se_nw"): _*)
  }

  /** Forecast-accuracy scorecard — the five numbers that decide
    * whether a forecast ([[holtLinear]], [[holtWinters]], a seasonal
    * naive, an external model's column) is worth shipping, per series:
    *
    *   MAE, RMSE, sMAPE = mean 2|e|/(|a|+|f|),
    *   MASE = MAE / MAE(lag-1 naive),  U2 = RMSE / RMSE(lag-1 naive)
    *
    * MASE/U2 are the scale-free ones — "is this model better than
    * persistence?" — with the naive denominators computed from the
    * SAME series pass. Returns
    * `(parts..., n, mae, rmse, smape, mase, theil_u2)`; n counts
    * scored rows (actual AND forecast present); rows with a null
    * forecast still feed the naive denominators. sMAPE skips rows
    * where |a|+|f| = 0; nulls where any denominator is empty/zero.
    *
    * Determinism: actual/forecast micro-quantize, so |e|, e², and the
    * naive |Δa|, Δa² are exact integers; each sMAPE ratio
    * nano-quantizes per row before the exact sum; the five outputs
    * are fixed IEEE trees.
    *
    * Scale shape: one series-keyed exchange (the lag window), then one
    * map-combined per-series aggregation.
    */
  def forecastAccuracy(df: DataFrame, parts: Seq[String], orderCol: Column,
                       actual: Column, forecast: Column): DataFrame = {
    require(parts.nonEmpty, "forecastAccuracy needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val pCols = parts.map(col)
    val base = df.select(pCols :+ orderCol.as("__o")
        :+ q(actual).as("__a") :+ q(forecast).as("__f"): _*)
      .filter(col("__a").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val withLag = base.withColumn("__p", lag(col("__a"), 1).over(w))
    val e = col("__a") - col("__f")
    val scored = col("__f").isNotNull
    val den = abs(col("__a")) + abs(col("__f"))
    val smTerm = when(scored && den > 0L,
      round(lit(2.0) * abs(e).cast("double") / den.cast("double") * lit(1e9), 0)
        .cast("long"))
    val d = col("__a") - col("__p")
    val agg = withLag.groupBy(pCols: _*).agg(
      sum(when(scored, 1L).otherwise(0L)).as("n"),
      sum(when(scored, abs(e).cast(dec))).as("__ae"),
      // square in decimal — micro-unit daily aggregates overflow long
      sum(when(scored, e.cast(dec) * e.cast(dec))).as("__se2"),
      sum(smTerm).as("__sm"),
      sum(when(smTerm.isNotNull, 1L).otherwise(0L)).as("__nsm"),
      sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("__nn"),
      sum(when(col("__p").isNotNull, abs(d).cast(dec))).as("__ad"),
      sum(when(col("__p").isNotNull, d.cast(dec) * d.cast(dec))).as("__sd2"))
    val nD = col("n").cast("double")
    val nnD = col("__nn").cast("double")
    val mae = col("__ae").cast("double") / nD / lit(1e6)
    val rmse = sqrt(col("__se2").cast("double") / nD) / lit(1e6)
    val maeN = col("__ad").cast("double") / nnD / lit(1e6)
    val rmseN = sqrt(col("__sd2").cast("double") / nnD) / lit(1e6)
    val hasF = col("n") > 0L
    val hasN = col("__nn") > 0L
    agg.select(pCols :+ col("n")
      :+ when(hasF, round(mae, 6)).as("mae")
      :+ when(hasF, round(rmse, 6)).as("rmse")
      :+ when(col("__nsm") > 0L,
        round(col("__sm").cast("double") / lit(1e9)
          / col("__nsm").cast("double"), 6)).as("smape")
      :+ when(hasF && hasN && maeN > 0.0, round(mae / maeN, 6)).as("mase")
      :+ when(hasF && hasN && rmseN > 0.0, round(rmse / rmseN, 6)).as("theil_u2"): _*)
  }

  /** Turning-point test — the quickest randomness check on a series:
    * count strict local extrema T among interior points; for an i.i.d.
    * series E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, so
    * z = (T − E)/√V flags both over-smooth (too few turns — trend,
    * strong autocorrelation) and over-jagged (too many — negative
    * autocorrelation, alternating artifacts) series. Per series:
    * `(parts..., n, n_turning, z)`; null z when n < 3. Plateaus
    * (ties with a neighbor) are NOT extrema — strict comparisons,
    * documented.
    *
    * Determinism: extremum flags are exact integer comparisons on
    * micro-quantized values; z is one fixed IEEE tree.
    *
    * Scale shape: one series-keyed exchange (lag + lead share the
    * sort), one map-combined per-series aggregation.
    */
  def turningPointTest(df: DataFrame, parts: Seq[String], orderCol: Column,
                       valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "turningPointTest needs series keys")
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val pCols = parts.map(col)
    val base = df.select(pCols :+ orderCol.as("__o") :+ q(valueCol).as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val withN = base
      .withColumn("__pv", lag(col("__x"), 1).over(w))
      .withColumn("__nx", lead(col("__x"), 1).over(w))
    val tp = when(col("__pv").isNotNull && col("__nx").isNotNull &&
      ((col("__x") > col("__pv") && col("__x") > col("__nx")) ||
        (col("__x") < col("__pv") && col("__x") < col("__nx"))), 1L).otherwise(0L)
    val agg = withN.groupBy(pCols: _*)
      .agg(count(lit(1)).as("n"), sum(tp).as("n_turning"))
    val nD = col("n").cast("double")
    val eT = lit(2.0) * (nD - lit(2.0)) / lit(3.0)
    val vT = (lit(16.0) * nD - lit(29.0)) / lit(90.0)
    agg.select(pCols :+ col("n") :+ col("n_turning")
      :+ when(col("n") >= 3L,
        round((col("n_turning").cast("double") - eT) / sqrt(vT), 6)).as("z"): _*)
  }

  /** Page-Hinkley test — sequential mean-INCREASE detector, [[cusum]]'s
    * sibling for the case where the baseline is the series' own RUNNING
    * mean rather than a fixed/global target: per row the walk
    *
    *   m_t = Σ_{i≤t} (x_i − μ̂_i − δ),   PH_t = m_t − min(0, min_{τ≤t} m_τ)
    *
    * alarms when PH_t > λ. The running-mean baseline makes it the
    * streaming-drift default (no training window to pick).
    *
    * Determinism: μ̂_i = S_i/i rounds to integer NANOS per row (the
    * running mean's varying denominator defeats [[cusum]]'s n-cleared
    * trick, so quantize-then-sum replaces clear-then-sum); the walk and
    * its running min are then exact decimal prefix sums under the
    * series sort. PH rounds to 6 dp BEFORE the λ compare, so alarm
    * flags replay exactly.
    *
    * Scale shape: one series-keyed exchange; every window shares its
    * sort (row-frame prefix sums only). Output = input + `(ph,
    * ph_alarm)`.
    */
  def pageHinkley(df: DataFrame, parts: Seq[String], orderCol: Column,
                  valueCol: Column, delta: Double, lambda: Double): DataFrame = {
    require(parts.nonEmpty, "pageHinkley needs series keys")
    require(lambda > 0.0 && delta >= 0.0, s"need lambda > 0, delta >= 0: $lambda/$delta")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val reserved = Seq("__ph_dev", "__ph_m")
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved names: ${reserved.mkString(", ")}")
    val x = round(valueCol * lit(1e6), 0).cast("long")
    val wOrd = Window.partitionBy(parts.map(col): _*).orderBy(orderCol)
    val wCum = wOrd.rowsBetween(Long.MinValue, 0)
    val i = row_number().over(wOrd)
    val s = sum(x).over(wCum)
    val meanNano = round(s.cast("double") * lit(1e3) / i.cast("double"), 0)
      .cast("long")
    val devNano = (x * lit(1000L)) - meanNano - lit(math.round(delta * 1e9))
    val pre = df.withColumn("__ph_dev", devNano.cast(dec))
    val withWalk = pre.withColumn("__ph_m", sum(col("__ph_dev")).over(wCum))
    val runMin = min(col("__ph_m")).over(wCum)
    val ph = round((col("__ph_m") - least(lit(0L).cast(dec), runMin))
      .cast("double") / lit(1e9), 6)
    withWalk
      .withColumn("ph", ph)
      .withColumn("ph_alarm", col("ph") > lambda)
      .drop(reserved: _*)
  }

  /** Ljung-Box portmanteau test — is a series white noise, judged on
    * its first `maxLag` autocorrelations jointly? THE residual check
    * after any smoothing/trend fit ([[holtLinear]], [[cusum]]
    * baselines): per series
    *
    *   Q = n(n+2) · Σ_{k=1..h} ρ_k² / (n−k)
    *
    * compared to χ²(h). Returns `(parts..., n, n_lags, q_lb)`; q_lb is
    * null when any lag's ACF is undefined (constant or too-short
    * series) or n ≤ h.
    *
    * Determinism: builds on [[autocorrelation]]'s exact integer-moment
    * ACF (each ρ_k already a 6-dp double identical across engines);
    * each ρ_k²/(n−k) term nano-quantizes before the h-bounded sum and
    * Q is one fixed IEEE tree. n−k is exactly that lag's pair count,
    * so no separate length pass is needed.
    *
    * Scale shape: [[autocorrelation]]'s one series-keyed window pass +
    * grand aggregation, then a lag-count-bounded rollup per series.
    */
  def ljungBox(df: DataFrame, parts: Seq[String], orderCol: Column,
               valueCol: Column, maxLag: Int): DataFrame = {
    val pCols = parts.map(col)
    val acf = autocorrelation(df, parts, orderCol, valueCol, maxLag)
    val term = round(col("acf") * col("acf") / col("n_pairs").cast("double")
      * lit(1e9), 0).cast("long")
    val agg = acf.groupBy(pCols: _*)
      .agg(max(col("n_pairs") + col("lag")).as("n"),
        count(lit(1)).as("n_lags"),
        sum(when(col("acf").isNotNull, term)).as("__t"),
        sum(when(col("acf").isNull, 1L).otherwise(0L)).as("__bad"))
    val nD = col("n").cast("double")
    val q = nD * (nD + lit(2.0)) * (col("__t").cast("double") / lit(1e9))
    agg.select(pCols :+ col("n") :+ col("n_lags")
      :+ when(col("__bad") === 0L && col("n") > col("n_lags"), round(q, 6))
        .as("q_lb"): _*)
  }

  /** Holt-Winters additive triple smoothing per series — [[holtLinear]]
    * plus a length-`period` seasonal state (the weekly/monthly pattern
    * a level+trend model smears):
    *
    *   l_t = α·(x_t − s_{t−m}) + (1−α)·(l + b)
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b
    *   s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}
    *
    * Initialization is the SIMPLE deterministic one (stated because it
    * is part of the replay contract): l_1 = x_1, b_1 = 0, seasonal
    * slots start at 0 and learn through the γ recursion — after a few
    * cycles the slots converge to the pattern, with no lookahead pass
    * (a mean-of-first-cycle init needs the future). Emits
    * `(parts..., idx, x, level, trend, seasonal, forecast)` with
    * forecast = l + b + s_{next slot}, values as EXACT nano quotients
    * (the [[holtLinear]] half-way-rounding contract).
    *
    * Determinism: all three state components re-round to integer nanos
    * each step inside ONE higher-order fold; α/β/γ must be exact
    * binary fractions. Scale shape: [[holtLinear]]'s — one series-keyed
    * collect to bounded arrays, narrow fold, explode.
    */
  def holtWinters(df: DataFrame, parts: Seq[String], orderCol: Column,
                  value: Column, alpha: Double, beta: Double, gamma: Double,
                  period: Int, maxLength: Int = 10000): DataFrame = {
    require(parts.nonEmpty, "need at least one series key")
    require(period >= 2 && period <= 1000, s"period out of range: $period")
    def exactBinary(v: Double): Boolean = {
      val scaled = v * 256.0
      scaled == math.rint(scaled) && v > 0.0 && v < 1.0
    }
    require(exactBinary(alpha) && exactBinary(beta) && exactBinary(gamma),
      s"alpha/beta/gamma must be exactly binary-representable (k/256): $alpha, $beta, $gamma")
    val pCols = parts.map(col)
    val xNanos = round(value * lit(1e9), 0).cast("long")
    val series = df
      .select(pCols :+ struct(orderCol.as("o"), xNanos.as("x")).as("__e"): _*)
      .filter(col("__e.x").isNotNull && col("__e.o").isNotNull)
      .groupBy(pCols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__s"))
      .withColumn("__s",
        when(size(col("__s")) > maxLength, raise_error(concat(
          lit(s"holtWinters: series "), concat_ws(",", pCols: _*),
          lit(s" exceeds maxLength=$maxLength observations"))))
          .otherwise(col("__s")))
    val rowType =
      "array<struct<idx:int,x:bigint,level:bigint,trend:bigint,seasonal:bigint,forecast:bigint>>"
    val zeroSeas = array_repeat(lit(0.0), period)
    val zero = struct(lit(0.0).as("l"), lit(0.0).as("b"),
      zeroSeas.as("seas"), array().cast(rowType).as("rows"))
    val folded = series.withColumn("__f",
      aggregate(transform(col("__s"), e => e.getField("x")), zero, (acc, x) => {
        val n = size(acc.getField("rows"))
        val first = n === 0
        val xd = x.cast("double")
        val l = acc.getField("l"); val b = acc.getField("b")
        val slot = pmod(n, lit(period))
        val sOld = try_element_at(acc.getField("seas"), (slot + 1).cast("int"))
        val lNew = when(first, xd)
          .otherwise(round(lit(alpha) * (xd - sOld) + lit(1.0 - alpha) * (l + b), 0))
        val bNew = when(first, lit(0.0))
          .otherwise(round(lit(beta) * (lNew - l) + lit(1.0 - beta) * b, 0))
        val sNew = round(lit(gamma) * (xd - lNew) + lit(1.0 - gamma) * sOld, 0)
        val seasNew = transform(acc.getField("seas"),
          (v, i) => when(i === slot, sNew).otherwise(v))
        val nextSlot = pmod(n + 1, lit(period))
        val fc = lNew + bNew + try_element_at(seasNew, (nextSlot + 1).cast("int"))
        struct(lNew.as("l"), bNew.as("b"), seasNew.as("seas"),
          concat(acc.getField("rows"), array(struct(
            (n + 1).as("idx"), x.as("x"),
            lNew.cast("long").as("level"), bNew.cast("long").as("trend"),
            sNew.cast("long").as("seasonal"), fc.cast("long").as("forecast"))))
            .as("rows"))
      }))
    folded
      .select(pCols :+ explode(col("__f.rows")).as("__r"): _*)
      .select(pCols ++ Seq(
        col("__r.idx").as("idx"),
        (col("__r.x").cast("double") / lit(1e9)).as("x"),
        (col("__r.level").cast("double") / lit(1e9)).as("level"),
        (col("__r.trend").cast("double") / lit(1e9)).as("trend"),
        (col("__r.seasonal").cast("double") / lit(1e9)).as("seasonal"),
        (col("__r.forecast").cast("double") / lit(1e9)).as("forecast")): _*)
  }

  /** Holt double-exponential smoothing per series — the level+trend
    * forecaster one notch above [[ewmaHalf]] (EWMA lags a trending
    * series forever; Holt's trend state closes the gap), the classic
    * short-horizon capacity/revenue projector:
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = x_1, b_1 = 0
    *
    * Emits one row per observation `(parts..., idx, x, level, trend,
    * forecast)` with forecast = l_t + b_t (the one-step-ahead). Outputs
    * are the EXACT nano states divided once by 1e9 — deliberately NOT
    * 6-dp rounded: binary-fraction α/β park the state on ...500-nano
    * half-way points where decimal-vs-binary rounding disagrees across
    * engines, while the raw quotient of identical integers is the
    * identical double everywhere.
    *
    * Determinism: the recursion runs inside ONE higher-order `aggregate`
    * fold per series with the state re-rounded to integer NANOS after
    * every step — both engines walk identical integer states, so the
    * sequential recurrence replays exactly (the q_cusum discipline,
    * applied to a two-component state). α and β must be exactly
    * binary-representable (1/4, 1/8, 3/8...) so that α and 1−α are the
    * SAME doubles in any engine's literal parser — enforced.
    *
    * Scale shape: one series-keyed map-combined collect to a bounded
    * per-series array (the [[graft.ops.Stats.kendallTau]] bounded-group
    * contract — panels, daily aggregates; `maxLength` makes the bound
    * explicit and the failure loud), then the fold is narrow per-series
    * compute and the explode restores rows. ONE exchange total.
    */
  def holtLinear(df: DataFrame, parts: Seq[String], orderCol: Column,
                 value: Column, alpha: Double, beta: Double,
                 maxLength: Int = 10000): DataFrame = {
    require(parts.nonEmpty, "need at least one series key")
    def exactBinary(v: Double): Boolean = {
      val scaled = v * 256.0
      scaled == math.rint(scaled) && v > 0.0 && v < 1.0
    }
    require(exactBinary(alpha) && exactBinary(beta),
      s"alpha/beta must be exactly binary-representable in (0,1) (k/256): got $alpha, $beta")
    val pCols = parts.map(col)
    val xNanos = round(value * lit(1e9), 0).cast("long")
    val series = df
      .select(pCols :+ struct(orderCol.as("o"), xNanos.as("x")).as("__e"): _*)
      .filter(col("__e.x").isNotNull && col("__e.o").isNotNull)
      .groupBy(pCols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__s"))
      .withColumn("__s",
        when(size(col("__s")) > maxLength, raise_error(concat(
          lit(s"holtLinear: series "), concat_ws(",", pCols: _*),
          lit(s" exceeds maxLength=$maxLength observations"))))
          .otherwise(col("__s")))
    val rowType = "array<struct<idx:int,x:bigint,level:bigint,trend:bigint>>"
    val zero = struct(lit(0.0).as("l"), lit(0.0).as("b"),
      array().cast(rowType).as("rows"))
    val folded = series.withColumn("__f",
      aggregate(transform(col("__s"), e => e.getField("x")), zero, (acc, x) => {
        val first = size(acc.getField("rows")) === 0
        val xd = x.cast("double")
        val l = acc.getField("l"); val b = acc.getField("b")
        val lNew = when(first, xd)
          .otherwise(round(lit(alpha) * xd + lit(1.0 - alpha) * (l + b), 0))
        val bNew = when(first, lit(0.0))
          .otherwise(round(lit(beta) * (lNew - l) + lit(1.0 - beta) * b, 0))
        struct(lNew.as("l"), bNew.as("b"),
          concat(acc.getField("rows"), array(struct(
            (size(acc.getField("rows")) + 1).as("idx"), x.as("x"),
            lNew.cast("long").as("level"), bNew.cast("long").as("trend"))))
            .as("rows"))
      }))
    folded
      .select(pCols :+ explode(col("__f.rows")).as("__r"): _*)
      .select(pCols ++ Seq(
        col("__r.idx").as("idx"),
        (col("__r.x").cast("double") / lit(1e9)).as("x"),
        (col("__r.level").cast("double") / lit(1e9)).as("level"),
        (col("__r.trend").cast("double") / lit(1e9)).as("trend"),
        ((col("__r.level") + col("__r.trend")).cast("double") / lit(1e9))
          .as("forecast")): _*)
  }

  /** Single change-point detection per series — the binary-segmentation
    * base step (and the offline answer to [[cusum]]'s online alarm):
    * WHERE did the level shift? For the ordered series x_1..x_n with
    * prefix sums S_k, the split k* maximizes the CUSUM deviation
    *
    *   D_k = |n·S_k − k·S_n|,   1 ≤ k < n
    *
    * (that is |S_k − (k/n)·S_n| scaled by n — kept as an EXACT integer
    * so the argmax never touches a float; ties break to the smallest k).
    * Returns one row per group: `(parts…, n, split_idx, split_at,
    * cusum_max, mean_before, mean_after, shift)` — cusum_max is the
    * maximized D divided by n (value units), means on each side of the
    * split, shift = after − before. Groups with n < 2 survive with null
    * split columns
    * (the [[graft.ops.Stats.kendallTau]] 1-row-group lesson).
    *
    * `orderCol` must be unique within a group (a time bucket, an index);
    * `__x` is a documented secondary sort so exact duplicates still
    * order deterministically.
    *
    * Scale shape: one group-partitioned ordered window for prefix sums,
    * a group-keyed count join, and an argmax window over the same
    * partitioning — no whole-frame work, no driver state.
    */
  def changepoint(df: DataFrame, parts: Seq[String], orderCol: Column,
                  value: Column): DataFrame = {
    require(parts.nonEmpty, "changepoint needs partition keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(pCols
        :+ orderCol.as("__o")
        :+ round(value * lit(1e6), 0).cast(dec).as("__x"): _*)
      .filter(col("__x").isNotNull && col("__o").isNotNull)
    val counts = base.groupBy(pCols: _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__S"))
    val wOrd = Window.partitionBy(pCols: _*).orderBy(col("__o"), col("__x"))
    val pre = base.select(pCols ++ Seq(col("__o"),
      row_number().over(wOrd).cast("long").as("__k"),
      sum(col("__x")).over(wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("__sk")): _*)
    val cand = pre.join(counts, parts)
      .filter(col("__k") < col("n"))
      .withColumn("__d",
        abs(col("n").cast(dec) * col("__sk") - col("__k").cast(dec) * col("__S")))
    val wBest = Window.partitionBy(pCols: _*)
      .orderBy(col("__d").desc, col("__k"))
    val best = cand.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
    val mb = col("__sk").cast("double") / col("__k").cast("double") / lit(1e6)
    val ma = (col("__S") - col("__sk")).cast("double")
      ./((col("n") - col("__k")).cast("double")) / lit(1e6)
    counts.join(
        best.select(pCols ++ Seq(col("__k"), col("__o").as("split_at"),
          round(col("__d").cast("double") / col("n").cast("double") / lit(1e6), 6)
            .as("cusum_max"),
          round(mb, 6).as("mean_before"), round(ma, 6).as("mean_after"),
          round(ma - mb, 6).as("shift")): _*),
        parts, "left")
      .select(pCols ++ Seq(col("n"), col("__k").as("split_idx"),
        col("split_at"), col("cusum_max"), col("mean_before"),
        col("mean_after"), col("shift")): _*)
  }

  /** Wald's sequential probability ratio test (SPRT) over an ordered
    * Bernoulli stream — the always-monitoring answer to "when can the
    * experiment STOP?" that a fixed-horizon [[graft.ops.Stats.twoProportionZ]]
    * can't give without alpha-spending. Per group, observations
    * accumulate in `orderCol` order (pre-bucketed: each row carries
    * `trials` and `successes` for its bucket) and the log-likelihood
    * ratio of H1: p = p1 vs H0: p = p0 is
    *
    *   LLR_n = s_n·ln(p1/p0) + (n_n − s_n)·ln((1−p1)/(1−p0))
    *
    * with Wald's thresholds A = ln((1−β)/α) (decide H1, effect present)
    * and B = ln(β/(1−α)) (decide H0). Emits one row per bucket:
    * `(parts…, t, n_cum, s_cum, llr, state, first_h1_idx,
    * first_h0_idx)` — `t` the order value, `state` the instantaneous region, the first-
    * crossing indices prefix-minima (null until a crossing), so the
    * sticky decision is the smaller of the two.
    *
    * Determinism: counts are exact longs; the two log constants are
    * computed ONCE on the JVM and injected as literals (ln never runs on
    * data — the integer-argument doctrine's sequential sibling), so
    * LLR is the fixed tree s·L1 + (n−s)·L0 every engine replays.
    *
    * Scale shape: one group-partitioned ordered prefix window — the
    * same plan as a cumulative sum; nothing global, nothing iterative.
    */
  def sprtBernoulli(df: DataFrame, parts: Seq[String], orderCol: Column,
                    trials: Column, successes: Column,
                    p0: Double, p1: Double,
                    alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(parts.nonEmpty, "sprtBernoulli needs partition keys")
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1): ($p0, $p1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need alpha, beta in (0,1): ($alpha, $beta)")
    val l1 = math.log(p1 / p0)
    val l0 = math.log((1.0 - p1) / (1.0 - p0))
    val thrA = math.log((1.0 - beta) / alpha)
    val thrB = math.log(beta / (1.0 - alpha))
    val pCols = parts.map(col)
    val base = df.select(pCols
        :+ orderCol.as("__o")
        :+ trials.cast("long").as("__t")
        :+ successes.cast("long").as("__s"): _*)
      .filter(col("__o").isNotNull && col("__t").isNotNull && col("__s").isNotNull)
    val wPre = Window.partitionBy(pCols: _*).orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIdx = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val cum = base.select(pCols ++ Seq(col("__o"),
      row_number().over(wIdx).cast("long").as("__i"),
      sum(col("__t")).over(wPre).as("n_cum"),
      sum(col("__s")).over(wPre).as("s_cum")): _*)
    val llr = (col("s_cum").cast("double") * lit(l1))
      .+((col("n_cum") - col("s_cum")).cast("double") * lit(l0))
    val flagged = cum
      .withColumn("__llr", llr)
      .withColumn("__h1", when(col("__llr") >= lit(thrA), col("__i")))
      .withColumn("__h0", when(col("__llr") <= lit(thrB), col("__i")))
    flagged.select(pCols ++ Seq(col("__o").as("t"), col("n_cum"), col("s_cum"),
      round(col("__llr"), 6).as("llr"),
      when(col("__llr") >= lit(thrA), lit("h1"))
        .when(col("__llr") <= lit(thrB), lit("h0"))
        .otherwise(lit("continue")).as("state"),
      min(col("__h1")).over(wPre).as("first_h1_idx"),
      min(col("__h0")).over(wPre).as("first_h0_idx")): _*)
  }
  /** AR(2) fit by Yule-Walker — the autoregression coefficients implied
    * by the first two autocorrelations (the closed-form moment
    * estimator; no iterative solver):
    *
    *   φ₁ = r₁(1 − r₂)/(1 − r₁²),   φ₂ = (r₂ − r₁²)/(1 − r₁²)
    *
    * with r₁, r₂ the lag-capped sample ACF exactly as
    * [[autocorrelation]] computes it (per-lag overlap means, exact
    * DECIMAL moment algebra, one IEEE division per lag). φ₂'s sign is
    * the diagnostic: ≈0 means AR(1) suffices; <0 means oscillatory
    * pull-back the lag-1 view cannot see.
    *
    * Determinism: r₁/r₂ are divisions of exact integers and the φ
    * trees are fixed IEEE arithmetic on them — bit-replayable with no
    * further quantization. Null φ when either lag lacks pairs, the
    * series variance is 0, or r₁² = 1 (degenerate denominator).
    *
    * Scale shape: ONE series-keyed aggregation carrying both lag
    * overlaps (the [[autocorrelation]] pass restricted to k ≤ 2); no
    * windows beyond the shared series sort, 1 row per series.
    */
  def ar2YuleWalker(df: DataFrame, parts: Seq[String], orderCol: Column,
                    valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "ar2YuleWalker needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val q = round(valueCol * lit(1e6), 0).cast("long")
    val base = df.select(pCols :+ orderCol.as("__o") :+ q.as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base.select(
      pCols :+ col("__x")
        :+ lag(col("__x"), 1).over(w).as("__l1")
        :+ lag(col("__x"), 2).over(w).as("__l2"): _*)
    def lagAggs(k: Int) = {
      val lk = col(s"__l$k")
      Seq(
        sum(when(lk.isNotNull, col("__x").cast(dec) * lk.cast(dec))).as(s"__sxy$k"),
        sum(when(lk.isNotNull, col("__x").cast(dec))).as(s"__h$k"),
        sum(when(lk.isNotNull, lk.cast(dec))).as(s"__t$k"),
        sum(when(lk.isNotNull, 1L).otherwise(0L)).as(s"__np$k"))
    }
    val aggs = Seq(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx")) ++
      lagAggs(1) ++ lagAggs(2)
    val agg = lagged.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    val nDec = col("__n").cast(dec)
    def rk(k: Int): Column = {
      val num = (nDec * nDec * col(s"__sxy$k")
        - nDec * col("__s") * (col(s"__h$k") + col(s"__t$k"))
        + (nDec - lit(k).cast(dec)) * col("__s") * col("__s")).cast("double")
      val den = (nDec * (nDec * col("__sxx") - col("__s") * col("__s"))).cast("double")
      when(col(s"__np$k") >= 2 && den > 0.0, num / den)
    }
    val withR = agg.select(pCols :+ col("__n").as("n")
      :+ rk(1).as("__r1") :+ rk(2).as("__r2"): _*)
    val d = lit(1.0) - col("__r1") * col("__r1")
    withR.select(
      pCols :+ col("n")
        :+ round(col("__r1"), 6).as("r1")
        :+ round(col("__r2"), 6).as("r2")
        :+ round(when(d =!= 0.0,
            col("__r1") * (lit(1.0) - col("__r2")) / d), 6).as("phi1")
        :+ round(when(d =!= 0.0,
            (col("__r2") - col("__r1") * col("__r1")) / d), 6).as("phi2"): _*)
  }

  /** Croston's method for INTERMITTENT demand — the forecast when most
    * periods are zero (spare parts, tail SKUs, rare-event budgeting)
    * and plain EWMA of the raw series just decays toward zero between
    * demands: smooth the NONZERO demand sizes and the inter-arrival
    * gaps separately, and forecast their ratio per period:
    *
    *   ẑ = EWMA(z₁..z_k),  p̂ = EWMA(τ₁..τ_k),  f = ẑ / p̂
    *
    * with the [[ewmaHalf]] α = 1/2 smoother (exact dyadic weights — the
    * whole recursion is integer arithmetic over one window). Smoothing
    * runs over the TRAILING `trailing` nonzero observations per series
    * (row-number cut, stated in the contract): Croston state is
    * a fixed-horizon memory, and the cut also bounds [[ewmaHalf]]'s
    * exact 2^t weights.
    *
    * The first nonzero observation has no defined gap and drops (the
    * standard initialization ambiguity resolved explicitly).
    *
    * @param orderCol integer period index (e.g. epoch day) — gaps are
    *                 its differences
    * @param demand   integer demand per period (pre-aggregated; zeros
    *                 and nulls are "no demand")
    * @return one row per series: `(parts..., n_points, z_hat, p_hat,
    *         forecast)`, 6 dp
    */
  def croston(df: DataFrame, parts: Seq[String], orderCol: Column,
              demand: Column, trailing: Int = 32): DataFrame = {
    require(parts.nonEmpty, "croston needs series keys")
    require(trailing >= 2 && trailing <= 44,
      s"trailing must be in [2, 44] (exact dyadic weights): $trailing")
    val pCols = parts.map(col)
    val nz = df.select(pCols :+ orderCol.cast("long").as("__o")
        :+ demand.cast("long").as("__z"): _*)
      .filter(col("__z").isNotNull && col("__z") =!= 0L)
    val wo = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val wDesc = Window.partitionBy(pCols: _*).orderBy(col("__o").desc)
    val trail = nz
      .withColumn("__iv", col("__o") - lag(col("__o"), 1).over(wo))
      .filter(col("__iv").isNotNull)
      .withColumn("__rd", row_number().over(wDesc))
      .filter(col("__rd") <= trailing)
      .drop("__rd")
    val smoothed = ewmaHalf(
      ewmaHalf(trail, parts, Seq("__o"), "__z", out = "__zh", maxLength = trailing),
      parts, Seq("__o"), "__iv", out = "__ph", maxLength = trailing)
    val wAll = Window.partitionBy(pCols: _*)
    smoothed
      .withColumn("__rn", row_number().over(wDesc))
      .withColumn("n_points", count(lit(1)).over(wAll))
      .filter(col("__rn") === 1)
      .select(pCols :+ col("n_points")
        :+ round(col("__zh"), 6).as("z_hat")
        :+ round(col("__ph"), 6).as("p_hat")
        :+ when(col("__ph") > 0.0, round(col("__zh") / col("__ph"), 6))
          .as("forecast"): _*)
  }

  /** Lag-1 Granger causality — "do yesterday's x values help predict
    * today's y beyond y's own history?": the F-test comparing the
    * restricted AR(1) fit y_t ~ y_{t-1} against the unrestricted
    * y_t ~ y_{t-1} + x_{t-1}, per series:
    *
    *   F = (RSS_r − RSS_u) · (n−3) / RSS_u    (1, n−3 dof)
    *
    * Both fits are CLOSED FORM over centered moment combinations
    * M_ab = n·Σab − Σa·Σb (the 2×2 normal equations solved by
    * determinant), so no iterative solver exists anywhere:
    *
    *   b = (My1·M22 − My2·M12)/det,  c = (My2·M11 − My1·M12)/det,
    *   RSS_u ∝ Myy − b·My1 − c·My2,  RSS_r ∝ Myy − My1²/M11
    *
    * (the common n scaling of the M-units cancels in F).
    *
    * Determinism: inputs quantize to micro-units per row; every M is an
    * exact DECIMAL combination cast to double once; b/c/F are fixed
    * IEEE trees. F is null when n < 4, det ≤ 0, M11 ≤ 0, or RSS_u ≤ 0
    * (a perfect fit has no residual to test against).
    *
    * Scale shape: ONE series-keyed aggregation carrying the ten moments
    * over complete (y, y₋₁, x₋₁) rows — the shared series sort is the
    * only exchange; 1 row per series.
    */
  def grangerLag1(df: DataFrame, parts: Seq[String], orderCol: Column,
                  yCol: Column, xCol: Column): DataFrame = {
    require(parts.nonEmpty, "grangerLag1 needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val base = df.select(pCols :+ orderCol.as("__o")
        :+ q(yCol).as("__y") :+ q(xCol).as("__x"): _*)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base.select(
      pCols :+ col("__y")
        :+ lag(col("__y"), 1).over(w).as("__y1")
        :+ lag(col("__x"), 1).over(w).as("__x1"): _*)
      .filter(col("__y").isNotNull && col("__y1").isNotNull && col("__x1").isNotNull)
    def d(c: Column): Column = c.cast(dec)
    val agg = lagged.groupBy(pCols: _*).agg(
      count(lit(1)).as("n"),
      sum(d(col("__y"))).as("__sy"),
      sum(d(col("__y1"))).as("__sa"),
      sum(d(col("__x1"))).as("__sb"),
      sum(d(col("__y")) * d(col("__y"))).as("__syy"),
      sum(d(col("__y1")) * d(col("__y1"))).as("__saa"),
      sum(d(col("__x1")) * d(col("__x1"))).as("__sbb"),
      sum(d(col("__y")) * d(col("__y1"))).as("__sya"),
      sum(d(col("__y")) * d(col("__x1"))).as("__syb"),
      sum(d(col("__y1")) * d(col("__x1"))).as("__sab"))
    val nDec = col("n").cast(dec)
    def m(sab: Column, sa: Column, sb: Column): Column =
      (nDec * sab - sa * sb).cast("double")
    val myy = m(col("__syy"), col("__sy"), col("__sy"))
    val m11 = m(col("__saa"), col("__sa"), col("__sa"))
    val m22 = m(col("__sbb"), col("__sb"), col("__sb"))
    val m12 = m(col("__sab"), col("__sa"), col("__sb"))
    val my1 = m(col("__sya"), col("__sy"), col("__sa"))
    val my2 = m(col("__syb"), col("__sy"), col("__sb"))
    val det = m11 * m22 - m12 * m12
    val b = (my1 * m22 - my2 * m12) / det
    val c = (my2 * m11 - my1 * m12) / det
    val rssU = myy - b * my1 - c * my2
    val rssR = myy - my1 * my1 / m11
    val f = (rssR - rssU) * (col("n").cast("double") - lit(3.0)) / rssU
    val ok = col("n") >= 4 && m11 > 0.0 && det > 0.0
    agg.select(
      pCols :+ col("n")
        :+ when(ok, round(b, 6)).as("b_y1")
        :+ when(ok, round(c, 6)).as("b_x1")
        :+ when(ok && rssU > 0.0, round(f, 6)).as("f"): _*)
  }

  /** Chow structural-break test — "did the trend CHANGE at a known
    * date τ?": fit y ~ x by OLS on the full series, on x < τ, and on
    * x ≥ τ, and compare residual sums:
    *
    *   F = ((RSS_p − RSS₁ − RSS₂)/2) / ((RSS₁+RSS₂)/(n−4))   (2, n−4 dof)
    *
    * Returns per series `(parts..., n1, n2, slope1, slope2, f)` — the
    * per-segment slopes give the direction of the break the F only
    * detects.
    *
    * Determinism: y micro-quantizes per row; both segments' and the
    * pooled moments accumulate as exact DECIMAL conditional sums in ONE
    * aggregation; each RSS is the fixed tree (Myy − Mxy²/Mxx)/n over
    * exact-integer doubles. F null when either segment has < 3 points
    * or zero x-variance, or RSS₁+RSS₂ = 0.
    *
    * Scale shape: ONE series-keyed map-combined aggregation (the
    * conditional-moment discipline — no second pass, no windows).
    */
  def chowTest(df: DataFrame, parts: Seq[String], xCol: Column, yCol: Column,
               breakAt: Long): DataFrame = {
    require(parts.nonEmpty, "chowTest needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(pCols :+ xCol.cast("long").as("__x")
        :+ round(yCol * lit(1e6), 0).cast("long").as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__s", col("__x") < lit(breakAt))
    def d(c: Column): Column = c.cast(dec)
    def seg(p: String, cond: Column): Seq[Column] = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n$p"),
      sum(when(cond, d(col("__x")))).as(s"__sx$p"),
      sum(when(cond, d(col("__y")))).as(s"__sy$p"),
      sum(when(cond, d(col("__x")) * d(col("__x")))).as(s"__sxx$p"),
      sum(when(cond, d(col("__x")) * d(col("__y")))).as(s"__sxy$p"),
      sum(when(cond, d(col("__y")) * d(col("__y")))).as(s"__syy$p"))
    val aggs = seg("1", col("__s")) ++ seg("2", !col("__s"))
    val agg = base.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    def m(p: String)(ab: String, a: String, b: String): Column = {
      val n = d(col(s"n$p"))
      (n * col(s"__s$ab$p") - col(s"__s$a$p") * col(s"__s$b$p")).cast("double")
    }
    def mP(ab: String, a: String, b: String): Column = {
      val n = d(col("n1") + col("n2"))
      (n * (col(s"__s${ab}1") + col(s"__s${ab}2"))
        - (col(s"__s${a}1") + col(s"__s${a}2"))
          * (col(s"__s${b}1") + col(s"__s${b}2"))).cast("double")
    }
    def rss(myy: Column, mxy: Column, mxx: Column, n: Column): Column =
      (myy - mxy * mxy / mxx) / n.cast("double")
    val mxx1 = m("1")("xx", "x", "x"); val mxy1 = m("1")("xy", "x", "y")
    val myy1 = m("1")("yy", "y", "y")
    val mxx2 = m("2")("xx", "x", "x"); val mxy2 = m("2")("xy", "x", "y")
    val myy2 = m("2")("yy", "y", "y")
    val mxxP = mP("xx", "x", "x"); val mxyP = mP("xy", "x", "y")
    val myyP = mP("yy", "y", "y")
    val rss1 = rss(myy1, mxy1, mxx1, col("n1"))
    val rss2 = rss(myy2, mxy2, mxx2, col("n2"))
    val rssP = rss(myyP, mxyP, mxxP, col("n1") + col("n2"))
    val nD = (col("n1") + col("n2")).cast("double")
    val f = ((rssP - rss1 - rss2) / lit(2.0)) / ((rss1 + rss2) / (nD - lit(4.0)))
    val okSeg = col("n1") >= 3 && col("n2") >= 3 && mxx1 > 0.0 && mxx2 > 0.0 && mxxP > 0.0
    agg.select(
      pCols :+ col("n1") :+ col("n2")
        :+ when(col("n1") >= 2 && mxx1 > 0.0, round(mxy1 / mxx1 / lit(1e6), 6)).as("slope1")
        :+ when(col("n2") >= 2 && mxx2 > 0.0, round(mxy2 / mxx2 / lit(1e6), 6)).as("slope2")
        :+ when(okSeg && rss1 + rss2 > 0.0, round(f, 6)).as("f"): _*)
  }

  /** Hurst exponent by rescaled-range (R/S) analysis — long-range
    * dependence in one number (H ≈ 0.5 random walk, > 0.5 trending /
    * persistent, < 0.5 mean-reverting): for each block size m, split
    * the series into full blocks, compute each block's rescaled range
    *
    *   R/S = (max_k C_k − min_k C_k) / σ_block,
    *   C_k = Σ_{i ≤ k} (x_i − x̄_block)
    *
    * and fit ln(mean R/S) against ln m — H is the slope.
    *
    * Determinism: multiplying C_k through by m makes every cumulative
    * deviation an EXACT integer (m·C_k = m·prefix − (k+1)·S_block), and
    * the m's cancel in R/S = (m·R) / √(m·Σx² − S²) — one fixed IEEE
    * tree per block over exact DECIMAL moments. Per-block ln(R/S)
    * nano-quantizes before the per-size mean; the 4-point regression
    * runs on nano-quantized (ln m, mean) pairs, so the slope replays
    * exactly.
    *
    * Zero-variance blocks and partial tail blocks drop (stated).
    *
    * Scale shape: ONE series sort exchange shared by every block size
    * (the explode is per-row narrow), per-(size, block) windows bounded
    * by m, then size-level and 1-row rollups.
    *
    * @return 1 row (n_sizes, n_blocks, hurst)
    */
  def hurstRS(df: DataFrame, orderCol: Column, valueCol: Column,
              blockSizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(blockSizes.size >= 2, "need at least two block sizes for the fit")
    require(blockSizes.forall(m => m >= 4), s"block sizes must be >= 4: $blockSizes")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(orderCol.as("__o"),
        round(valueCol * lit(1e6), 0).cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val wIdx = Window.orderBy(col("__o"))
    val indexed = base
      .withColumn("__i", row_number().over(wIdx).cast("long") - 1L)
      .withColumn("__m", explode(array(blockSizes.map(m => lit(m.toLong)): _*)))
      .withColumn("__b", expr("__i div __m"))
    val wBlk = Window.partitionBy(col("__m"), col("__b")).orderBy(col("__i"))
    val wBlkAll = Window.partitionBy(col("__m"), col("__b"))
    val cum = indexed
      .withColumn("__pref", sum(col("__x").cast(dec))
        .over(wBlk.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__k", row_number().over(wBlk).cast("long"))
      .withColumn("__sblk", sum(col("__x").cast(dec)).over(wBlkAll))
      // m·C_k = m·prefix − k·S  (k = 1-based position) — exact integers
      .withColumn("__mc", col("__m").cast(dec) * col("__pref")
        - col("__k").cast(dec) * col("__sblk"))
    val perBlock = cum.groupBy(col("__m"), col("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__s"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__ss"),
        max(col("__mc")).as("__mxc"),
        min(col("__mc")).as("__mnc"))
    val varNum = (col("__m").cast(dec) * col("__ss") - col("__s") * col("__s"))
      .cast("double")
    val rs = (col("__mxc") - col("__mnc")).cast("double") / sqrt(varNum)
    val blocks = perBlock
      .filter(col("__n") === col("__m") && varNum > 0.0)
      .select(col("__m"),
        round(log(rs) * lit(1e9), 0).cast("long").as("__lnrs"))
    val perSize = blocks.groupBy(col("__m"))
      .agg(count(lit(1)).as("__nb"), sum(col("__lnrs")).as("__sl"))
      .select(col("__m"), col("__nb"),
        round(log(col("__m").cast("double")) * lit(1e9), 0).cast("long").as("__lx"),
        round((col("__sl").cast("double") / col("__nb").cast("double") / lit(1e9))
          * lit(1e9), 0).cast("long").as("__ly"))
    val fit = perSize.agg(
      count(lit(1)).as("n_sizes"),
      sum(col("__nb")).as("n_blocks"),
      sum(col("__lx").cast(dec)).as("__sx"),
      sum(col("__ly").cast(dec)).as("__sy"),
      sum(col("__lx").cast(dec) * col("__lx").cast(dec)).as("__sxx"),
      sum(col("__lx").cast(dec) * col("__ly").cast(dec)).as("__sxy"))
    val nDec = col("n_sizes").cast(dec)
    val num = (nDec * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val den = (nDec * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    fit.select(col("n_sizes"), col("n_blocks"),
      when(col("n_sizes") >= 2 && den > 0.0, round(num / den, 6)).as("hurst"))
  }

  /** Engle ARCH LM test (one lag) — "is the VOLATILITY autocorrelated
    * even if the level isn't?": detrend y ~ x by OLS, then regress the
    * squared residual on its own lag; LM = n·R² is χ²(1) under
    * homoskedasticity. The volatility-clustering alarm a plain ACF on
    * levels misses.
    *
    * Determinism: the trend fit is [[graft.ops.Regression.groupOls]]'s
    * exact-moment algebra; per-row residuals are fixed IEEE trees
    * against the broadcast (slope, intercept); squared residuals
    * re-quantize to integer units BEFORE the second moment pass, so
    * both regressions replay exactly.
    *
    * Scale shape: two series-keyed passes (moments, then residual
    * moments over the same sort) + a k-row broadcast between them.
    *
    * @return per series (parts..., n_pairs, r2, lm)
    */
  def archLm(df: DataFrame, parts: Seq[String], xCol: Column,
             yCol: Column): DataFrame = {
    require(parts.nonEmpty, "archLm needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(pCols :+ xCol.cast("long").as("__t")
        :+ round(yCol * lit(1e6), 0).cast("long").as("__y"): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    def d(c: Column): Column = c.cast(dec)
    val fit = base.groupBy(pCols: _*).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(d(col("__t"))).as("__sx"),
      sum(d(col("__y"))).as("__sy"),
      sum(d(col("__t")) * d(col("__t"))).as("__sxx"),
      sum(d(col("__t")) * d(col("__y"))).as("__sxy"))
    val mxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val mxy = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val bHat = mxy / mxx
    val aHat = (col("__sy").cast("double") - bHat * col("__sx").cast("double")) /
      col("__n").cast("double")
    val coef = fit.select(pCols :+ bHat.as("__b") :+ aHat.as("__a"): _*)
    // residual quantizes back to WHOLE value units before squaring, so
    // w = e² is an exact integer square (micro-scale squares overflow long)
    val withE = base.join(broadcast(coef), parts)
      .withColumn("__e", round(
        (col("__y").cast("double") - (col("__a") + col("__b") * col("__t").cast("double")))
          / lit(1e6), 0).cast("long"))
      .withColumn("__w", col("__e") * col("__e"))
    val w = Window.partitionBy(pCols: _*).orderBy(col("__t"))
    val lagged = withE
      .withColumn("__w1", lag(col("__w"), 1).over(w))
      .filter(col("__w1").isNotNull)
    val agg2 = lagged.groupBy(pCols: _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(d(col("__w"))).as("__wy"),
      sum(d(col("__w1"))).as("__wx"),
      sum(d(col("__w")) * d(col("__w"))).as("__wyy"),
      sum(d(col("__w1")) * d(col("__w1"))).as("__wxx"),
      sum(d(col("__w")) * d(col("__w1"))).as("__wxy"))
    val n2 = col("n_pairs").cast(dec)
    val covN = (n2 * col("__wxy") - col("__wx") * col("__wy")).cast("double")
    val varX = (n2 * col("__wxx") - col("__wx") * col("__wx")).cast("double")
    val varY = (n2 * col("__wyy") - col("__wy") * col("__wy")).cast("double")
    val r2 = covN / varX * covN / varY
    val ok = col("n_pairs") >= 3 && varX > 0.0 && varY > 0.0
    agg2.select(
      pCols :+ col("n_pairs")
        :+ when(ok, round(r2, 6)).as("r2")
        :+ when(ok, round(col("n_pairs").cast("double") * r2, 6)).as("lm"): _*)
  }

  /** KPSS level-stationarity test — the null-reversed companion to a
    * unit-root test: here the NULL is "stationary around a level", so a
    * large statistic is evidence of drift. Per series:
    *
    *   η = n⁻² Σₜ Sₜ² / σ̂²_lrv,   Sₜ = Σ_{i≤t}(xᵢ − x̄)
    *
    * with σ̂²_lrv the Bartlett-kernel long-run variance at `maxLag`
    * (the [[neweyWestMeanSe]] kernel). Returns
    * `(parts..., n, lrv, kpss)`; kpss is null when n ≤ maxLag + 1 or
    * the long-run variance is ≤ 0 (a constant series has no scale to
    * test against). Reference critical values (level case): 0.347
    * (10%), 0.463 (5%), 0.739 (1%).
    *
    * Determinism: partial sums clear the mean exactly —
    * n·Sₜ = n·Pₜ − t·S over micro-quantized x is an exact decimal per
    * row, so Σ Sₜ² = Σ(n·Pₜ − t·S)²/n² and every autocovariance ride
    * the [[autocorrelation]] identity; η is one fixed IEEE tree.
    *
    * Scale shape: one series-keyed exchange shared by the running-sum,
    * lag, and whole-series windows, then one map-combined per-series
    * aggregation. Exact decimal products bound the contract to
    * rolled-up series, not raw corpora.
    */
  def kpssTest(df: DataFrame, parts: Seq[String], orderCol: Column,
               valueCol: Column, maxLag: Int): DataFrame = {
    require(parts.nonEmpty, "kpssTest needs series keys")
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val wAll = Window.partitionBy(pCols: _*)
    val wOrd = wAll.orderBy(col("__o"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagged = base.select(
      pCols :+ col("__x")
        :+ count(lit(1)).over(wAll).as("__n")
        :+ sum(col("__x")).over(wAll).as("__S")
        :+ sum(col("__x").cast(dec)).over(wCum).as("__P")
        :+ row_number().over(wOrd).as("__t")
        :++ (1 to maxLag).map(k => lag(col("__x"), k).over(wOrd).as(s"__l$k")): _*)
    val nDec = col("__n").cast(dec)
    val sDec = col("__S").cast(dec)
    val cx = nDec * col("__x").cast(dec) - sDec
    val cs = nDec * col("__P") - col("__t").cast(dec) * sDec
    val aggs = Seq(
      max(col("__n")).as("n"),
      sum(cs * cs).as("__asq"),
      sum(cx * cx).as("__a0")) ++
      (1 to maxLag).map { k =>
        sum(when(col(s"__l$k").isNotNull,
          cx * (nDec * col(s"__l$k").cast(dec) - sDec))).as(s"__a$k")
      }
    val agg = lagged.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    val n3 = nD * nD * nD
    def g(c: String): Column = coalesce(col(c).cast("double"), lit(0.0)) / n3
    val weighted = (1 to maxLag).map { k =>
      lit(1.0 - k.toDouble / (maxLag + 1).toDouble) * g(s"__a$k")
    }.reduce(_ + _)
    val lrvMicro2 = g("__a0") + lit(2.0) * weighted
    val eta = col("__asq").cast("double") / (n3 * nD) / lrvMicro2
    agg.select(pCols :+ col("n")
      :+ round(lrvMicro2 / lit(1e12), 6).as("lrv")
      :+ when(col("n") > maxLag + 1 && lrvMicro2 > 0.0, round(eta, 6))
        .as("kpss"): _*)
  }

  /** Dickey-Fuller unit-root test (constant, no lag terms): per series,
    * the OLS of Δxₜ on (1, xₜ₋₁) —
    *
    *   Δxₜ = α + β·xₜ₋₁ + εₜ,   t_df = β̂ / se(β̂)
    *
    * A unit root (random walk) gives β ≈ 0; mean reversion pulls β < 0
    * and t_df below the Dickey-Fuller critical values (−2.57 / −2.86 /
    * −3.43 at 10/5/1% asymptotically — NOT the t table). Returns
    * `(parts..., n, beta, t_df)` with n the regression rows (series
    * length − 1); both outputs null when n < 3 or the regressor has no
    * variance. The closed-form complement to [[kpssTest]]: DF's null is
    * the unit root, KPSS's null is stationarity, and the honest answer
    * uses both.
    *
    * Determinism: all five regression moments are exact decimal sums
    * over micro-quantized (xₜ₋₁, Δxₜ); β̂, SSE, and the t ratio are one
    * fixed IEEE tree (the [[archLm]] normal-equation discipline).
    *
    * Scale shape: one series-keyed exchange (the lag window), one
    * map-combined per-series aggregation.
    */
  def dickeyFullerTest(df: DataFrame, parts: Seq[String], orderCol: Column,
                       valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "dickeyFullerTest needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base
      .withColumn("__p", lag(col("__x"), 1).over(w))
      .filter(col("__p").isNotNull)
    val y = col("__p").cast(dec)
    val d = (col("__x") - col("__p")).cast(dec)
    val agg = lagged.groupBy(pCols: _*).agg(
      count(lit(1)).as("n"),
      sum(y).as("__sy"), sum(y * y).as("__syy"),
      sum(d).as("__sd"), sum(d * d).as("__sdd"),
      sum(y * d).as("__syd"))
    val m = col("n").cast("double")
    def f(c: String): Column = col(c).cast("double")
    val sxx = m * f("__syy") - f("__sy") * f("__sy")
    val beta = (m * f("__syd") - f("__sy") * f("__sd")) / sxx
    val alpha = (f("__sd") - beta * f("__sy")) / m
    val sse = f("__sdd") - lit(2.0) * alpha * f("__sd") -
      lit(2.0) * beta * f("__syd") + m * alpha * alpha +
      beta * beta * f("__syy") + lit(2.0) * alpha * beta * f("__sy")
    val s2 = sse / (m - lit(2.0))
    val tDf = beta / sqrt(s2 * m / sxx)
    val ok = col("n") >= 3 && sxx > 0.0
    agg.select(pCols :+ col("n")
      :+ when(ok, round(beta, 6)).as("beta")
      :+ when(ok && s2 > 0.0, round(tDf, 6)).as("t_df"): _*)
  }

  /** Shewhart individuals control chart (I-MR): per series,
    *
    *   UCL/LCL = x̄ ± 2.66·MR̄,   MR̄ = mean |xₜ − xₜ₋₁|
    *
    * with 2.66 = 3/d₂(2) the standard individuals-chart constant —
    * the process-control fence beside [[flagAnomalies]]' rolling z
    * (fixed limits from the WHOLE run, not a trailing window; right
    * for "is this process in control?" rather than "did this point
    * spike?"). Returns
    * `(parts..., n, mean, mr_bar, ucl, lcl, n_above, n_below)`;
    * limits null when n < 2 or the series is constant.
    *
    * Determinism: Σx and Σ|Δx| are exact integer sums on micro
    * values; the violation counts compare micro integers against
    * once-computed double limits re-quantized to micros — the same
    * integer-fence discipline as [[graft.ops.Stats.hampelOutliers]].
    *
    * Scale shape: one series-keyed exchange (the lag window), one
    * map-combined aggregation, a 1-row limit broadcast back over the
    * same partitioning.
    */
  def controlChart(df: DataFrame, parts: Seq[String], orderCol: Column,
                   valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "controlChart needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base.withColumn("__p", lag(col("__x"), 1).over(w))
    val agg = lagged.groupBy(pCols: _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum(when(col("__p").isNotNull,
        abs(col("__x") - col("__p")).cast(dec))).as("__smr"),
      sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("__nmr"))
    val nD = col("n").cast("double")
    val mean = col("__s").cast("double") / nD / lit(1e6)
    val mrBar = col("__smr").cast("double") / col("__nmr").cast("double") / lit(1e6)
    val limits = agg.select(pCols :+ col("n")
      :+ round(mean, 6).as("mean")
      :+ when(col("__nmr") >= 1, round(mrBar, 6)).as("mr_bar")
      :+ when(col("__nmr") >= 1 && mrBar > 0.0,
        round(mean + lit(2.66) * mrBar, 6)).as("ucl")
      :+ when(col("__nmr") >= 1 && mrBar > 0.0,
        round(mean - lit(2.66) * mrBar, 6)).as("lcl"): _*)
    val vio = base.join(limits, parts)
      .groupBy(pCols: _*)
      .agg(
        sum(when(col("ucl").isNotNull &&
          col("__x") > round(col("ucl") * lit(1e6), 0).cast("long"), 1L)
          .otherwise(0L)).as("n_above"),
        sum(when(col("lcl").isNotNull &&
          col("__x") < round(col("lcl") * lit(1e6), 0).cast("long"), 1L)
          .otherwise(0L)).as("n_below"))
    limits.join(vio, parts)
      .select(pCols :+ col("n") :+ col("mean") :+ col("mr_bar")
        :+ col("ucl") :+ col("lcl") :+ col("n_above") :+ col("n_below"): _*)
  }

  /** Effective sample size under autocorrelation:
    *
    *   ESS = n / (1 + 2·Σ_{k=1..L} ρ_k)
    *
    * — how many INDEPENDENT observations an autocorrelated series is
    * actually worth; the deflator that turns [[neweyWestMeanSe]]'s
    * corrected SE into a sample-size story (monitoring windows, MCMC
    * thinning, "how long must I observe?"). Per series:
    * `(parts..., n, sum_acf, ess)`; null when the truncated kernel
    * goes non-positive (heavy negative correlation at this L — raise
    * the lag cap) or n ≤ maxLag + 1.
    *
    * Determinism: rides [[autocorrelation]]'s exact-identity ρ's,
    * already 6-dp — the cross-lag sum is exact integers at 1e6.
    *
    * Scale shape: the autocorrelation exchange plus a lag-bounded
    * rollup.
    */
  def effectiveSampleSize(df: DataFrame, parts: Seq[String], orderCol: Column,
                          valueCol: Column, maxLag: Int): DataFrame = {
    val acf = autocorrelation(df, parts, orderCol, valueCol, maxLag)
    val pCols = parts.map(col)
    val agg = acf.groupBy(pCols: _*).agg(
      max(col("n_pairs") + col("lag")).as("n"),
      sum(when(col("acf").isNotNull,
        round(col("acf") * lit(1e6), 0).cast("long")).otherwise(0L)).as("__r6"),
      sum(when(col("acf").isNull, 1L).otherwise(0L)).as("__miss"))
    val nD = col("n").cast("double")
    val sumAcf = col("__r6").cast("double") / lit(1e6)
    val den = lit(1.0) + lit(2.0) * sumAcf
    val ok = col("__miss") === 0L && den > 0.0
    agg.select(pCols :+ col("n")
      :+ round(sumAcf, 6).as("sum_acf")
      :+ when(ok, round(nD / den, 6)).as("ess"): _*)
  }

  /** Discrete periodogram at integer frequencies 1..maxFreq — WHERE is
    * the cycle? Power at frequency f over the demeaned series:
    *
    *   P(f) = (C_f² + S_f²) / n,   C_f = Σ x̃ₜ·cos(2πft/n),  S_f = Σ x̃ₜ·sin(·)
    *
    * the spectral complement of [[autocorrelation]]: a weekly cycle in
    * a 700-day series lights up f ≈ n/7 (period_len ≈ 7). Returns
    * `(parts..., freq, n, period_len, power)`; power in original
    * units². Null power when n < 2·maxFreq (under-resolved).
    *
    * Determinism: demeaning clears exactly (n·xₜ − S); each
    * trig product quantizes per (row, freq) at milli-micro before the
    * exact sums, so the only cross-engine trust is libm cos/sin on
    * identical doubles — absorbed by the quantization (the ln
    * convention).
    *
    * Scale shape: one series-keyed exchange (count/sum/index windows),
    * a narrow ×maxFreq explode, one (series, freq) map-combined
    * aggregation.
    */
  def periodogram(df: DataFrame, parts: Seq[String], orderCol: Column,
                  valueCol: Column, maxFreq: Int): DataFrame = {
    require(parts.nonEmpty, "periodogram needs series keys")
    require(maxFreq >= 1 && maxFreq <= 64, s"maxFreq out of range: $maxFreq")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val wAll = Window.partitionBy(pCols: _*)
    val wOrd = wAll.orderBy(col("__o"))
    val indexed = base.select(
      pCols :+ col("__x")
        :+ count(lit(1)).over(wAll).as("__n")
        :+ sum(col("__x").cast(dec)).over(wAll).as("__S")
        :+ (row_number().over(wOrd) - 1).cast("long").as("__t"): _*)
    val nD = col("__n").cast("double")
    val xc = (col("__n").cast(dec) * col("__x").cast(dec) - col("__S"))
      .cast("double") / nD
    val exploded = indexed
      .select(pCols :+ col("__n") :+ col("__t") :+ xc.as("__xc")
        :+ explode(array((1 to maxFreq).map(f => lit(f.toLong)): _*)).as("freq"): _*)
    val ang = lit(2.0) * lit(math.Pi) * col("freq").cast("double") *
      col("__t").cast("double") / col("__n").cast("double")
    val ct = round(col("__xc") * cos(ang) * lit(1e3), 0).cast("long")
    val st = round(col("__xc") * sin(ang) * lit(1e3), 0).cast("long")
    val agg = exploded.groupBy(pCols :+ col("freq"): _*).agg(
      max(col("__n")).as("n"), sum(ct).as("__c"), sum(st).as("__s"))
    def d(c: String): Column = col(c).cast("double")
    // ct/st carry 1e3·micro = 1e9·units — power scales by 1e18
    val power = (d("__c") * d("__c") + d("__s") * d("__s")) / d("n") / lit(1e18)
    agg.select(pCols :+ col("freq") :+ col("n")
      :+ round(d("n") / col("freq").cast("double"), 6).as("period_len")
      :+ when(col("n") >= 2L * maxFreq, round(power, 6)).as("power"): _*)
  }

  /** Seasonal-strength decomposition — HOW MUCH of the detrended
    * variation does a caller-supplied seasonal bucket (weekday, month,
    * hour…) explain:
    *
    *   strength = max(0, 1 − Var(remainder)/Var(detrended))
    *
    * with detrended = x − OLS trend line and remainder = detrended −
    * bucket mean. The STL-lite readout behind "is this series worth a
    * seasonal model?" — [[seasonalFactors]] gives the factors, this
    * says whether they matter. Per series:
    * `(parts..., n, n_buckets, var_detrended, var_remainder, strength)`;
    * null when n < 3 or the detrended variance is 0.
    *
    * Determinism: the trend fit is closed-form over exact decimal
    * moments; detrended values quantize to milli-micro per row BEFORE
    * the bucket means, and remainders re-quantize before the variance
    * pass — every cross-row sum is an exact integer sum.
    *
    * Scale shape: one series-keyed exchange (the index window) shared
    * by both passes; the fit and bucket-mean tables are series- and
    * bucket-bounded joins (AQE broadcast).
    */
  def seasonalStrength(df: DataFrame, parts: Seq[String], orderCol: Column,
                       valueCol: Column, bucket: Column): DataFrame = {
    require(parts.nonEmpty, "seasonalStrength needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o") :+ bucket.as("__b")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull && col("__b").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val indexed = base.withColumn("__t", (row_number().over(w) - 1).cast("long"))
    val fit = indexed.groupBy(pCols: _*).agg(
      count(lit(1)).as("__nall"),
      sum(col("__t").cast(dec)).as("__st"),
      sum(col("__t").cast(dec) * col("__t").cast(dec)).as("__stt"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__t").cast(dec) * col("__x").cast(dec)).as("__stx"))
    val m = col("__nall").cast("double")
    def f(c: String): Column = col(c).cast("double")
    val sxx = m * f("__stt") - f("__st") * f("__st")
    val withFit = fit.select(pCols :+ col("__nall") :+ col("__st") :+ col("__sx")
      :+ ((m * f("__stx") - f("__st") * f("__sx")) / sxx).as("__bb")
      :+ sxx.as("__den"): _*)
      .withColumn("__a",
        (col("__sx").cast("double") - col("__bb") * col("__st").cast("double"))
          / col("__nall").cast("double"))
      .drop("__st", "__sx")
    val joined = indexed.join(withFit, parts)
    // detrended, in exact milli-micro integers
    val dmm = round((col("__x") - (col("__a") + col("__bb") * col("__t")))
      * lit(1e3), 0).cast("long")
    val dt = joined.select(pCols :+ col("__b") :+ col("__nall") :+ col("__a")
      :+ col("__bb") :+ col("__den") :+ dmm.as("__d"): _*)
    val bMeans = dt.groupBy(pCols :+ col("__b"): _*).agg(
      count(lit(1)).as("__nb"), sum(col("__d").cast(dec)).as("__sb"))
    val withMean = dt.join(bMeans, parts :+ "__b")
    val rem = round((col("__d").cast("double") -
      col("__sb").cast("double") / col("__nb").cast("double")) * lit(1e3), 0)
      .cast("long")
    val fin = withMean.select(pCols :+ col("__nall") :+ col("__den")
        :+ col("__d") :+ rem.as("__r"): _*)
      .groupBy(pCols: _*).agg(
        max(col("__nall")).as("n"),
        max(col("__den")).as("__dn"),
        sum(col("__d").cast(dec)).as("__sd"),
        sum(col("__d").cast(dec) * col("__d").cast(dec)).as("__sdd"),
        sum(col("__r").cast(dec)).as("__sr"),
        sum(col("__r").cast(dec) * col("__r").cast(dec)).as("__srr"))
    val nBuckets = bMeans.groupBy(pCols: _*).agg(count(lit(1)).as("n_buckets"))
    val out = fin.join(nBuckets, parts)
    val nD = col("n").cast("double")
    // population variances; __d at 1e3·micro (= 1e9·units), __r at 1e6·micro
    val varD = (col("n").cast(dec) * col("__sdd") - col("__sd") * col("__sd"))
      .cast("double") / (nD * nD) / lit(1e18)
    val varR = (col("n").cast(dec) * col("__srr") - col("__sr") * col("__sr"))
      .cast("double") / (nD * nD) / lit(1e24)
    val ok = col("n") >= 3 && col("__dn") > 0.0 && varD > 0.0
    out.select(pCols :+ col("n") :+ col("n_buckets")
      :+ when(ok, round(varD, 6)).as("var_detrended")
      :+ when(ok, round(varR, 6)).as("var_remainder")
      :+ when(ok, round(greatest(lit(0.0), lit(1.0) - varR / varD), 6))
        .as("strength"): _*)
  }

  /** Partial autocorrelation at lags 1–3 via the closed-form
    * Durbin-Levinson recursion — WHICH lag carries direct signal once
    * shorter lags are controlled (the AR-order picker; [[autocorrelation]]
    * answers the marginal question, this the conditional one):
    *
    *   φ₁₁ = ρ₁,  φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²),
    *   φ₃₃ = (ρ₃ − φ₂₁ρ₂ − φ₂₂ρ₁)/(1 − φ₂₁ρ₁ − φ₂₂ρ₂),  φ₂₁ = ρ₁(1 − φ₂₂)
    *
    * Returns `(parts..., lag, pacf)` for lags 1..3; null when n < 5,
    * the series is constant, or a recursion denominator is 0. Lags
    * beyond 3 need a solver loop — out of scope for the closed form
    * (use [[ar2YuleWalker]]'s fit residuals for deeper structure).
    *
    * Determinism: the ρₖ ride [[autocorrelation]]'s exact
    * mean-clearing identity (n²Σxy − nS(h+t) + (n−k)S² over cleared
    * denominators); the recursion is one fixed IEEE tree over them.
    *
    * Scale shape: one series-keyed exchange, one map-combined
    * aggregation, a ≤ 3-row literal explode.
    */
  def pacf(df: DataFrame, parts: Seq[String], orderCol: Column,
           valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "pacf needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base.select(
      pCols :+ col("__x")
        :++ (1 to 3).map(k => lag(col("__x"), k).over(w).as(s"__l$k")): _*)
    val perLag = (1 to 3).flatMap { k =>
      val lk = col(s"__l$k")
      Seq(
        sum(when(lk.isNotNull, col("__x").cast(dec) * lk.cast(dec))).as(s"__sxy$k"),
        sum(when(lk.isNotNull, col("__x").cast(dec))).as(s"__h$k"),
        sum(when(lk.isNotNull, lk.cast(dec))).as(s"__t$k"))
    }
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx")) ++ perLag
    val agg = lagged.groupBy(pCols: _*).agg(aggs.head, aggs.tail: _*)
    val nDec = col("n").cast(dec)
    val den = (nDec * (nDec * col("__sxx") - col("__s") * col("__s")))
      .cast("double")
    def rho(k: Int): Column =
      (nDec * nDec * col(s"__sxy$k")
        - nDec * col("__s") * (col(s"__h$k") + col(s"__t$k"))
        + (nDec - lit(k).cast(dec)) * col("__s") * col("__s")).cast("double") / den
    val r1 = rho(1); val r2 = rho(2); val r3 = rho(3)
    val d2 = lit(1.0) - r1 * r1
    val p22 = (r2 - r1 * r1) / d2
    val p21 = r1 - p22 * r1
    val d3 = lit(1.0) - p21 * r1 - p22 * r2
    val p33 = (r3 - p21 * r2 - p22 * r1) / d3
    val okBase = col("n") >= 5 && den > 0.0
    val rows = array(
      struct(lit(1).as("lag"), when(okBase, round(r1, 6)).as("pacf")),
      struct(lit(2).as("lag"),
        when(okBase && d2 =!= 0.0, round(p22, 6)).as("pacf")),
      struct(lit(3).as("lag"),
        when(okBase && d2 =!= 0.0 && d3 =!= 0.0, round(p33, 6)).as("pacf")))
    agg.select(pCols :+ col("n") :+ explode(rows).as("__r"): _*)
      .select(pCols :+ col("n") :+ col("__r.lag").as("lag")
        :+ col("__r.pacf").as("pacf"): _*)
  }

  /** Theta-method forecast (Assimakopoulos & Nikolopoulos 2000, the
    * θ = 2 special case that won M3): the equal-weight combination of
    * the linear trend line and SES applied to the theta(2)-line
    * 2·xₜ − trendₜ — in practice "damped trend that actually works".
    * SES uses the exact-dyadic α = 1/2 machinery ([[ewmaHalf]]) over
    * the `trailing` most recent points. Returns one row per horizon:
    * `(parts..., h, n, forecast)`, null forecast when the series is
    * shorter than 3 or constant in time.
    *
    * Determinism: the trend fit is closed-form over exact decimal
    * moments; theta-line values quantize to cents; the SES weighted
    * sum is exact integers (2^t weights); the combination is one
    * fixed IEEE tree.
    *
    * Scale shape: one series-keyed exchange shared by the index
    * window, the fit join (group-bounded, AQE broadcast), and the
    * trailing SES window; horizons explode from a literal ≤ 8-row
    * array.
    */
  def thetaForecast(df: DataFrame, parts: Seq[String], orderCol: Column,
                    valueCol: Column, trailing: Int = 32,
                    horizons: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(parts.nonEmpty, "thetaForecast needs series keys")
    require(trailing >= 2 && trailing <= 36, s"trailing out of range: $trailing")
    require(horizons.nonEmpty && horizons.forall(h => h >= 1 && h <= 365),
      "horizons must be in [1, 365]")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val indexed = base.withColumn("__t", (row_number().over(w) - 1).cast("long"))
    val fit = indexed.groupBy(pCols: _*).agg(
      count(lit(1)).as("__nall"),
      sum(col("__t").cast(dec)).as("__st"),
      sum(col("__t").cast(dec) * col("__t").cast(dec)).as("__stt"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__t").cast(dec) * col("__x").cast(dec)).as("__stx"))
    val m = col("__nall").cast("double")
    def f(c: String): Column = col(c).cast("double")
    val sxx = m * f("__stt") - f("__st") * f("__st")
    val withFit = fit.select(pCols :+ col("__nall") :+ col("__st") :+ col("__sx")
      :+ ((m * f("__stx") - f("__st") * f("__sx")) / sxx).as("__b")
      :+ sxx.as("__den"): _*)
      .withColumn("__a",
        (col("__sx").cast("double") - col("__b") * col("__st").cast("double"))
          / col("__nall").cast("double"))
      .drop("__st", "__sx")
    val joined = indexed.join(withFit, parts)
    val thetaCents = round(
      (lit(2.0) * col("__x") - (col("__a") + col("__b") * col("__t")))
        / lit(1e4), 0).cast("long")
    val trail = joined
      .withColumn("__rd", row_number().over(
        Window.partitionBy(pCols: _*).orderBy(col("__o").desc)))
      .filter(col("__rd") <= trailing)
      .select(pCols :+ col("__o") :+ col("__nall") :+ col("__a") :+ col("__b")
        :+ col("__den") :+ thetaCents.as("__c"): _*)
    val ses = ewmaHalf(trail, parts, Seq("__o"), "__c", out = "__ses",
        maxLength = trailing + 1)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(pCols: _*).orderBy(col("__o").desc)))
      .filter(col("__rn") === 1)
    val hRows = array(horizons.map(h => lit(h.toLong)): _*)
    val out = ses.select(pCols :+ col("__nall").as("n") :+ col("__a")
        :+ col("__b") :+ col("__den") :+ col("__ses")
        :+ explode(hRows).as("h"): _*)
    val trendD = (col("__a") + col("__b") *
      (col("n") - lit(1L) + col("h"))) / lit(1e6)
    val fc = lit(0.5) * (col("__ses") / lit(100.0)) + lit(0.5) * trendD
    out.select(pCols :+ col("h") :+ col("n")
      :+ when(col("n") >= 3 && col("__den") > 0.0, round(fc, 6))
        .as("forecast"): _*)
  }

  /** Lo-MacKinlay variance ratio VR(q): does the series diffuse like a
    * random walk? Per series, over first differences rₜ = xₜ − xₜ₋₁
    * and overlapping q-step differences cₜ = xₜ − xₜ₋q:
    *
    *   VR(q) = [Σ(cₜ − qμ)² / (T_q·q)] / [Σ(rₜ − μ)² / T]
    *
    * with μ = (x_n − x₁)/T, T = n−1 one-step returns, T_q = T−q+1
    * overlapping q-windows. VR ≈ 1 under the random walk; VR > 1 means
    * momentum (positive autocorrelation), VR < 1 mean reversion — the
    * multi-horizon summary of what [[autocorrelation]] reports lag by
    * lag. z is the homoskedastic Lo-MacKinlay statistic
    * √T·(VR−1)/√(2(2q−1)(q−1)/(3q)). Returns
    * `(parts..., n, vr, z)`, null when T_q < 2 or the one-step
    * variance is 0.
    *
    * Determinism: Σr, Σr², Σc, Σc² are exact decimal sums over
    * micro-quantized x; both centered sums clear μ by cross-
    * multiplication in one fixed IEEE tree, so the ratio replays
    * bit-for-bit.
    *
    * Scale shape: one series-keyed exchange shared by both lag
    * windows, one map-combined per-series aggregation.
    */
  def varianceRatio(df: DataFrame, parts: Seq[String], orderCol: Column,
                    valueCol: Column, q: Int): DataFrame = {
    require(parts.nonEmpty, "varianceRatio needs series keys")
    require(q >= 2 && q <= 64, s"q out of range: $q")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val lagged = base
      .withColumn("__p1", lag(col("__x"), 1).over(w))
      .withColumn("__pq", lag(col("__x"), q).over(w))
    val r = (col("__x") - col("__p1")).cast(dec)
    val c = (col("__x") - col("__pq")).cast(dec)
    val agg = lagged.groupBy(pCols: _*).agg(
      sum(when(col("__p1").isNotNull, 1L).otherwise(0L)).as("n"),
      sum(when(col("__p1").isNotNull, r)).as("__sr"),
      sum(when(col("__p1").isNotNull, r * r)).as("__srr"),
      sum(when(col("__pq").isNotNull, 1L).otherwise(0L)).as("__tq"),
      sum(when(col("__pq").isNotNull, c)).as("__sc"),
      sum(when(col("__pq").isNotNull, c * c)).as("__scc"))
    val t = col("n").cast("double")
    val tq = col("__tq").cast("double")
    def f(c: String): Column = col(c).cast("double")
    val mu = f("__sr") / t
    val qMu = lit(q.toDouble) * mu
    val var1 = (f("__srr") - f("__sr") * mu) / t
    val varQ = (f("__scc") - lit(2.0) * qMu * f("__sc") + tq * qMu * qMu) /
      (tq * lit(q.toDouble))
    val vr = varQ / var1
    val z = sqrt(t) * (vr - lit(1.0)) /
      sqrt(lit(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q)))
    val ok = col("__tq") >= 2 && var1 > 0.0
    agg.select(pCols :+ col("n")
      :+ when(ok, round(vr, 6)).as("vr")
      :+ when(ok, round(z, 6)).as("z"): _*)
  }

  /** Maximum drawdown per series — the risk number a cumulative stream
    * owes its consumers: running-sum the per-period increments, track
    * the running peak, and report the deepest peak-to-trough fall
    *
    *   max_dd = max_t ( max_{s≤t} C_s − C_t ),   C = cumulative sum
    *
    * plus WHERE it bottomed (`trough_o`, ties → the latest period) and
    * the drawdown as a fraction of the peak in force at the trough
    * (null when that peak ≤ 0 — a fraction of a negative peak is
    * meaningless). Returns
    * `(parts..., n, total, peak, max_drawdown, dd_frac, trough_o)`.
    *
    * Determinism: increments micro-quantize; cumulative sums / running
    * maxima / drawdowns are EXACT integers end-to-end; the argmax
    * trough breaks ties by the larger order key via one struct-max;
    * only dd_frac touches IEEE (one division), 6 dp.
    *
    * Scale shape: one ordered window per series partition + one group
    * rollup. Feed it PER-PERIOD AGGREGATES (daily P&L, hourly net) —
    * the window then runs over a calendar-bounded table, the same
    * bounded-partition contract as [[controlChart]].
    */
  def maxDrawdown(df: DataFrame, parts: Seq[String], orderCol: Column,
                  valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "maxDrawdown needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
      .rowsBetween(Long.MinValue, 0)
    val cum = base
      .withColumn("__c", sum(col("__x").cast(dec)).over(w))
      .withColumn("__pk", max(col("__c")).over(w))
      .withColumn("__dd", col("__pk") - col("__c"))
    val agg = cum.groupBy(pCols: _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x").cast(dec)).as("__tot"),
      max(col("__pk")).as("__maxpk"),
      max(col("__dd")).as("__mdd"),
      // trough = the row achieving max drawdown; ties -> latest order,
      // and its in-force peak rides along for the fraction
      max(struct(col("__dd"), col("__o"), col("__pk"))).as("__at"))
    val mddD = col("__mdd").cast("double")
    val pkAt = col("__at").getField("__pk").cast("double")
    agg.select(pCols
      :+ col("n")
      :+ round(col("__tot").cast("double") / lit(1e6), 6).as("total")
      :+ round(col("__maxpk").cast("double") / lit(1e6), 6).as("peak")
      :+ round(mddD / lit(1e6), 6).as("max_drawdown")
      :+ when(pkAt > 0.0, round(mddD / pkAt, 6)).as("dd_frac")
      :+ col("__at").getField("__o").as("trough_o"): _*)
  }

  /** Historical VaR + CVaR (expected shortfall) per series — the tail
    * contract on a distribution of per-period losses: with
    * k = ⌈α·n⌉ (α in micro units, integer ceiling-division — never a
    * float boundary call),
    *
    *   VaR_α  = the k-th SMALLEST loss (exact order statistic),
    *   CVaR_α = mean of the m = n−k+1 LARGEST losses (the tail the
    *            VaR order statistic opens, inclusive)
    *
    * where loss = −value (a gain is a negative loss). Returns
    * `(parts..., n, k_rank, tail_m, var_loss, cvar_loss)`.
    *
    * Determinism: losses micro-quantize; the order statistic and the
    * tail sum come off the DISTINCT-LOSS cumulative table with ties
    * split exactly (the boundary value contributes exactly
    * m − cum_above copies), so both outputs are exact-integer ratios —
    * one IEEE division each, 6 dp.
    *
    * Scale shape: one (series, loss)-keyed map-combined aggregation,
    * cumulative windows over the bounded distinct-value table, one
    * rollup — the [[graft.ops.Stats.mannWhitneyU]] contract; raw rows
    * shuffle once and are never window-ordered.
    */
  /** SAX symbolization + motif census — the classic Lin/Keogh pipeline
    * for "what patterns recur in these series": per series, (1) z-score
    * against the series' own exact moments, (2) PAA-average over
    * `segLen` consecutive order units, (3) map each segment mean to a
    * 4-letter alphabet at the N(0,1) quartile breakpoints
    * (−0.6745, 0, 0.6745), (4) slide a `wordLen`-symbol window and
    * census the words. Returns
    * `(word, n_series, occurrences)` — occurrences across all series,
    * n_series = distinct series containing the word — ordered by
    * (occurrences DESC, word) for a stable motif ranking.
    *
    * Determinism: moments are exact integer sums (micro-quantized
    * values); each segment's PAA mean is an exact decimal ratio; the
    * z-comparison against literal breakpoints is one fixed IEEE tree
    * (same verdict in every engine); words are string concatenations
    * over the bounded SEGMENT table.
    *
    * Scale shape: one (series, segment) map-combined aggregation over
    * the scan + a broadcast moment join; the sliding-word window runs
    * over the SEGMENT table (rows = span/segLen — calendar-bounded,
    * never raw events); one word-keyed census shuffle.
    */
  def saxMotifs(df: DataFrame, parts: Seq[String], orderCol: Column,
                valueCol: Column, segLen: Long, wordLen: Int): DataFrame = {
    require(parts.nonEmpty, "saxMotifs needs series keys")
    require(segLen >= 1L, s"segLen must be >= 1: $segLen")
    require(wordLen >= 2 && wordLen <= 8, s"wordLen out of range: $wordLen")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val base = df.select(
        pCols :+ orderCol.cast("long").as("__o")
          :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__o").isNotNull && col("__x").isNotNull)
    val stats = base.groupBy(pCols: _*).agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__s1"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__s2"),
      min(col("__o")).as("__o0"))
    val nD = col("__n").cast("double")
    val s1d = col("__s1").cast("double")
    val mu = s1d / nD
    val sd = sqrt((col("__s2").cast("double") - s1d * s1d / nD) / (nD - lit(1.0)))
    val withStats = base.join(
      broadcast(stats.select(pCols :+ mu.as("__mu") :+ sd.as("__sd")
        :+ col("__o0"): _*)),
      parts)
    val paa = withStats
      .filter(col("__sd") > 0.0)
      .groupBy(pCols :+ floor((col("__o") - col("__o0")).cast("double") /
        lit(segLen.toDouble)).cast("long").as("__seg"): _*)
      .agg(first(col("__mu")).as("__mu"), first(col("__sd")).as("__sd"),
        (sum(col("__x").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("__pm"))
    val z = (col("__pm") - col("__mu")) / col("__sd")
    val sym = paa.select(pCols :+ col("__seg")
      :+ when(z < -0.6745, "a").when(z < 0.0, "b")
        .when(z < 0.6745, "c").otherwise("d").as("__s"): _*)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__seg"))
    val withNext = (1 until wordLen).foldLeft(
      sym.withColumn("__w", col("__s"))) { (d, k) =>
      d.withColumn("__w", concat(col("__w"), lead(col("__s"), k).over(w)))
    }
    // a word forms only where all wordLen consecutive segments exist AND
    // are gap-free (lead is positional; require the span to be contiguous)
    val complete = withNext
      .withColumn("__segEnd", lead(col("__seg"), wordLen - 1).over(w))
      .filter(col("__segEnd").isNotNull &&
        col("__segEnd") === col("__seg") + lit((wordLen - 1).toLong))
    complete
      .groupBy(col("__w").as("word"))
      .agg(countDistinct(struct(pCols: _*)).as("n_series"),
        count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("word"))
  }

  /** Haar wavelet energy decomposition — WHERE does a series' variance
    * live across time scales: `levels` rounds of the UNNORMALIZED Haar
    * transform (pairwise sums s = x₂ᵢ+x₂ᵢ₊₁ carried down, details
    * d = x₂ᵢ−x₂ᵢ₊₁ whose squared sum is the level's energy — all
    * INTEGER arithmetic on micro units, so the decomposition is exact
    * at any parallelism). Per series:
    * `(parts..., level, n_pairs, energy, energy_share)` where `energy`
    * is Σd²/2^level /1e12 (the 1/2-per-level normalization restoring
    * the orthonormal-Haar scale, applied once at the end as ONE fixed
    * IEEE division) and `energy_share` its fraction of the total across
    * emitted levels. Scale-1 rows = fast oscillation; deep levels =
    * slow structure — the time-localized complement of
    * [[periodogram]]'s global frequencies. An unpaired tail element at
    * any level is dropped (documented half-open pairing).
    *
    * Scale shape: `levels` aggregations over the (bounded, calendar-
    * sized) per-period series table, each one keyed (series, idx div 2)
    * — the table HALVES per level; one final bounded rollup.
    */
  def haarEnergy(df: DataFrame, parts: Seq[String], orderCol: Column,
                 valueCol: Column, levels: Int = 3): DataFrame = {
    require(parts.nonEmpty, "haarEnergy needs series keys")
    require(levels >= 1 && levels <= 8, s"levels out of range: $levels")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    var cur = df.select(
        pCols :+ orderCol.as("__o")
          :+ round(valueCol * lit(1e6), 0).cast(dec).as("__x"): _*)
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long") - lit(1L))
      .select(pCols :+ col("__i") :+ col("__x"): _*)
    val perLevel = (1 to levels).map { lvl =>
      val paired = cur
        .groupBy(pCols :+ floor(col("__i").cast("double") / lit(2.0))
          .cast("long").as("__p"): _*)
        .agg(count(lit(1)).as("__c"),
          sum(col("__x")).as("__s"),
          sum(when(col("__i") % 2 === 0, col("__x"))
            .otherwise(-col("__x"))).as("__d"))
        .filter(col("__c") === 2L)
      val e = paired.groupBy(pCols: _*)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("__d") * col("__d")).as("__e"))
        .select(pCols :+ lit(lvl).as("level") :+ col("n_pairs") :+ col("__e")
          // 2^(levels−lvl)-scaled energy: an exact INTEGER, so the total
          // below window-sums decimals (order-free), never raw doubles
          :+ (col("__e") * lit(1L << (levels - lvl))).as("__esc"): _*)
      cur = paired.select(pCols :+ col("__p").as("__i")
        :+ col("__s").as("__x"): _*)
      e
    }.reduce(_ unionByName _)
    val wTot = Window.partitionBy(pCols: _*)
    // 2^level normalization + micro² scale: e/2^l = esc/2^levels
    val eNorm = col("__e").cast("double") /
      pow(lit(2.0), col("level").cast("double")) / lit(1e12)
    perLevel
      .withColumn("__tot", sum(col("__esc")).over(wTot))
      .select(pCols :+ col("level") :+ col("n_pairs")
        :+ round(eNorm, 6).as("energy")
        :+ when(col("__tot") > 0,
          round(col("__esc").cast("double") / col("__tot").cast("double"), 6))
          .as("energy_share"): _*)
  }

  /** Transfer entropy (lag-1, binary-state) — DIRECTIONAL information
    * flow between two aligned series: after symbolizing each period as
    * up/down vs the previous period, how much does knowing source
    * series X's last move reduce uncertainty about target Y's next
    * move BEYOND Y's own last move:
    *
    *   TE(X→Y) = (1/N)·Σ n(y,y′,x′)·ln[ n(y,y′,x′)·n(y′) / (n(y′,x′)·n(y,y′)) ]
    *
    * (nats; y′/x′ = previous-period states). The information-theoretic
    * complement of [[grangerLag1]]: Granger tests LINEAR lead-lag, TE
    * catches any-functional-form flow. Returns one row
    * `(n_transitions, te_nats)`.
    *
    * Determinism: states are exact integer comparisons; the ≤8 triple
    * cells and their marginals are exact counts; every ln takes an
    * integer-product argument (the q_outliers integer-arg convention),
    * nano-quantized per cell before the exact 8-cell rollup.
    *
    * Scale shape: one series sort (two lag columns), one cell
    * aggregation to ≤8 rows, marginal windows over THAT bounded table,
    * a 1-row rollup.
    */
  def transferEntropy(df: DataFrame, orderCol: Column, source: Column,
                      target: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.orderBy(col("__o"))
    val states = df.select(orderCol.as("__o"),
        round(source * lit(1e6), 0).cast("long").as("__xs"),
        round(target * lit(1e6), 0).cast("long").as("__ys"))
      .filter(col("__xs").isNotNull && col("__ys").isNotNull)
      .select(col("__o"),
        (col("__xs") > lag(col("__xs"), 1).over(w)).cast("long").as("__xu"),
        (col("__ys") > lag(col("__ys"), 1).over(w)).cast("long").as("__yu"))
      .select(col("__o"), col("__xu"), col("__yu"),
        lag(col("__xu"), 1).over(Window.orderBy(col("__o"))).as("__xp"),
        lag(col("__yu"), 1).over(Window.orderBy(col("__o"))).as("__yp"))
      .filter(col("__xu").isNotNull && col("__yu").isNotNull &&
        col("__xp").isNotNull && col("__yp").isNotNull)
    val cells = states.groupBy(col("__yu"), col("__yp"), col("__xp"))
      .agg(count(lit(1)).as("__n"))
    val wYp = Window.partitionBy(col("__yp"))
    val wYpXp = Window.partitionBy(col("__yp"), col("__xp"))
    val wYuYp = Window.partitionBy(col("__yu"), col("__yp"))
    val withM = cells
      .withColumn("__nyp", sum(col("__n")).over(wYp))
      .withColumn("__nypxp", sum(col("__n")).over(wYpXp))
      .withColumn("__nyuyp", sum(col("__n")).over(wYuYp))
    // per-cell contribution n·ln(n·n_yp / (n_ypxp·n_yuyp)) — integer-arg
    // logs, nano-quantized before the exact 8-cell sum
    val term = col("__n").cast("double") *
      (log(col("__n").cast(dec).cast("double") * col("__nyp").cast("double")) -
       log(col("__nypxp").cast(dec).cast("double") * col("__nyuyp").cast("double")))
    val agg = withM.agg(sum(col("__n")).as("n_transitions"),
      sum(round(term * lit(1e9), 0).cast(dec)).as("__t"))
    agg.select(col("n_transitions"),
      when(col("n_transitions") > 0,
        round(col("__t").cast("double") / lit(1e9) /
          col("n_transitions").cast("double"), 6)).as("te_nats"))
  }

  /** Permutation entropy (order m = 3) — series COMPLEXITY from ordinal
    * patterns: each consecutive triple maps to one of 6 rank patterns
    * (ties break to order of appearance, the stable convention), and
    *
    *   H = −Σ p·ln p / ln 6    ∈ [0, 1]
    *
    * 0 = perfectly monotone/regular, 1 = pattern-uniform (noise-like).
    * The Bandt–Pompe complexity screen beside [[hurstRS]]'s long-memory
    * exponent and [[periodogram]]'s cycles — robust to monotone
    * transforms because only ORDER matters. Per series:
    * `(parts..., n_triples, n_patterns, h_norm)`.
    *
    * Determinism: patterns are exact integer comparisons on quantized
    * values; H spells ln N − (1/N)Σn·ln n with integer-arg logs,
    * nano-quantized per pattern before the ≤6-row rollup.
    *
    * Scale shape: one series sort (two leads), one ≤6-row pattern
    * aggregation per series, one rollup.
    */
  def permutationEntropy(df: DataFrame, parts: Seq[String], orderCol: Column,
                         valueCol: Column): DataFrame = {
    require(parts.nonEmpty, "permutationEntropy needs series keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val w = Window.partitionBy(pCols: _*).orderBy(col("__o"))
    val tri = df.select(pCols :+ orderCol.as("__o")
        :+ round(valueCol * lit(1e6), 0).cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull)
      .select(pCols :+ col("__x")
        :+ lead(col("__x"), 1).over(w).as("__y")
        :+ lead(col("__x"), 2).over(w).as("__z"): _*)
      .filter(col("__y").isNotNull && col("__z").isNotNull)
    // stable ordinal code: 4·[x<=y] + 2·[y<=z] + [x<=z] — ties collapse
    // onto the "appeared-first ranks lower" patterns deterministically
    val code = (col("__x") <= col("__y")).cast("long") * 4L +
      (col("__y") <= col("__z")).cast("long") * 2L +
      (col("__x") <= col("__z")).cast("long")
    val pats = tri.select(pCols :+ code.as("__pat"): _*)
      .groupBy(pCols :+ col("__pat"): _*)
      .agg(count(lit(1)).as("__n"))
    val agg = pats.groupBy(pCols: _*)
      .agg(sum(col("__n")).as("n_triples"),
        count(lit(1)).as("n_patterns"),
        sum(round(col("__n").cast("double") *
          log(col("__n").cast(dec).cast("double")) * lit(1e9), 0).cast(dec))
          .as("__nln"))
    val nD = col("n_triples").cast("double")
    val h = log(nD) - col("__nln").cast("double") / lit(1e9) / nD
    agg.select(pCols :+ col("n_triples") :+ col("n_patterns")
      :+ when(col("n_triples") > 0,
        round(h / log(lit(6.0)), 6)).as("h_norm"): _*)
  }

  def valueAtRisk(df: DataFrame, parts: Seq[String], valueCol: Column,
                  alphaMicro: Long): DataFrame = {
    require(parts.nonEmpty, "valueAtRisk needs series keys")
    require(alphaMicro > 0L && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6): $alphaMicro")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pCols = parts.map(col)
    val counts = df
      .select(pCols :+ (-round(valueCol * lit(1e6), 0).cast("long")).as("__l"): _*)
      .filter(col("__l").isNotNull)
      .groupBy(pCols :+ col("__l"): _*)
      .agg(count(lit(1)).as("__c"))
    val W = Window.partitionBy(pCols: _*)
    val wDesc = W.orderBy(col("__l").desc).rowsBetween(Long.MinValue, 0)
    val cum = counts.select(
      pCols :+ col("__l") :+ col("__c")
        :+ sum(col("__c")).over(wDesc).as("__ct")      // count at-or-above this loss
        :+ sum(col("__c")).over(W).as("__n"): _*)
    // k = ceil(alpha·n) via integer ceiling division (floor of an exact
    // double: the numerator stays < 2^53 for any n < 9e9 rows, so the
    // division is exact; Column./ on longs would otherwise be double
    // anyway); m = n − k + 1
    val m = col("__n") -
      floor((lit(alphaMicro) * col("__n") + lit(999999L)).cast("double") /
        lit(1000000.0)).cast("long") + lit(1L)
    val boundary = col("__ct") >= m && (col("__ct") - col("__c")) < m
    val agg = cum
      .select(pCols :+ col("__n") :+ m.as("__m")
        // full groups strictly inside the tail + the boundary's exact share
        :+ when(col("__ct") <= m, col("__l").cast(dec) * col("__c").cast(dec))
          .when(boundary,
            col("__l").cast(dec) * (m - (col("__ct") - col("__c"))).cast(dec))
          .otherwise(lit(0).cast(dec)).as("__ts")
        :+ when(boundary, col("__l")).as("__var"): _*)
      .groupBy(pCols :+ col("__n").as("n") :+ col("__m").as("__mm"): _*)
      .agg(sum(col("__ts")).as("__tail"), max(col("__var")).as("__v"))
    agg.select(pCols
      :+ col("n")
      :+ (col("n") - col("__mm") + lit(1L)).as("k_rank")
      :+ col("__mm").as("tail_m")
      :+ round(col("__v").cast("double") / lit(1e6), 6).as("var_loss")
      :+ when(col("__mm") >= 1L,
        round(col("__tail").cast("double") / col("__mm").cast("double") / lit(1e6), 6))
        .as("cvar_loss"): _*)
  }
}
