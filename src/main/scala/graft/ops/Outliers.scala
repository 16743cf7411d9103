package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — the data-quality gate that runs
  * before a corpus feeds training: flag (or drop) rows whose metric is
  * wildly off its group's distribution, using order statistics (quartiles,
  * median/MAD) that a few extreme values cannot drag around the way a
  * mean/stddev fence can.
  *
  * Execution shape: one hash shuffle on the group keys computes the exact
  * per-group quantiles (Spark's `percentile` — a single-pass typed
  * aggregate, no Expand), then the per-group bounds table joins back onto
  * the rows HINT-FREE: AQE broadcasts it from its measured shuffle size
  * while the group cardinality is small (the common case — categories,
  * sources, shards) and keeps the co-partitioned shuffle join when a
  * per-entity grouping makes the bounds table row-scaled, instead of
  * OOMing the driver on a hard-coded hint. Rows never sort globally.
  * At 100 TB swap `percentile` for `approx_percentile` (t-digest sketch,
  * mergeable, bounded memory) — same plan shape, same API, documented
  * error instead of exact ranks.
  */
object Outliers {

  import Guards.{requireNoReservedNames => guardNames}

  /** Per-group Tukey fences from exact quartiles:
    * `[q1 - k·IQR, q3 + k·IQR]` (classic k = 1.5).
    *
    * @return one row per group: keys, q1, q3, lo, hi
    */
  def iqrBounds(df: DataFrame, groupBy: Seq[String], value: Column, k: Double = 1.5): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(percentile(value, lit(0.25)).as("q1"),
        percentile(value, lit(0.75)).as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))

  /** Flag rows outside their group's Tukey fences. Adds `is_outlier`;
    * the bounds side (one row per group) attaches hint-free — see the
    * object doc for the AQE contract.
    */
  def flagIqrOutliers(df: DataFrame, groupBy: Seq[String], valueCol: String,
                      k: Double = 1.5): DataFrame = {
    guardNames(df, Seq("q1", "q3", "lo", "hi", "is_outlier"), "flagIqrOutliers")
    df.join(iqrBounds(df, groupBy, col(valueCol), k), groupBy)
      .withColumn("is_outlier", col(valueCol) < col("lo") || col(valueCol) > col("hi"))
  }

  /** Per-group median/MAD robust z-score:
    * `|x - median| / MAD > z` where `MAD = median(|x - median|)`.
    * Two chained aggregations over the SAME group partitioning (the
    * second reuses the first's shuffle via the join on group keys);
    * groups whose MAD is 0 (over half the values identical) flag only
    * values strictly different from the median.
    */
  def flagMadOutliers(df: DataFrame, groupBy: Seq[String], valueCol: String,
                      z: Double = 3.5): DataFrame = {
    guardNames(df, Seq("__med", "__mad", "is_outlier"), "flagMadOutliers")
    val med = df.groupBy(groupBy.map(col): _*)
      .agg(median(col(valueCol)).as("__med"))
    val withMed = df.join(med, groupBy)
    val mad = withMed.groupBy(groupBy.map(col): _*)
      .agg(median(abs(col(valueCol) - col("__med"))).as("__mad"))
    withMed.join(mad, groupBy)
      .withColumn("is_outlier",
        when(col("__mad") === 0, col(valueCol) =!= col("__med"))
          .otherwise(abs(col(valueCol) - col("__med")) / col("__mad") > z))
      .drop("__med", "__mad")
  }

  /** Winsorize: clamp a column into its group's exact [pLo, pHi]
    * percentile band — the keep-the-row alternative to dropping
    * outliers (heavy-tailed quality metrics, reward clipping).
    */
  def winsorize(df: DataFrame, groupBy: Seq[String], valueCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1: ($pLo, $pHi)")
    guardNames(df, Seq("__wlo", "__whi"), "winsorize")
    val bounds = df.groupBy(groupBy.map(col): _*)
      .agg(percentile(col(valueCol), lit(pLo)).as("__wlo"),
        percentile(col(valueCol), lit(pHi)).as("__whi"))
    df.join(bounds, groupBy)
      .withColumn(valueCol,
        // greatest/least SKIP nulls, so an unguarded clamp would turn a
        // null value into the group's lower bound — keep nulls null
        // (pandas clip semantics)
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }

  /** Top-k bivariate Mahalanobis outliers — "which rows are jointly
    * anomalous?" where per-column z-scores miss points that are normal
    * on each axis but off the correlation ridge:
    *
    *   d² = n(n−1) · (dx²·Myy − 2·dx·dy·Mxy + dy²·Mxx) / (Mxx·Myy − Mxy²)
    *
    * (the closed-form 2×2 inverse over exact moment combinations
    * M_ab = n·Σab − Σa·Σb; dx/dy are deviations from the means).
    *
    * Determinism: micro-quantized inputs, exact DECIMAL moments
    * broadcast as a 1-row frame, one fixed IEEE tree per row; the kept
    * set orders by the 9-dp-rounded d² with the key tiebreak.
    *
    * Scale shape: one grand aggregation + a broadcast + a narrow
    * scoring projection + TakeOrderedAndProject — joint outlier
    * screening at 100 TB is two scans and no shuffle of data rows.
    */
  def mahalanobisTopK(df: DataFrame, keyCols: Seq[String], x: Column,
                      y: Column, k: Int): DataFrame = {
    require(keyCols.nonEmpty, "need tiebreak key columns")
    require(k >= 1, s"k must be positive: $k")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast(dec)
    val base = df
      .select(keyCols.map(col) :+ q(x).as("__x") :+ q(y).as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val m = base.agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("__n").cast("double")
    val mxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val myy = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val mxy = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val stats = m.select(nD.as("__nD"),
      (col("__sx").cast("double") / nD).as("__xbar"),
      (col("__sy").cast("double") / nD).as("__ybar"),
      mxx.as("__mxx"), myy.as("__myy"), mxy.as("__mxy"))
    val dx = col("__x").cast("double") - col("__xbar")
    val dy = col("__y").cast("double") - col("__ybar")
    val det = col("__mxx") * col("__myy") - col("__mxy") * col("__mxy")
    val d2 = col("__nD") * (col("__nD") - lit(1.0)) *
      (dx * dx * col("__myy") - lit(2.0) * dx * dy * col("__mxy")
        + dy * dy * col("__mxx")) / det
    base.crossJoin(broadcast(stats))
      .filter(col("__nD") >= 3.0 && det > 0.0)
      .withColumn("__d9", round(d2, 9))
      .orderBy(col("__d9").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
      .select(keyCols.map(col) ++ Seq(
        (col("__x").cast("double") / lit(1e6)).as("x"),
        (col("__y").cast("double") / lit(1e6)).as("y"),
        round(d2, 6).as("d2")): _*)
  }
}
