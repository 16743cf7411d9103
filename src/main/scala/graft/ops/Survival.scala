package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — retention/churn
  * curves ("what fraction of users survive past day t?") where naive
  * averages are biased by subjects still alive at observation end.
  *
  * Not in the reference; engine extension (SURVEY §2.11).
  */
object Survival {

  /** Kaplan-Meier product-limit estimator: one row per subject in
    * (`duration`, `event`) — event 1 = the terminal event was OBSERVED
    * at `duration`, 0 = censored there (still alive when observation
    * ended; it leaves the risk set without dropping the curve).
    * Returns per distinct duration `(t, n_risk, n_event, n_censor,
    * survival)` with
    *
    *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
    *
    * — the curve steps down only at event times; censoring shrinks the
    * later risk sets instead.
    *
    * Determinism: nᵢ and dᵢ are exact longs; each factor's
    * `ln((n−d)/n)` takes an argument built by ONE double division of
    * exact integers (identical in every engine), nano-quantizes, and
    * prefix-sums exactly; one final `exp`, 6 dp. A time where d = n
    * (everyone left by event) zeroes the curve exactly from there on
    * (the log path would be −∞) via a prefix max flag.
    *
    * Scale shape: one map-side-combined aggregation keyed on duration
    * reduces subjects to the duration-level table; the three
    * whole-frame windows (risk set, log prefix, zero flag) run over
    * THAT table — rows = distinct durations, bounded by the time
    * domain, never by subjects (the q_drift bin-table doctrine).
    */
  def kaplanMeier(df: DataFrame, duration: Column, event: Column): DataFrame = {
    val byT = df
      .select(duration.cast("long").as("t"), event.cast("long").as("__e"))
      .groupBy(col("t"))
      .agg(sum(col("__e")).as("n_event"), count(lit(1)).as("__leave"))
    val W = Window.orderBy(col("t"))
    val before = W.rowsBetween(Window.unboundedPreceding, -1)
    val upto = W.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byT.agg(sum(col("__leave")).as("__N"))
    val lnArg = (col("n_risk") - col("n_event")).cast("double") /
      col("n_risk").cast("double")
    val lnTerm = when(col("n_event") > 0 && col("n_event") < col("n_risk"),
      round(log(lnArg) * lit(1e9), 0).cast("long")).otherwise(lit(0L))
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("__N") - coalesce(sum(col("__leave")).over(before), lit(0L)))
      .withColumn("n_censor", col("__leave") - col("n_event"))
      .withColumn("__cln", sum(lnTerm).over(upto))
      .withColumn("__zero", max(
        when(col("n_event") === col("n_risk") && col("n_event") > 0, 1L)
          .otherwise(0L)).over(upto))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censor"),
        when(col("__zero") === 1L, lit(0.0))
          .otherwise(round(exp(col("__cln").cast("double") / lit(1e9)), 6))
          .as("survival"))
  }

  /** Nelson-Aalen cumulative hazard — [[kaplanMeier]]'s additive
    * companion (H(t) estimates cumulative RISK; −ln S approximates it,
    * but NA is the direct estimator with better small-risk-set
    * behavior):
    *
    *   H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ ,  Var = Σ dᵢ/nᵢ²
    *
    * Returns per distinct duration `(t, n_risk, n_event, n_censor,
    * hazard, hazard_se)`, 6 dp.
    *
    * Determinism: each step's d/n and d/n² are fixed IEEE trees over
    * exact longs, nano-quantized before the exact prefix sums — the
    * [[kaplanMeier]] discipline with the exp/ln dropped (hazard is
    * additive, so no log detour is needed).
    *
    * Scale shape: identical to [[kaplanMeier]] — duration-keyed
    * reduction, whole-frame windows bounded by distinct durations.
    */
  def nelsonAalen(df: DataFrame, duration: Column, event: Column): DataFrame = {
    val byT = df
      .select(duration.cast("long").as("t"), event.cast("long").as("__e"))
      .groupBy(col("t"))
      .agg(sum(col("__e")).as("n_event"), count(lit(1)).as("__leave"))
    val W = Window.orderBy(col("t"))
    val before = W.rowsBetween(Window.unboundedPreceding, -1)
    val upto = W.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byT.agg(sum(col("__leave")).as("__N"))
    val hTerm = when(col("n_event") > 0,
      round(col("n_event").cast("double") / col("n_risk").cast("double")
        * lit(1e9), 0).cast("long")).otherwise(lit(0L))
    val vTerm = when(col("n_event") > 0,
      round(col("n_event").cast("double")
        / (col("n_risk").cast("double") * col("n_risk").cast("double"))
        * lit(1e9), 0).cast("long")).otherwise(lit(0L))
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("__N") - coalesce(sum(col("__leave")).over(before), lit(0L)))
      .withColumn("n_censor", col("__leave") - col("n_event"))
      .withColumn("__ch", sum(hTerm).over(upto))
      .withColumn("__cv", sum(vTerm).over(upto))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censor"),
        round(col("__ch").cast("double") / lit(1e9), 6).as("hazard"),
        round(sqrt(col("__cv").cast("double") / lit(1e9)), 6).as("hazard_se"))
  }
}
