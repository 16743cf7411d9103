package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream: how far each
  * entity progressed through a fixed sequence of step types, matching
  * greedily in event-time order.
  *
  * Not in the reference; engine extension (SURVEY §2.11) — the batch
  * sibling of the sessionization surface in
  * [[graft.streaming.Streaming]].
  *
  * Scale design: ONE hash shuffle (the per-entity aggregation); the scan
  * is a per-row array fold over that entity's events, so state is
  * O(events per entity) — the same bound sessionization already assumes.
  * No joins, no per-step passes: a k-step funnel costs the same shuffle
  * as a 1-step funnel.
  */
object Funnel {

  /** Per-entity furthest step reached.
    *
    * Events are ordered by (`tsCol`, `tieCol`) within each entity and
    * scanned once: step i+1 can only match strictly after the event that
    * matched step i. Returns `(entityCol, max_step)` with `max_step` in
    * `[0, steps.length]`; 0 means the first step never occurred.
    */
  def maxStepReached(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      steps: Seq[String],
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val stepArr = array(steps.map(lit(_)): _*)
    events.groupBy(col(entityCol))
      .agg(collect_list(struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
        col(typeCol).as("et"))).as("__evs"))
      .select(col(entityCol),
        aggregate(array_sort(col("__evs")), lit(0), (step, e) =>
          // try_element_at: 1-based; null (≠ et) once the funnel completes
          when(e.getField("et") === try_element_at(stepArr, step + 1), step + 1)
            .otherwise(step))
          .as("max_step"))
  }

  /** Classic funnel table: how many entities reached step ≥ i, for each
    * step i in 1..k. Composes [[maxStepReached]]; entities that never
    * matched step 1 contribute to no row.
    */
  def funnelCounts(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      steps: Seq[String],
  ): DataFrame =
    maxStepReached(events, entityCol, tsCol, tieCol, typeCol, steps)
      .filter(col("max_step") >= 1)
      .select(explode(sequence(lit(1), col("max_step"))).as("step"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"))

  /** Cohort retention matrix: entities are cohorted by the period of
    * their FIRST event, and each (cohort, period-offset) cell counts the
    * distinct entities from that cohort active in that period —
    * `offset = 0` is the cohort size itself.
    *
    * Shape: one aggregation per entity finds the cohort (min event
    * time); the (entity → cohort) table is entity-sized (not broadcast
    * material), so both sides hash-shuffle on the entity and join
    * co-partitioned; the distinct count then exchanges once more on its
    * own (cohort, offset) keys. Three exchanges, each on the natural
    * clustering of its stage — no per-period passes, no self-joins.
    *
    * @param periodSeconds cohort/activity bucket width (e.g. 7 days)
    * @return (cohort_ts, period, n_active) — `period` counts buckets
    *         since the cohort bucket
    */
  def retentionMatrix(events: DataFrame, entityCol: String, tsCol: String,
                      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be positive: $periodSeconds")
    Guards.requireNoReservedNames(events,
      Seq("cohort_ts", "period", "n_active", "__bucket"), "retentionMatrix")
    val bucket = Timeseries.timeBucket(col(tsCol), periodSeconds)
    val cohorts = events.groupBy(col(entityCol))
      .agg(min(bucket).as("cohort_ts"))
    events.select(col(entityCol), bucket.as("__bucket"))
      .join(cohorts, Seq(entityCol))
      .groupBy(col("cohort_ts"),
        ((unix_micros(col("__bucket")) - unix_micros(col("cohort_ts"))) /
          (periodSeconds * 1000000L)).cast("long").as("period"))
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /** Activity streaks (gaps-and-islands): per entity, the longest run of
    * CONSECUTIVE active periods and the total active-period count — the
    * classic engagement metric, one distinct + one window + one
    * aggregation, all hash-partitioned on the entity (no self-joins, no
    * per-day passes).
    *
    * Periods are `periodSeconds` buckets of event time; the island key
    * is `period_index − row_number` (consecutive periods share it).
    */
  def activityStreaks(events: DataFrame, entityCol: String, tsCol: String,
                      periodSeconds: Long = 86400L): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be positive: $periodSeconds")
    Guards.requireNoReservedNames(events,
      Seq("longest_streak", "n_active_periods", "__day", "__island", "__len"),
      "activityStreaks")
    val day = floor(unix_micros(col(tsCol)) / (periodSeconds * 1000000L)).cast("long")
    val periods = events.select(col(entityCol), day.as("__day")).distinct()
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__day"))
    periods
      .withColumn("__island", col("__day") - row_number().over(w))
      .groupBy(col(entityCol), col("__island"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(entityCol))
      .agg(max(col("__len")).as("longest_streak"),
        sum(col("__len")).as("n_active_periods"))
  }

  /** Item co-occurrence with lift — the market-basket association view
    * of an event stream: for every unordered item pair, how many
    * entities did both, and how far above independence that is
    * (`lift = P(a,b) / (P(a)·P(b))`, > 1 ⇒ positively associated).
    *
    * Shape: entities×items dedupe once (shuffle on entity); the pair
    * join is a self-join CO-PARTITIONED on the entity (one reused
    * exchange), so pair work is bounded by per-entity item counts (k²
    * per entity, k = distinct items an entity touched — bounded by the
    * item vocabulary, NOT the event count). Item marginals broadcast
    * back; entity total rides a 1-row broadcast. Lift is one division
    * of exact long counts — bit-deterministic.
    *
    * @return (item_a, item_b, n_ab, n_a, n_b, lift), item_a < item_b
    */
  def cooccurrenceLift(df: DataFrame, entityCol: String, itemCol: String): DataFrame = {
    Guards.requireNoReservedNames(df,
      Seq("item_a", "item_b", "n_ab", "n_a", "n_b", "lift", "__n_entities"),
      "cooccurrenceLift")
    val items = df.select(col(entityCol), col(itemCol)).distinct()
    val marginals = items.groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
    val nEntities = items.select(col(entityCol)).distinct()
      .agg(count(lit(1)).as("__n_entities"))
    val a = items.toDF(entityCol, "item_a")
    val b = items.toDF(entityCol, "item_b")
    val pairs = a.join(b, Seq(entityCol))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marginals.toDF("item_a", "n_a")), Seq("item_a"))
      .join(broadcast(marginals.toDF("item_b", "n_b")), Seq("item_b"))
      .crossJoin(broadcast(nEntities))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        // each count casts to double BEFORE multiplying: long products of
        // two multi-billion counts overflow (ANSI Spark throws)
        ((col("n_ab").cast("double") * col("__n_entities").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }
}
