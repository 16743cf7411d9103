package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.{assertDfEquality, createDf}

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val steps = Seq("view", "click", "buy")

  private def events(rows: Seq[(Int, Int, String)]) =
    createDf(spark, "u int, ts int, et string",
      rows.map { case (u, ts, et) => Seq[Any](u, ts, et) })

  private def maxSteps(rows: Seq[(Int, Int, String)]): Map[Int, Int] =
    Funnel.maxStepReached(events(rows), "u", "ts", "ts", "et", steps)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("full in-order sequence reaches the last step") {
    assert(maxSteps(Seq((1, 1, "view"), (1, 2, "click"), (1, 3, "buy"))) == Map(1 -> 3))
  }

  test("steps must occur strictly after the previous match") {
    // click BEFORE the first view doesn't count; the later click does
    assert(maxSteps(Seq((1, 1, "click"), (1, 2, "view"), (1, 3, "click"))) == Map(1 -> 2))
    // buy before click: sequence stalls at click... which never comes
    assert(maxSteps(Seq((2, 1, "view"), (2, 2, "buy"))) == Map(2 -> 1))
  }

  test("interleaved noise events are ignored") {
    assert(maxSteps(Seq((1, 1, "x"), (1, 2, "view"), (1, 3, "x"),
      (1, 4, "click"), (1, 5, "x"), (1, 6, "buy"))) == Map(1 -> 3))
  }

  test("entities that never match step 1 report 0") {
    assert(maxSteps(Seq((1, 1, "click"), (1, 2, "buy"))) == Map(1 -> 0))
  }

  test("repeated step types advance at the first eligible occurrence only") {
    // view view click: second view is noise once step 1 matched
    assert(maxSteps(Seq((1, 1, "view"), (1, 2, "view"), (1, 3, "click"))) == Map(1 -> 2))
  }

  test("events arriving out of order are sorted by (ts, tie) before the scan") {
    val shuffled = Seq((1, 3, "buy"), (1, 1, "view"), (1, 2, "click"))
    assert(maxSteps(shuffled) == Map(1 -> 3))
  }

  test("funnelCounts produces the cumulative step >= i table") {
    val rows = Seq(
      (1, 1, "view"), (1, 2, "click"), (1, 3, "buy"), // reaches 3
      (2, 1, "view"), (2, 2, "click"),                // reaches 2
      (3, 1, "view"),                                 // reaches 1
      (4, 1, "click"))                                // reaches 0
    val got = Funnel.funnelCounts(events(rows), "u", "ts", "ts", "et", steps)
    val want = createDf(spark, "step int, n_users bigint",
      Seq(Seq[Any](1, 3L), Seq[Any](2, 2L), Seq[Any](3, 1L)))
    assertDfEquality(got, want, ignoreRowOrder = true)
  }

  test("randomized model check: 200 users × random streams match a driver-side greedy scan") {
    val rnd = new scala.util.Random(23)
    val types = Vector("a", "b", "c", "d", "x")
    val rows = (1 to 200).flatMap { u =>
      val n = rnd.nextInt(25)
      (1 to n).map(_ => (u, rnd.nextInt(8), types(rnd.nextInt(types.size))))
    }
    // tie-break on a unique event id so the scan order is total
    val withId = rows.zipWithIndex.map { case ((u, ts, et), i) => (u, ts, i, et) }
    val df = createDf(spark, "u int, ts int, eid int, et string",
      withId.map(r => Seq[Any](r._1, r._2, r._3, r._4)))
    for (steps <- Seq(Seq("a", "b", "c"), Seq("x", "a"), Seq("d"))) {
      val got = Funnel.maxStepReached(df, "u", "ts", "eid", "et", steps)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = withId.groupBy(_._1).view.mapValues { evs =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        sorted.foldLeft(0) { (step, e) =>
          if (step < steps.length && e._4 == steps(step)) step + 1 else step
        }
      }.toMap
      assert(got == want, s"model mismatch for steps=$steps")
    }
  }

  test("funnel plans exactly one hash exchange (single-shuffle k-step funnel)") {
    val df = Funnel.maxStepReached(events(Seq((1, 1, "view"))), "u", "ts", "ts", "et", steps)
    val p = df.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected 1 hash exchange, found $n:\n${p.take(1500)}")
  }

  test("retentionMatrix: cohort by first-event bucket, offsets count distinct actives") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val e = createDf(spark, "u bigint, ts timestamp", Seq(
      // u1: cohort week 0, active weeks 0 and 2 (twice in week 2 -> still 1)
      Seq[Any](1L, t("2024-01-01 10:00:00")),
      Seq[Any](1L, t("2024-01-15 10:00:00")),
      Seq[Any](1L, t("2024-01-16 10:00:00")),
      // u2: cohort week 0, active week 0 only
      Seq[Any](2L, t("2024-01-02 09:00:00")),
      // u3: cohort week 1, active weeks 1 and 2
      Seq[Any](3L, t("2024-01-08 09:00:00")),
      Seq[Any](3L, t("2024-01-15 09:00:00"))))
    // format in-session (UTC): Timestamp.toString would use the JVM zone
    val got = Funnel.retentionMatrix(e, "u", "ts", 7L * 24 * 3600)
      .select(date_format(col("cohort_ts"), "yyyy-MM-dd").as("c"), col("period"),
        col("n_active"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // week buckets are epoch-aligned (1970-01-01 was a Thursday): the
    // bucket containing 2024-01-01 starts 2023-12-28
    assert(got == Map(
      ("2023-12-28", 0L) -> 2L, ("2023-12-28", 2L) -> 1L,
      ("2024-01-04", 0L) -> 1L, ("2024-01-04", 1L) -> 1L))
  }

  test("retentionMatrix: offset-0 cell equals the cohort size") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val e = createDf(spark, "u bigint, ts timestamp",
      (1L to 20L).map(u => Seq[Any](u, t(f"2024-01-${(u % 5 + 1).toInt}%02d 08:00:00"))))
    val rows = Funnel.retentionMatrix(e, "u", "ts", 7L * 24 * 3600)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // single-event users: every cell is offset 0, cells sum to the user count
    assert(rows.forall(_._1 == 0L) && rows.map(_._2).sum == 20L)
  }

}

class HistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def values(vs: Seq[Double]) =
    createDf(spark, "x double", vs.map(v => Seq[Any](v)))

  test("bins partition [lo, hi) with under/overflow tails; counts sum to n") {
    val df = values(Seq(-5.0, 0.0, 0.5, 1.0, 3.9, 4.0, 7.5, 100.0))
    val got = Profile.histogram(df, "x", 0.0, 4.0, 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // [-inf,0): -5 | [0,1): 0.0, 0.5 | [1,2): 1.0 | [3,4): 3.9 | [4,inf): 4.0, 7.5, 100
    assert(got == Map(-1 -> 1L, 0 -> 2L, 1 -> 1L, 3 -> 1L, 4 -> 3L))
    assert(got.values.sum == 8L)
  }

  test("bin_lo is the inclusive left edge; null on outlier bins") {
    val rows = Profile.histogram(values(Seq(-1.0, 2.5, 99.0)), "x", 0.0, 10.0, 5)
      .collect().map(r => (r.getInt(0), Option(r.get(2)))).toMap
    assert(rows(1).contains(2.0))
    assert(rows(-1).isEmpty && rows(5).isEmpty)
  }

  test("nulls are dropped, not binned") {
    val df = createDf(spark, "x double", Seq(Seq[Any](1.0), Seq[Any](null)))
    val total = Profile.histogram(df, "x", 0.0, 4.0, 2)
      .agg(sum("n")).head().getLong(0)
    assert(total == 1L)
  }

  test("values at the top edge land in overflow, just-under stays in the last bin") {
    val got = Profile.histogram(values(Seq(3.9999999, 4.0)), "x", 0.0, 4.0, 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L, 4 -> 1L))
  }

  test("cooccurrenceLift: counts from distinct entity-item pairs, lift from independence") {
    // u1: {a,b}, u2: {a,b}, u3: {a,c}, u4: {b} (b twice — dedup counts once)
    val df = createDf(spark, "u int, item string",
      Seq(Seq[Any](1, "a"), Seq[Any](1, "b"), Seq[Any](2, "a"), Seq[Any](2, "b"),
        Seq[Any](3, "a"), Seq[Any](3, "c"), Seq[Any](4, "b"), Seq[Any](4, "b")))
    val got = Funnel.cooccurrenceLift(df, "u", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // n=4 entities; a:3, b:3, c:1; ab:2, ac:1
    assert(got(("a", "b")) == (2L, 3L, 3L, 2.0 * 4 / 9))
    assert(got(("a", "c")) == (1L, 3L, 1L, 1.0 * 4 / 3))
    assert(!got.contains(("b", "c")))
  }

  test("activityStreaks: consecutive periods chain, gaps break, duplicates collapse") {
    // user 1: days 0,1,2 then 5,6 (two events on day 1); user 2: day 9 only
    def at(day: Long, s: Int) = new java.sql.Timestamp((day * 86400 + s) * 1000L)
    val df = createDf(spark, Seq("u", "ts"),
      Seq(Seq[Any](1, at(0, 10)), Seq[Any](1, at(1, 20)), Seq[Any](1, at(1, 99)),
        Seq[Any](1, at(2, 5)), Seq[Any](1, at(5, 0)), Seq[Any](1, at(6, 0)),
        Seq[Any](2, at(9, 0))))
    val got = Funnel.activityStreaks(df, "u", "ts")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1) == (3L, 5L)) // longest 0-1-2; 5 distinct active days
    assert(got(2) == (1L, 1L))
  }

  test("cooccurrenceLift: pair orientation is canonical (item_a < item_b)") {
    val df = createDf(spark, "u int, item string",
      Seq(Seq[Any](1, "z"), Seq[Any](1, "a")))
    val r = Funnel.cooccurrenceLift(df, "u", "item").head()
    assert(r.getString(0) == "a" && r.getString(1) == "z")
  }

  test("transitionMatrix: consecutive pairs per entity, row-normalized") {
    // u1: a->b->a ; u2: a->b ; entity boundary never produces a pair
    val df = createDf(spark, "u int, ts int, eid int, et string", Seq(
      Seq[Any](1, 1, 1, "a"), Seq[Any](1, 2, 2, "b"), Seq[Any](1, 3, 3, "a"),
      Seq[Any](2, 1, 4, "a"), Seq[Any](2, 2, 5, "b")))
    val got = Funnel.transitionMatrix(df, "u", "ts", "eid", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // row-normalized WITHIN from_type: all 'b' departures go to 'a'
    assert(got == Map(("a", "b") -> (2L, 1.0), ("b", "a") -> (1L, 1.0)))
  }

  test("transitionMatrix: ties order by the tie column, not scan order") {
    // same ts: eid decides a->b (not b->a)
    val df = createDf(spark, "u int, ts int, eid int, et string", Seq(
      Seq[Any](1, 5, 2, "b"), Seq[Any](1, 5, 1, "a")))
    val got = Funnel.transitionMatrix(df, "u", "ts", "eid", "et")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("rollingActiveEntities: trailing window counts distinct, clips past last period") {
    // periods (1s buckets): u1 active at 1 and 3; u2 at 1
    val df = createDf(spark, "u int, ts int", Seq(
      Seq[Any](1, 1), Seq[Any](1, 3), Seq[Any](1, 3), Seq[Any](2, 1)))
      .withColumn("tsz", timestamp_seconds(col("ts")))
    val got = Funnel.rollingActiveEntities(df, "u", "tsz",
        windowPeriods = 2, periodSeconds = 1L)
      .collect().map(r => r.getTimestamp(0).getTime / 1000 -> r.getLong(1)).toMap
    // p1: {u1,u2}; p2 (carry from p1): {u1,u2}; p3: {u1}; p4 clipped
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("rollingActiveEntitiesApprox: sparse-exact at small cardinality, same periods as exact") {
    val df = createDf(spark, "u int, ts int", Seq(
      Seq[Any](1, 1), Seq[Any](1, 3), Seq[Any](2, 1), Seq[Any](3, 3)))
      .withColumn("tsz", timestamp_seconds(col("ts")))
    val exact = Funnel.rollingActiveEntities(df, "u", "tsz", 2, 1L)
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val approx = Funnel.rollingActiveEntitiesApprox(df, "u", "tsz", 2, 1L)
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    assert(approx == exact) // HLL is exact in sparse mode at this size
  }

  test("timeToConvert: first conversion at/after first trigger; non-converters absent") {
    def at(s: Int) = new java.sql.Timestamp(s * 1000L)
    val df = createDf(spark, Seq("u", "ts", "et"), Seq(
      // u1: purchase BEFORE signup ignored; first purchase after = t5
      Seq[Any](1, at(2), "purchase"), Seq[Any](1, at(3), "signup"),
      Seq[Any](1, at(5), "purchase"), Seq[Any](1, at(9), "purchase"),
      // u2: converts at the SAME instant (>= contract)
      Seq[Any](2, at(4), "signup"), Seq[Any](2, at(4), "purchase"),
      // u3: signup only; u4: purchase only — both absent
      Seq[Any](3, at(1), "signup"), Seq[Any](4, at(1), "purchase")))
    val got = Funnel.timeToConvert(df, "u", "ts", "et", "signup", "purchase")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got == Map(1 -> 2000000L, 2 -> 0L))
  }

  test("associationRules: hand-checked support/confidence/lift, both directions") {
    // baskets: {a,b}, {a,b}, {a}, {b,c} -> N=4, n_a=3, n_b=3, n_c=1
    val df = createDf(spark, "e int, it string", Seq(
      Seq[Any](1, "a"), Seq[Any](1, "b"),
      Seq[Any](2, "a"), Seq[Any](2, "b"),
      Seq[Any](3, "a"),
      Seq[Any](4, "b"), Seq[Any](4, "c")))
    val got = Funnel.associationRules(df, "e", "it")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // a->b: n_ab=2, support 0.5, conf 2/3, lift 4*2/(3*3)
    assert(got(("a", "b")) == ((2L, 0.5, 0.666667, 0.888889)))
    // b->a: same joint, different confidence base (also 3 here)
    assert(got(("b", "a"))._1 == 2L)
    // b->c vs c->b: confidence is directional — 1/3 vs 1/1
    assert(got(("b", "c"))._3 == 0.333333 && got(("c", "b"))._3 == 1.0)
  }

  test("associationRules: minPairCount prunes before scoring; duplicates collapse") {
    val df = createDf(spark, "e int, it string", Seq(
      Seq[Any](1, "a"), Seq[Any](1, "a"), Seq[Any](1, "b"), // dup (1,a)
      Seq[Any](2, "a"), Seq[Any](2, "b"),
      Seq[Any](3, "a"), Seq[Any](3, "c")))
    val all = Funnel.associationRules(df, "e", "it").collect()
    assert(all.length == 4) // (a,b)x2 + (a,c)x2
    val pruned = Funnel.associationRules(df, "e", "it", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set("a" -> "b", "b" -> "a")) // (a,c) joint=1 drops
  }

  test("transitionMatrix and timeToConvert plan one entity exchange each") {
    val df = createDf(spark, "u int, ts int, eid int, et string",
        Seq(Seq[Any](1, 1, 1, "a")))
      .withColumn("tsz", timestamp_seconds(col("ts")))
    for (q <- Seq(
        Funnel.transitionMatrix(df, "u", "tsz", "eid", "et"),
        Funnel.timeToConvert(df, "u", "tsz", "et", "a", "b"))) {
      val p = q.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning\\(u".r.findAllIn(p).length
      assert(n == 1, s"expected 1 entity exchange, found $n:\n${p.take(1500)}")
    }
  }
}
