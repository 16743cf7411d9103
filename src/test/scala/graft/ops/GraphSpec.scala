package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edges(es: (Int, Int)*) =
    createDf(spark, "s int, t int", es.map { case (a, b) => Seq[Any](a, b) })

  test("personalizedPageRank: mass stays in the seed's reachable component") {
    val g = edges(1 -> 2, 3 -> 4)
    val seeds = createDf(spark, "n int", Seq(Seq[Any](1)))
    val r = Graph.personalizedPageRank(g, "s", "t", seeds, "n", iterations = 6)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(1) > 0 && r(2) > 0)
    assert(r(3) == 0L && r(4) == 0L) // unreachable from the seed: zero rank
    assert(r(1) == 1000000000000L * 15 / 100) // pure restart mass, no inflow
  }

  test("personalizedPageRank with ALL nodes as seeds equals plain pageRank") {
    val g = edges(1 -> 2, 2 -> 3, 3 -> 1, 1 -> 3)
    val allNodes = createDf(spark, "n int", Seq(1, 2, 3).map(i => Seq[Any](i)))
    val ppr = Graph.personalizedPageRank(g, "s", "t", allNodes, "n", iterations = 7)
      .orderBy("node").collect().toSeq
    val pr = Graph.pageRank(g, "s", "t", iterations = 7)
      .orderBy("node").collect().toSeq
    assert(ppr == pr) // uniform restart = the standard recurrence, bit-exact
  }

  test("personalizedPageRank raises when no seed is in the graph") {
    val g = edges(1 -> 2)
    val seeds = createDf(spark, "n int", Seq(Seq[Any](99)))
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(g, "s", "t", seeds, "n", iterations = 2)
    }
  }

  test("labelPropagation: disjoint triangles each converge to their min id") {
    val g = edges(1 -> 2, 2 -> 3, 3 -> 1, 10 -> 11, 11 -> 12, 12 -> 10)
    val l = Graph.labelPropagation(g, "s", "t", rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(l == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10, 12 -> 10))
  }

  test("labelPropagation: synchronous 2-cycle on a single edge is deterministic per round count") {
    val g = edges(1 -> 2)
    val r1 = Graph.labelPropagation(g, "s", "t", rounds = 1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val r2 = Graph.labelPropagation(g, "s", "t", rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(r1 == Map(1 -> 2, 2 -> 1)) // swapped
    assert(r2 == Map(1 -> 1, 2 -> 2)) // swapped back: bipartite oscillation
  }

  test("labelPropagation: vote ties break to the smaller label, duplicates/orientation collapse") {
    // node 5 sees {1, 9} once each -> tie -> label 1; reversed+duplicate
    // edges must not double a vote
    val g = edges(1 -> 5, 5 -> 1, 9 -> 5, 9 -> 5)
    val l = Graph.labelPropagation(g, "s", "t", rounds = 1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(l(5) == 1)
  }

  test("labelPropagation is partitioning-invariant") {
    val es = (0 until 60).map(i => (i, (i + 1) % 20 + (i / 20) * 20))
    val g1 = edges(es: _*).coalesce(1)
    val g2 = edges(es: _*).repartition(7)
    val a = Graph.labelPropagation(g1, "s", "t", rounds = 3).orderBy("node").collect().toSeq
    val b = Graph.labelPropagation(g2, "s", "t", rounds = 3).orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("symmetric cycle converges to equal ranks") {
    val g = edges(1 -> 2, 2 -> 3, 3 -> 1)
    val r = Graph.pageRank(g, "s", "t", iterations = 10)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r.values.toSet.size == 1) // perfectly symmetric
    assert(math.abs(r(1) - 1000000000000L / 3) < 1000000L)
  }

  test("a sink-heavy hub outranks its spokes (run past the 2-cycle oscillation)") {
    // star: everyone points at 9; the 1<->9 cycle oscillates with
    // amplitude x0.7225 per round trip, so convergence needs iterations
    val g = edges(1 -> 9, 2 -> 9, 3 -> 9, 9 -> 1)
    val r = Graph.pageRank(g, "s", "t", iterations = 40)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(9) > r(1) && r(1) > r(2))
    assert(r(2) == r(3)) // symmetric spokes tie exactly (integer math)
  }

  test("without dangling nodes, mass is conserved up to truncation drain") {
    val g = edges(1 -> 2, 2 -> 1, 1 -> 3, 3 -> 1)
    val total = Graph.pageRank(g, "s", "t", iterations = 5)
      .agg(sum("rank")).head().getLong(0)
    assert(total <= 1000000000000L)
    assert(total > 999999000000L) // only integer-div remainders leak
  }

  test("a dangling node drains mass but ranks stay positive and ordered") {
    val g = edges(1 -> 2, 2 -> 1, 1 -> 3) // 3 absorbs and re-emits nothing
    val r = Graph.pageRank(g, "s", "t", iterations = 5)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r.values.forall(_ > 0))
    assert(r(1) > r(3)) // 3 only receives half of 1's emission
  }

  test("deterministic across partitionings (integer arithmetic)") {
    val g = edges(1 -> 2, 2 -> 3, 3 -> 1, 1 -> 3, 4 -> 1)
    val a = Graph.pageRank(g, "s", "t", 8).collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(g.repartition(7), "s", "t", 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("duplicate edges collapse (unweighted)") {
    val once = Graph.pageRank(edges(1 -> 2, 2 -> 1), "s", "t", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val dup = Graph.pageRank(edges(1 -> 2, 1 -> 2, 2 -> 1), "s", "t", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(once == dup)
  }

  test("non-broadcast degrade path (threshold disabled) is bit-identical to the broadcast path") {
    // Size-based join decision: with autoBroadcastJoinThreshold disabled,
    // pageRank must fall back to the co-partitioned shuffle join and —
    // integer arithmetic being order-free across partitionings — produce
    // the exact same ranks.
    val g = edges(1 -> 2, 2 -> 3, 3 -> 1, 1 -> 3, 4 -> 1, 2 -> 4)
    val viaBroadcast = Graph.pageRank(g, "s", "t", 7)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val viaShuffle = Graph.pageRank(g, "s", "t", 7)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(viaShuffle == viaBroadcast)
    } finally spark.conf.set(key, saved)
  }

  test("broadcast decision flips at the size threshold, both branches bit-identical (VERDICT r14 #8)") {
    // Pin the flip point itself, not just the disabled short-circuit:
    // Hints.fitsBroadcast(rows, rowBytes) must flip exactly where
    // rows * rowBytes crosses the session threshold...
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      assert(Hints.fitsBroadcast(spark, rows = 32L, rowBytes = 32L))   // 1024 == thr
      assert(!Hints.fitsBroadcast(spark, rows = 33L, rowBytes = 32L))  // 1056 > thr
      // ...and pageRank's size-based branch must actually ENGAGE the
      // non-broadcast path past it: with a 64-byte threshold the 4-node
      // probe (4 * 32 B) overflows, so this exercises the positive-
      // threshold flip (not the -1 short-circuit) and the ranks must
      // still be bit-identical — the integer recurrence is order-free.
      val g = edges(1 -> 2, 2 -> 3, 3 -> 1, 1 -> 3, 4 -> 1, 2 -> 4)
      spark.conf.set(key, "64")
      assert(!Hints.fitsBroadcast(spark, rows = 4L, rowBytes = 32L))
      val viaShuffle = Graph.pageRank(g, "s", "t", 7)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      spark.conf.set(key, saved)
      val viaBroadcast = Graph.pageRank(g, "s", "t", 7)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(viaShuffle == viaBroadcast)
    } finally spark.conf.set(key, saved)
  }

  private def triangles(es: (Int, Int)*): Long =
    Graph.triangleCount(edges(es: _*), "s", "t").head().getLong(0)

  test("triangleCount: K4 has 4 triangles, a 4-cycle has none") {
    assert(triangles(1 -> 2, 1 -> 3, 1 -> 4, 2 -> 3, 2 -> 4, 3 -> 4) == 4L)
    assert(triangles(1 -> 2, 2 -> 3, 3 -> 4, 4 -> 1) == 0L)
  }

  test("triangleCount: pendant edges don't create triangles") {
    assert(triangles(1 -> 2, 2 -> 3, 1 -> 3, 3 -> 4) == 1L)
  }

  test("triangleCount: reversed duplicates, repeats, and self-loops collapse") {
    assert(triangles(1 -> 2, 2 -> 1, 2 -> 3, 3 -> 2, 1 -> 3,
      1 -> 3, 1 -> 1, 2 -> 2) == 1L)
  }

  test("triangleCount: matches naive enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = (1 to 120).map(_ => (rnd.nextInt(15) + 1, rnd.nextInt(15) + 1))
    val canon = es.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val set = canon.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val want = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if set((i, j)) && set((i, k)) && set((j, k))
    } yield 1).size.toLong
    assert(triangles(es: _*) == want)
  }

  private def core(k: Int, es: (Int, Int)*): Map[Int, Long] =
    Graph.kCore(edges(es: _*), "s", "t", k)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("kCore: triangle survives k=2, pendant chain peels away in cascade") {
    // triangle 1-2-3 plus tail 3-4-5: removing 5 drops 4, then nothing
    val got = core(2, 1 -> 2, 2 -> 3, 1 -> 3, 3 -> 4, 4 -> 5)
    assert(got == Map(1 -> 2L, 2 -> 2L, 3 -> 2L))
  }

  test("kCore: a pure path fully unravels (multi-round cascade to empty)") {
    assert(core(2, 1 -> 2, 2 -> 3, 3 -> 4, 4 -> 5).isEmpty)
  }

  test("kCore: k=1 keeps every non-isolated node with its degree") {
    val got = core(1, 1 -> 2, 2 -> 3)
    assert(got == Map(1 -> 1L, 2 -> 2L, 3 -> 1L))
  }

  test("kCore: k above the max degree yields an empty core") {
    assert(core(5, 1 -> 2, 1 -> 3, 1 -> 4, 2 -> 3).isEmpty)
  }

  test("kCore: every member's core degree is >= k (K5 minus an edge, k=3)") {
    val es = for { i <- 1 to 5; j <- (i + 1) to 5
                   if !(i == 1 && j == 2) } yield i -> j
    val got = core(3, es: _*)
    assert(got.nonEmpty && got.values.forall(_ >= 3L))
  }

  test("triangleCount plans no cartesian product or nested-loop join") {
    val plan = Graph.triangleCount(edges(1 -> 2, 2 -> 3, 1 -> 3), "s", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  private def hitsMap(iters: Int, es: (Int, Int)*): Map[Int, (Long, Long)] =
    Graph.hits(edges(es: _*), "s", "t", iterations = iters)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: pure hub points at pure authorities — roles separate exactly") {
    // 1 -> 2, 1 -> 3: node 1 is the only hub; 2 and 3 the only authorities
    val r = hitsMap(3, 1 -> 2, 1 -> 3)
    assert(r(1)._1 == 1000000000L && r(1)._2 == 0L) // max hub, zero auth
    assert(r(2) == ((0L, 1000000000L)) && r(3) == ((0L, 1000000000L)))
  }

  test("hits: the consensus authority outranks a single-endorsement one") {
    // 1,2,3 all point at 4; only 3 points at 5
    val r = hitsMap(3, 1 -> 4, 2 -> 4, 3 -> 4, 3 -> 5)
    // the top authority sits at ~unit (truncating scalar div leaves the
    // max in [unit, 2·unit), never exactly unit unless s divides evenly)
    assert(r(4)._2 >= 1000000000L && r(4)._2 < 2000000000L)
    assert(r(5)._2 < r(4)._2 && r(5)._2 > 0L) // endorsed, but less
    assert(r(3)._1 > r(1)._1)                 // 3 hubs two auths: best hub
  }

  test("hits is partitioning-invariant (exact integers both ways)") {
    val es = Seq(1 -> 2, 2 -> 3, 3 -> 1, 1 -> 3, 4 -> 2)
    val a = hitsMap(4, es: _*)
    val b = Graph.hits(edges(es: _*).repartition(7), "s", "t", iterations = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
  }

  private def lp(cap: Int, excl: Boolean, es: (Int, Int)*): Map[(Int, Int), (Long, Long, Long)] =
    Graph.linkPrediction(edges(es: _*), "s", "t", maxCenterDegree = cap,
        excludeExisting = excl)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("linkPrediction: hand-checked wedge — RA is exact 1e9/deg, AA is nano-quantized 1/ln") {
    // path 1-2-3: center 2 (deg 2) predicts the (1,3) link
    val r = lp(100, excl = true, 1 -> 2, 2 -> 3)
    assert(r.keySet == Set(1 -> 3))
    val (n, aa, ra) = r(1 -> 3)
    assert(n == 1L && ra == 500000000L) // 1e9 div 2
    assert(aa == math.round(1e9 / math.log(2.0))) // 1442695041
  }

  test("linkPrediction: existing edges drop by default, score in similarity mode") {
    // triangle 1-2-3: every pair is linked -> nothing to predict
    assert(lp(100, excl = true, 1 -> 2, 2 -> 3, 1 -> 3).isEmpty)
    val sim = lp(100, excl = false, 1 -> 2, 2 -> 3, 1 -> 3)
    assert(sim.keySet == Set(1 -> 2, 1 -> 3, 2 -> 3)) // each via the third node
  }

  test("linkPrediction: the degree cap excludes hub centers and their near-zero mass") {
    // star center 9 with 5 spokes, plus path 1-2-3 (center 2, deg 2)
    val star = (1 to 5).map(i => 9 -> i)
    val es = star ++ Seq(1 -> 2, 2 -> 3)
    val capped = lp(4, excl = true, es: _*) // star center deg 5+... excluded
    // only center 2's wedge survives: (1,3) via 2 — 2's degree is 3 (1, 3, 9)
    assert(capped.keySet == Set(1 -> 3))
    assert(capped(1 -> 3)._3 == 1000000000L / 3)
    val uncapped = lp(100, excl = true, es: _*)
    assert(uncapped.size > capped.size) // star wedges reappear
  }

  private def mod(labels: Map[Int, Int], es: (Int, Int)*): Double = {
    val lab = createDf(spark, "node int, label int",
      labels.toSeq.map { case (n, l) => Seq[Any](n, l) })
    Graph.modularity(edges(es: _*), "s", "t", lab, "node", "label")
      .head().getDouble(2)
  }

  test("modularity: two clean triangles score 0.5; merging them into one community scores 0") {
    val es = Seq(1 -> 2, 2 -> 3, 1 -> 3, 4 -> 5, 5 -> 6, 4 -> 6)
    // perfect partition: m=6, per community m_c=3, D_c=6:
    // Q = 2·(3/6 − (6/12)²) = 0.5
    assert(mod(Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 4, 6 -> 4), es: _*) == 0.5)
    // everything in one community: Q = 6/6 − 1² = 0 exactly
    assert(mod(Map(1 -> 9, 2 -> 9, 3 -> 9, 4 -> 9, 5 -> 9, 6 -> 9), es: _*) == 0.0)
  }

  test("modularity: singleton partition is negative; unlabeled nodes default to singletons") {
    val es = Seq(1 -> 2, 2 -> 3, 1 -> 3)
    // each node its own community: Q = −Σ(d/2m)² = −3·(2/6)² = −1/3
    val q = mod(Map(1 -> 1, 2 -> 2, 3 -> 3), es: _*)
    assert(q == BigDecimal(-1.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(mod(Map.empty, es: _*) == q) // missing labels = singleton default
  }

  test("linkPrediction plans no cartesian product") {
    val plan = Graph.linkPrediction(edges(1 -> 2, 2 -> 3), "s", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }
}
