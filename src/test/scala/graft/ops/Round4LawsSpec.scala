package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Randomized model checks (seeded, deterministic) for the round-4
  * operators: each trial builds a random input, runs the distributed
  * operator, and checks it against a plain-Scala reference model or an
  * algebraic law the operator promises.
  */
class Round4LawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("law: Misra-Gries containment — every key above n/(capacity+1) survives, estimates never overcount") {
    val rnd = new Random(4242)
    for (trial <- 1 to 8) {
      val capacity = 1 + rnd.nextInt(8)
      // zipf-ish stream: few hot keys, long tail
      val stream = Seq.fill(300 + rnd.nextInt(500)) {
        if (rnd.nextBoolean()) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(200)}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = createDf(spark, "k string", stream.map(Seq[Any](_)))
        .repartition(1 + rnd.nextInt(5))
      val est = Frequency.misraGries(df, "k", capacity)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = stream.size.toDouble / (capacity + 1)
      for ((k, c) <- truth if c > bound)
        assert(est.contains(k), s"trial $trial: $k freq $c > $bound missing from sketch")
      for ((k, e) <- est)
        assert(e <= truth(k), s"trial $trial: $k estimated $e > true ${truth(k)}")
    }
  }

  test("law: scd2 intervals chain per key — starts strictly increase, ends meet next starts, one current") {
    val rnd = new Random(77)
    for (trial <- 1 to 6) {
      val rows = for {
        k <- 1 to 3
        i <- 1 to 10 + rnd.nextInt(20)
      } yield Seq[Any](k, (i * 10 + rnd.nextInt(5)).toLong * 1000 + k * 7 + i, s"v${rnd.nextInt(3)}")
      val df = createDf(spark, "k int, ts bigint, v string", rows)
      val got = Cdc.scd2(df, Seq("k"), "ts", Seq("v"))
        .select("k", "effective_from", "effective_to", "is_current")
        .collect().groupBy(_.getInt(0))
      for ((_, ivs) <- got) {
        val sorted = ivs.sortBy(_.getLong(1))
        assert(sorted.map(_.getLong(1)).toSeq == sorted.map(_.getLong(1)).distinct.sorted.toSeq,
          s"trial $trial: effective_from must strictly increase")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(!a.isNullAt(2) && a.getLong(2) == b.getLong(1),
              s"trial $trial: interval end must meet the next start")
          case _ =>
        }
        assert(sorted.count(_.getBoolean(3)) == 1, s"trial $trial: exactly one current row")
        assert(sorted.last.isNullAt(2), s"trial $trial: only the last interval is open")
      }
    }
  }

  test("law: diffSnapshots + upsert + deletes reconstructs the new snapshot, any random pair") {
    val rnd = new Random(99)
    for (trial <- 1 to 6) {
      def snap() = (1 to 40).filter(_ => rnd.nextDouble() < 0.7)
        .map(k => Seq[Any](k, s"v${rnd.nextInt(4)}"))
      val oldS = createDf(spark, "k int, v string", snap())
      val newS = createDf(spark, "k int, v string", snap())
      val diff = Cdc.diffSnapshots(oldS, newS, Seq("k"), Seq("v"))
      val ups = diff.filter(col("change_type").isin("insert", "update"))
        .drop("change_type").withColumn("ver", lit(1L))
      val dels = diff.filter(col("change_type") === "delete").select("k")
      val rebuilt = Merge.upsert(oldS.withColumn("ver", lit(0L)), ups, Seq("k"), "ver")
        .join(dels, Seq("k"), "left_anti").drop("ver")
      assert(rebuilt.exceptAll(newS).count() == 0 && newS.exceptAll(rebuilt).count() == 0,
        s"trial $trial: replay must reconstruct the target snapshot")
    }
  }

  test("law: PSI is symmetric under slice swap and zero on identical slices") {
    val rnd = new Random(1234)
    for (trial <- 1 to 5) {
      def frame() = createDf(spark, "v double",
        Seq.fill(100 + rnd.nextInt(100))(Seq[Any](rnd.nextDouble() * 10)))
      val (a, b) = (frame(), frame())
      val cuts = Seq(2.0, 4.0, 6.0, 8.0)
      val ab = Drift.psi(a, b, "v", cuts).agg(sum("psi_term")).head().getDouble(0)
      val ba = Drift.psi(b, a, "v", cuts).agg(sum("psi_term")).head().getDouble(0)
      assert(math.abs(ab - ba) < 1e-12, s"trial $trial: psi must be symmetric ($ab vs $ba)")
      val aa = Drift.psi(a, a, "v", cuts).agg(sum("psi_term")).head().getDouble(0)
      assert(math.abs(aa) < 1e-12, s"trial $trial: psi(a,a) must be 0")
    }
  }

  test("law: standardize leaves each group with mean ~0 and population std ~1") {
    val rnd = new Random(5)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to 50)
      yield Seq[Any](g, rnd.nextDouble() * rnd.nextInt(100))
    val df = createDf(spark, "g string, x double", rows)
    val stats = Scaling.standardize(df, Seq("g"), Seq("x"))
      .groupBy("g").agg(avg("x").as("m"), stddev_pop("x").as("s")).collect()
    for (r <- stats) {
      assert(math.abs(r.getDouble(1)) < 1e-12, s"${r.getString(0)}: mean ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, s"${r.getString(0)}: std ${r.getDouble(2)}")
    }
  }

  test("law: joinSizeExact equals the materialized join count on random keyed frames") {
    val rnd = new Random(321)
    for (trial <- 1 to 6) {
      def frame() = createDf(spark, "k int",
        Seq.fill(30 + rnd.nextInt(60))(Seq[Any](rnd.nextInt(12))))
      val (a, b) = (frame(), frame())
      val est = Stats.joinSizeExact(a, "k", b, "k").head().getDecimal(0).longValueExact()
      assert(est == a.join(b, Seq("k")).count(), s"trial $trial: estimate must be exact")
    }
  }

  test("law: transition counts sum to (events - entities); probabilities sum to 1 per from-state") {
    val rnd = new Random(99)
    for (trial <- 1 to 5) {
      val rows = for {
        u <- 1 to 20
        i <- 1 to 1 + rnd.nextInt(12)
      } yield Seq[Any](u, i, u * 100 + i, s"t${rnd.nextInt(4)}")
      val df = createDf(spark, "u int, ts int, eid int, et string", rows)
      val m = Funnel.transitionMatrix(df, "u", "ts", "eid", "et").collect()
      val perEntity = rows.groupBy(_.head).view.mapValues(_.size.toLong - 1).values.sum
      assert(m.map(_.getLong(2)).sum == perEntity, s"trial $trial: pair count law")
      for ((_, ps) <- m.groupBy(_.getString(0)))
        assert(math.abs(ps.map(_.getDouble(3)).sum - 1.0) < 1e-12,
          s"trial $trial: per-from probabilities must sum to 1")
    }
  }

  test("law: kCore members form a subgraph where the reported degree matches edges kept") {
    val rnd = new Random(1234)
    for (trial <- 1 to 4) {
      val es = Seq.fill(80 + rnd.nextInt(80))(
        (rnd.nextInt(25) + 1, rnd.nextInt(25) + 1))
      val df = createDf(spark, "a int, b int", es.map(e => Seq[Any](e._1, e._2)))
      val k = 2 + rnd.nextInt(3)
      val got = Graph.kCore(df, "a", "b", k)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // model: peel on the driver
      var edges = es.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      var changed = true
      while (changed) {
        val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != edges.size
        edges = next
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"trial $trial (k=$k)")
    }
  }

  test("law: ksStatistic is symmetric and bounded in [0, 1]") {
    val rnd = new Random(31)
    for (trial <- 1 to 5) {
      def frame() = createDf(spark, "v double",
        Seq.fill(40 + rnd.nextInt(60))(Seq[Any](rnd.nextInt(20).toDouble)))
      val (a, b) = (frame(), frame())
      val ab = Drift.ksStatistic(a, b, "v").head()
      val ba = Drift.ksStatistic(b, a, "v").head()
      assert(ab.getLong(2) == ba.getLong(2), s"trial $trial: |num| must be symmetric")
      assert(ab.getDouble(3) >= 0.0 && ab.getDouble(3) <= 1.0)
    }
  }

  test("law: repeatedSpans occurrence counts equal total matching windows; n_docs <= n_occ") {
    val rnd = new Random(8)
    val words = Vector("a", "b", "c")
    for (trial <- 1 to 4) {
      val docs = (1 to 12).map { id =>
        id.toLong -> Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(3))).mkString(" ")
      }
      val df = createDf(spark, "id bigint, text string",
        docs.map { case (i, t) => Seq[Any](i, t) })
      val n = 2
      val got = graft.text.Dedup.repeatedSpans(df, "id", "text", n, minOccurrences = 1)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val model = docs.flatMap { case (id, t) =>
        t.split(" ").sliding(n).map(w => (w.mkString(" "), id))
      }
      val wantOcc = model.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val wantDocs = model.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      assert(got.view.mapValues(_._2).toMap == wantOcc, s"trial $trial: occurrence model")
      assert(got.view.mapValues(_._1).toMap == wantDocs, s"trial $trial: doc model")
    }
  }
}
