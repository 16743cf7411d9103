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
}
