package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("calibration: perfectly calibrated bins give gap 0 and ece 0") {
    // bin [0.2,0.3): scores 0.25, 25% positive; bin [0.6,0.7): 0.65, 65% pos
    val rows =
      (1 to 100).map(i => Seq[Any](i <= 25, 0.25)) ++
        (1 to 100).map(i => Seq[Any](i <= 65, 0.65))
    val df = createDf(spark, "y boolean, s double", rows)
    val got = Calibration.calibration(df, col("y"), col("s"), nBins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(2, 6))
    assert(got(2).getDouble(3) == 0.25 && got(2).getDouble(4) == 0.25)
    assert(got(2).getDouble(5) == 0.0 && got(2).getDouble(6) == 0.0)
    assert(got(6).getDouble(4) == 0.65)
  }

  test("calibration: a systematically overconfident score shows its gap and weighted ece") {
    // all scores 0.9 but only 40% positive: gap 0.5, ece 0.5
    val rows = (1 to 10).map(i => Seq[Any](i <= 4, 0.9))
    val df = createDf(spark, "y boolean, s double", rows)
    val r = Calibration.calibration(df, col("y"), col("s"), nBins = 10).head()
    assert(r.getInt(0) == 9 && r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5)
  }

  test("lift: a perfect ranker concentrates all positives in the top tiles") {
    // 100 rows, scores descending with row id; top 20 are the positives
    val rows = (1 to 100).map(i => Seq[Any](i <= 20, 1.0 - i / 100.0))
    val df = createDf(spark, "y boolean, s double", rows)
    val got = Calibration.lift(df, col("y"), col("s"), nTiles = 10)
      .orderBy(col("tile")).collect()
    val t1 = got.head
    assert(t1.getInt(0) == 1 && t1.getLong(2) == t1.getLong(1)) // all positive
    assert(t1.getDouble(4) == 5.0) // rate 1.0 / overall 0.2
    // cumulative gain reaches 1.0 by tile 2 and stays there
    assert(got(1).getDouble(5) == 1.0 && got.last.getDouble(5) == 1.0)
  }

  test("lift: a random-constant score puts everything in one tile with lift 1") {
    val rows = (1 to 50).map(i => Seq[Any](i % 5 == 0, 0.5))
    val df = createDf(spark, "y boolean, s double", rows)
    val got = Calibration.lift(df, col("y"), col("s"), nTiles = 5).collect()
    assert(got.length == 1 && got.head.getDouble(4) == 1.0)
  }

  test("diffInDiff: hand-checked ATT with a parallel-trends control") {
    // control: 10 -> 12 (+2); treated: 20 -> 27 (+7): ATT = 5
    def cell(t: Boolean, p: Boolean, base: Double) =
      Seq(base - 1, base, base + 1).map(v => Seq[Any](t, p, v))
    val df = createDf(spark, "t boolean, p boolean, v double",
      cell(false, false, 10) ++ cell(false, true, 12) ++
        cell(true, false, 20) ++ cell(true, true, 27))
    val r = Stats.diffInDiff(df, col("t"), col("p"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 3L, 3L)))
    assert(r.getDouble(4) == 20.0 && r.getDouble(5) == 27.0)
    assert(r.getDouble(6) == 10.0 && r.getDouble(7) == 12.0)
    assert(r.getDouble(8) == 5.0)
    // four cells each with variance 1, n=3: se = sqrt(4/3)
    assert(math.abs(r.getDouble(9) - math.sqrt(4.0 / 3.0)) < 1e-6)
  }

  test("cuped: balanced covariate -> theta 1, adjusted = raw = true effect, rho^2 = 1") {
    // identical x distribution per arm (randomized assignment), y = x + 2·[a]:
    // pooled theta = 1 exactly, the adjustment is a no-op on the balanced
    // means, and the covariate explains all within-arm variance
    val df = createDf(spark, "g string, x double",
      (1 to 40).map(i => Seq[Any]("a", (i % 5).toDouble)) ++
        (1 to 40).map(i => Seq[Any]("b", (i % 5).toDouble)))
      .withColumn("y", col("x") + when(col("g") === "a", 2.0).otherwise(0.0))
    val r = Stats.cuped(df, col("g") === "a", col("g") === "b",
      col("y"), col("x")).head()
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 2.0)
    assert(r.getDouble(5) > 0.65) // pooled rho² includes the arm effect in var(y)
  }

  test("cuped: imbalanced covariate — adjusted diff replays the closed form exactly") {
    val xsA = (1 to 30).map(i => (i % 7).toDouble)
    val xsB = (1 to 30).map(i => (i % 5).toDouble)
    val ysA = xsA.map(_ * 1.5 + 4.0)
    val ysB = xsB.map(_ * 1.5 + 1.0)
    val df = createDf(spark, "g string, y double, x double",
      (xsA.zip(ysA).map { case (x, y) => Seq[Any]("a", y, x) } ++
        xsB.zip(ysB).map { case (x, y) => Seq[Any]("b", y, x) }))
    val r = Stats.cuped(df, col("g") === "a", col("g") === "b",
      col("y"), col("x")).head()
    // plain-scala replication of the pooled-theta closed form
    val xs = xsA ++ xsB; val ys = ysA ++ ysB; val n = xs.size.toDouble
    val covN = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
    val varN = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val theta = covN / varN
    val diffRaw = ysA.sum / ysA.size - ysB.sum / ysB.size
    val diffAdj = diffRaw - theta * (xsA.sum / xsA.size - xsB.sum / xsB.size)
    assert(math.abs(r.getDouble(2) - diffRaw) < 1e-6)
    assert(math.abs(r.getDouble(3) - theta) < 1e-6)
    assert(math.abs(r.getDouble(4) - diffAdj) < 1e-6)
  }

  test("tukeyHsd: hand-checked q for three separated groups") {
    // a=[1,2,3], b=[4,5,6], c=[7,8,9]: MSW = 6/(9-3) = 1
    // q(a,b) = |2-5| / sqrt(0.5*(1/3+1/3)) = 3/sqrt(1/3) = 5.196152
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5, "b" -> 6,
        "c" -> 7, "c" -> 8, "c" -> 9).map { case (g, v) => Seq[Any](g, v.toDouble) })
    val got = Stats.tukeyHsd(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b"))._1 == -3.0)
    assert(math.abs(got(("a", "b"))._2 - 3.0 / math.sqrt(1.0 / 3.0)) < 1e-5)
    assert(math.abs(got(("a", "c"))._2 - 6.0 / math.sqrt(1.0 / 3.0)) < 1e-5)
  }

  test("tukeyHsd: zero within-group variance nulls q; identical groups give q 0") {
    val const = createDf(spark, "g string, v double",
      Seq("a" -> 2, "a" -> 2, "b" -> 5, "b" -> 5)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.tukeyHsd(const, col("g"), col("v")).head()
    assert(r.getDouble(4) == -3.0 && r.isNullAt(5)) // MSW = 0
    val same = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 3, "b" -> 1, "b" -> 3)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    assert(Stats.tukeyHsd(same, col("g"), col("v")).head().getDouble(5) == 0.0)
  }

  test("gamesHowell: equals Tukey's q under equal variances and balanced n; Welch df = 4") {
    // a=[1,2,3], b=[4,5,6]: s²=1 both, q = 3/sqrt(1/3) (same as Tukey here),
    // df = (2/3)²/(2·(1/3)²/2) = 4
    val df = createDf(spark, "g string, v double",
      Seq("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4, "b" -> 5, "b" -> 6)
        .map { case (g, v) => Seq[Any](g, v.toDouble) })
    val r = Stats.gamesHowell(df, col("g"), col("v")).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getDouble(4) == -3.0)
    assert(math.abs(r.getDouble(5) - 3.0 / math.sqrt(1.0 / 3.0)) < 1e-5)
    assert(math.abs(r.getDouble(6) - 4.0) < 1e-5)
    // it diverges from Tukey when variances AND group sizes differ
    // (with k=2 and equal n the two are algebraically identical —
    // pooling two equal-size variances IS averaging them)
    val uneq = createDf(spark, "g string, v double",
      (Seq(1.0, 2.0, 3.0).map("a" -> _) ++
        Seq(0.0, 10.0, 20.0, 5.0, 15.0, 25.0).map("b" -> _))
        .map { case (g, v) => Seq[Any](g, v) })
    val gh = Stats.gamesHowell(uneq, col("g"), col("v")).head().getDouble(5)
    val tk = Stats.tukeyHsd(uneq, col("g"), col("v")).head().getDouble(5)
    assert(math.abs(gh - tk) > 0.1, s"gh=$gh tk=$tk")
  }

  test("cuped: zero-variance covariate degrades to the raw diff (theta 0, null rho)") {
    val df = createDf(spark, "g string, y double, x double",
      Seq(Seq[Any]("a", 5.0, 1.0), Seq[Any]("a", 7.0, 1.0),
        Seq[Any]("b", 4.0, 1.0), Seq[Any]("b", 6.0, 1.0)))
    val r = Stats.cuped(df, col("g") === "a", col("g") === "b",
      col("y"), col("x")).head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
    assert(r.isNullAt(5))
  }

  test("averagePrecision: perfect ranking 1.0, inverted ranking hand-checked") {
    val perfect = createDf(spark, "y boolean, s double",
      Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1))
        .map { case (y, s) => Seq[Any](y, s) })
    val p = Stats.averagePrecision(perfect, col("y"), col("s")).head()
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0)
    // inverted: steps 0.5*(1/3) + 0.5*(1/2) = 0.416667
    val inverted = createDf(spark, "y boolean, s double",
      Seq((false, 0.9), (false, 0.8), (true, 0.2), (true, 0.1))
        .map { case (y, s) => Seq[Any](y, s) })
    assert(Stats.averagePrecision(inverted, col("y"), col("s")).head()
      .getDouble(2) == 0.416667)
  }

  test("averagePrecision: ties enter together; no positives nulls ap") {
    val tied = createDf(spark, "y boolean, s double",
      Seq((true, 0.5), (false, 0.5)).map { case (y, s) => Seq[Any](y, s) })
    assert(Stats.averagePrecision(tied, col("y"), col("s")).head()
      .getDouble(2) == 0.5)
    val noPos = createDf(spark, "y boolean, s double",
      Seq((false, 0.5), (false, 0.4)).map { case (y, s) => Seq[Any](y, s) })
    assert(Stats.averagePrecision(noPos, col("y"), col("s")).head().isNullAt(2))
  }

  test("prAtThresholds: hand-checked operating points across a clean split") {
    // pos at .9/.8, neg at .3/.2: t=.5 separates perfectly; t=.25 catches a neg
    val df = createDf(spark, "y boolean, s double",
      Seq((true, 0.9), (true, 0.8), (false, 0.3), (false, 0.2))
        .map { case (y, s) => Seq[Any](y, s) })
    val got = Stats.prAtThresholds(df, col("y"), col("s"), Seq(0.25, 0.5, 0.95))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val mid = got(0.5)
    assert(mid.getLong(1) == 2L && mid.getLong(2) == 2L)
    assert(mid.getDouble(3) == 1.0 && mid.getDouble(4) == 1.0 && mid.getDouble(5) == 1.0)
    val low = got(0.25)
    assert(low.getLong(1) == 3L && low.getLong(2) == 2L)
    assert(low.getDouble(3) == 0.666667 && low.getDouble(4) == 1.0)
    assert(low.getDouble(5) == 0.8)
    val high = got(0.95)
    assert(high.getLong(1) == 0L)
    assert(high.isNullAt(3) && high.getDouble(4) == 0.0 && high.isNullAt(5))
  }

  test("brierDecomposition: calibrated two-bin table — rel 0, identity holds") {
    val rows =
      (1 to 100).map(i => Seq[Any](i <= 25, 0.25)) ++
        (1 to 100).map(i => Seq[Any](i <= 65, 0.65))
    val df = createDf(spark, "y boolean, s double", rows)
    val r = Calibration.brierDecomposition(df, col("y"), col("s"), nBins = 10).head()
    assert(r.getLong(0) == 200L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.2075)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.04)
    assert(r.getDouble(5) == 0.2475)
  }

  test("brierDecomposition: an overconfident bin shows up as reliability") {
    // all scores 0.9 but 40% positive: brier = .4*.01+.6*.81 = 0.49
    // rel = (0.9-0.4)^2 = 0.25, res = 0, unc = 0.24
    val rows = (1 to 10).map(i => Seq[Any](i <= 4, 0.9))
    val df = createDf(spark, "y boolean, s double", rows)
    val r = Calibration.brierDecomposition(df, col("y"), col("s"), nBins = 10).head()
    assert(r.getDouble(2) == 0.49)
    assert(r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.24)
  }

  test("linCcc: identity agrees at 1; a location shift docks CCC but not r") {
    val same = createDf(spark, "x double, y double",
      Seq(1.0, 2.0, 3.0).map(v => Seq[Any](v, v)))
    val r1 = Stats.linCcc(same, col("x"), col("y")).head()
    assert(r1.getDouble(3) == 1.0 && r1.getDouble(4) == 1.0)
    val shifted = createDf(spark, "x double, y double",
      Seq(1.0, 2.0, 3.0).map(v => Seq[Any](v, v + 1.0)))
    val r2 = Stats.linCcc(shifted, col("x"), col("y")).head()
    assert(r2.getDouble(1) == 2.0 && r2.getDouble(2) == 3.0)
    assert(r2.getDouble(3) == 1.0)
    assert(r2.getDouble(4) == 0.571429) // 2*(2/3) / (4/3 + 1)
  }

  test("linCcc: zero variance nulls r and ccc; partitioning-invariant") {
    val flat = createDf(spark, "x double, y double",
      Seq(1.0, 2.0, 3.0).map(v => Seq[Any](v, 7.0)))
    val r = Stats.linCcc(flat, col("x"), col("y")).head()
    assert(r.isNullAt(3) && r.isNullAt(4))
    val rows = (0 until 300).map(i =>
      Seq[Any]((i % 13).toDouble, ((i * 7) % 19).toDouble / 3.0))
    val df = createDf(spark, "x double, y double", rows)
    val one = Stats.linCcc(df.coalesce(1), col("x"), col("y")).head()
    val many = Stats.linCcc(df.repartition(11), col("x"), col("y")).head()
    assert(one == many)
  }

  test("isotonicCalibration: already-monotone bin rates pass through untouched") {
    val rows =
      (1 to 100).map(i => Seq[Any](i <= 25, 0.25)) ++
        (1 to 100).map(i => Seq[Any](i <= 65, 0.65))
    val df = createDf(spark, "y boolean, s double", rows)
    val got = Calibration.isotonicCalibration(df, col("y"), col("s"), nBins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(2, 6))
    assert(got(2).getDouble(3) == 0.25 && got(2).getDouble(4) == 0.25)
    assert(got(6).getDouble(3) == 0.65 && got(6).getDouble(4) == 0.65)
  }

  test("isotonicCalibration: a violating pair pools to the combined rate") {
    // bin 2 at 0.8, bin 6 at 0.2 -> PAV pools both to (8+2)/(10+10) = 0.5
    val rows =
      (1 to 10).map(i => Seq[Any](i <= 8, 0.25)) ++
        (1 to 10).map(i => Seq[Any](i <= 2, 0.65))
    val df = createDf(spark, "y boolean, s double", rows)
    val got = Calibration.isotonicCalibration(df, col("y"), col("s"), nBins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(2).getDouble(3) == 0.8 && got(6).getDouble(3) == 0.2)
    assert(got(2).getDouble(4) == 0.5 && got(6).getDouble(4) == 0.5)
  }

  test("isotonicCalibration: cascade pool then a clean step above") {
    // rates 0.6, 0.2, 0.5: first two pool to 0.4, the 0.5 stands
    val rows =
      (1 to 10).map(i => Seq[Any](i <= 6, 0.05)) ++
        (1 to 10).map(i => Seq[Any](i <= 2, 0.45)) ++
        (1 to 10).map(i => Seq[Any](i <= 5, 0.85))
    val df = createDf(spark, "y boolean, s double", rows)
    val iso = Calibration.isotonicCalibration(df, col("y"), col("s"), nBins = 10)
      .orderBy(col("bin")).collect().map(_.getDouble(4)).toSeq
    assert(iso == Seq(0.4, 0.4, 0.5))
  }

  test("isotonicCalibration: fitted values are nondecreasing on random-ish input") {
    val rows = (1 to 500).map { i =>
      val s = (i % 97) / 97.0
      Seq[Any]((i * 31 % 89) < 89 * s, s)
    }
    val df = createDf(spark, "y boolean, s double", rows)
    val iso = Calibration.isotonicCalibration(df, col("y"), col("s"), nBins = 10)
      .orderBy(col("bin")).collect().map(_.getDouble(4)).toSeq
    assert(iso.sliding(2).forall(p => p.size < 2 || p(0) <= p(1)), iso.toString)
  }
}
