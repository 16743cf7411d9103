package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf
import graft.text.{Classify, TextStats}

/** Hand-checked values for the Gini decision stump and the feature-hash
  * collision audit's featurizer counts.
  */
class StumpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decisionStump: perfectly separable scores split at the class boundary") {
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](false, 0.1), Seq[Any](true, 0.2), Seq[Any](true, 0.3)))
    val r = Calibration.decisionStump(df, col("y"), col("s")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.2) // predict positive at s >= 0.2
    assert(r.getDouble(3) == 0.0) // pure children
    assert(r.getLong(4) == 1L && r.getLong(5) == 0L)
  }

  test("decisionStump: inseparable data falls back to the trivial all-right cut") {
    // same score for both classes: every cut leaves the mix intact;
    // tie-break picks the smallest threshold (the no-split candidate)
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](true, 0.5), Seq[Any](false, 0.5),
        Seq[Any](true, 0.7), Seq[Any](false, 0.7)))
    val r = Calibration.decisionStump(df, col("y"), col("s")).collect().head
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.5) // gini of a 50/50 mix
  }

  test("ngramFeatures distinct-count feeds the collision audit as expected") {
    val df = createDf(spark, "text string",
      Seq(Seq[Any]("a b"), Seq[Any]("b c")))
    val feats = df.select(explode(Classify.ngramFeatures(col("text"))).as("f"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(feats == Set("a", "b", "c", "a_b", "b_c"))
    // bucket ids stay inside the table and are total (no null holes)
    val bs = df.select(explode(Classify.ngramFeatures(col("text"))).as("f"))
      .distinct()
      .select(Classify.featureBucket(col("f"), 64, "clf").as("b"))
      .collect().map(_.getLong(0))
    assert(bs.length == 5 && bs.forall(b => b >= 0 && b < 64))
  }
}
