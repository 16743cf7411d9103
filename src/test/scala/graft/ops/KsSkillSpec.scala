package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for the credit-scoring KS and the Brier skill
  * score.
  */
class KsSkillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ksScore: perfectly separated classes reach KS 1 at the class boundary") {
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](false, 0.1), Seq[Any](false, 0.2),
        Seq[Any](true, 0.7), Seq[Any](true, 0.9)))
    val r = Calibration.ksScore(df, col("y"), col("s")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.2) // gap is widest after the last negative
  }

  test("ksScore: interleaved classes give the hand-counted partial separation") {
    // neg 0.1, pos 0.2, neg 0.3, pos 0.4: cumulative gaps |cp·N − cq·P|
    // at thresholds: (0·2−1·2)=2, (1·2−1·2)=0, 2, 0 → KS = 2/4 = 0.5 at 0.1
    val df = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](false, 0.1), Seq[Any](true, 0.2),
        Seq[Any](false, 0.3), Seq[Any](true, 0.4)))
    val r = Calibration.ksScore(df, col("y"), col("s")).collect().head
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.1) // smallest threshold on the tie
  }

  test("brierSkill: the base-rate forecast scores BSS 0; a sharp one beats it") {
    // always predict p̄ = 0.5 on a balanced set: BS = 0.25 = ref → BSS 0
    val flat = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](true, 0.5), Seq[Any](false, 0.5)))
    val rf = Calibration.brierSkill(flat, col("y"), col("s")).collect().head
    assert(rf.getDouble(2) == 0.25 && rf.getDouble(3) == 0.25)
    assert(rf.getDouble(4) == 0.0)
    // confident and right: BS = 0.01, BSS = 1 − 0.01/0.25 = 0.96
    val sharp = createDf(spark, "y boolean, s double",
      Seq(Seq[Any](true, 0.9), Seq[Any](false, 0.1)))
    val rs = Calibration.brierSkill(sharp, col("y"), col("s")).collect().head
    assert(rs.getDouble(2) == 0.01 && rs.getDouble(4) == 0.96)
    // single-class input nulls the skill (no climatology to beat)
    val one = createDf(spark, "y boolean, s double", Seq(Seq[Any](true, 0.8)))
    assert(Calibration.brierSkill(one, col("y"), col("s"))
      .collect().head.isNullAt(4))
  }
}
