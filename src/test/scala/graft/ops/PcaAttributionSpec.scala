package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testing.TestSpark
import graft.testing.DfAssert.createDf

/** Hand-checked values for integer-power-iteration PCA and linear
  * multi-touch attribution.
  */
class PcaAttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pcaTopComponent: rank-1 data along (1,2) recovers the axis exactly") {
    val df = createDf(spark, "id int, embedding array<float>",
      (1 to 4).map(t => Seq[Any](t, Seq(t.toFloat, 2.0f * t))))
    val out = Pca.pcaTopComponent(df, "embedding", dims = 2).orderBy("dim")
      .collect()
    // max-normalized eigenvector: (0.5, 1.0); population covariance
    // [[1.25, 2.5], [2.5, 5]] has λ = 6.25 carrying ALL the variance
    assert(out(0).getDouble(2) == 0.5 && out(1).getDouble(2) == 1.0)
    assert(out(0).getDouble(3) == 6.25)
    assert(out(0).getDouble(4) == 1.0)
  }

  test("pcaTopComponent: dominant axis wins from a mixed start; constant slice nulls") {
    // variance 100× larger on dim 2 than dim 1, uncorrelated-ish
    val rows = Seq(
      Seq[Any](1, Seq(1.1f, 10.0f)), Seq[Any](2, Seq(0.9f, -10.0f)),
      Seq[Any](3, Seq(1.0f, 20.0f)), Seq[Any](4, Seq(1.0f, -20.0f)))
    val out = Pca.pcaTopComponent(createDf(spark,
        "id int, embedding array<float>", rows), "embedding", dims = 2)
      .orderBy("dim").collect()
    assert(math.abs(out(1).getDouble(2)) == 1.0) // dim 2 dominates
    assert(math.abs(out(0).getDouble(2)) < 0.01)
    assert(out(0).getDouble(4) > 0.99) // its share of variance
    val const = Pca.pcaTopComponent(createDf(spark,
        "id int, embedding array<float>",
        Seq(Seq[Any](1, Seq(2.0f, 2.0f)), Seq[Any](2, Seq(2.0f, 2.0f)))),
      "embedding", dims = 2).collect()
    assert(const.forall(_.isNullAt(2))) // zero scatter: no direction
  }

  test("linearAttribution: value splits over the touches since the previous conversion") {
    // user 1: clicks in buckets 1,2 then a 10.0 purchase; a bucket-1
    // click then a 4.0 purchase. user 2: orphan click (no conversion).
    val rows = Seq(
      Seq[Any](1L, 1L, "click", null, 1L),
      Seq[Any](1L, 2L, "click", null, 2L),
      Seq[Any](1L, 3L, "purchase", 10.0, 9L),
      Seq[Any](1L, 4L, "click", null, 1L),
      Seq[Any](1L, 5L, "purchase", 4.0, 9L),
      Seq[Any](2L, 1L, "click", null, 7L))
    val df = createDf(spark, "u bigint, ts bigint, et string, v double, b bigint", rows)
    val out = Funnel.linearAttribution(df, "u", "ts", "ts",
        col("et") === "click", col("et") === "purchase", col("v"), col("b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((2L, 9.0))) // 10/2 + 4/1
    assert(out(2L) == ((1L, 5.0)))
    assert(!out.contains(7L)) // orphan click earns nothing
  }
}
