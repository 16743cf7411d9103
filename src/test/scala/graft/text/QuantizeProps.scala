package graft.text

import java.math.RoundingMode

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Laws for int8 embedding quantization, property-tested against a
  * driver-side model that mirrors [[Similarity.quantize]] operation for
  * operation (float32-rounded scale, HALF_UP rounding — Spark's `round` —
  * tinyint cast). SparkQuantizeModelSpec (TextSpec) pins the model to the
  * actual Catalyst output; these properties then explore the input space
  * far beyond fixture vectors.
  */
object QuantizeProps extends Properties("Quantize") {

  /** Mirror of the Catalyst pipeline in Similarity.quantize/dequantize. */
  private[text] def quantModel(v: Seq[Float]): (Float, Seq[Byte]) = {
    val dv = v.map(_.toDouble)
    val scaleD = math.max(dv.map(math.abs).max, 1e-30) / 127.0
    val scaleF = scaleD.toFloat // stored as float: quantizer must use it too
    val s = scaleF.toDouble
    val q = dv.map(x => new java.math.BigDecimal(x / s)
      .setScale(0, RoundingMode.HALF_UP).doubleValue().toByte)
    (scaleF, q)
  }

  private[text] def dequantModel(scale: Float, q: Seq[Byte]): Seq[Double] =
    q.map(_.toDouble * scale.toDouble)

  private val finiteF: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN && !f.isInfinite)
  private val vec: Gen[List[Float]] = Gen.nonEmptyListOf(finiteF)

  property("every quantized code fits int8: |q| <= 127") =
    forAll(vec) { v =>
      val (_, q) = quantModel(v)
      q.forall(b => b >= -127 && b <= 127)
    }

  property("reconstruction error is bounded by scale/2 (+ float-rounding slack)") =
    forAll(vec) { v =>
      val (s, q) = quantModel(v)
      val back = dequantModel(s, q)
      v.map(_.toDouble).zip(back).forall { case (x, y) =>
        math.abs(x - y) <= s.toDouble * 0.5 * (1 + 1e-6) + 1e-12
      }
    }

  property("scale is positive and reproduces max|x|/127 through float32") =
    forAll(vec) { v =>
      val (s, _) = quantModel(v)
      val expect = (math.max(v.map(x => math.abs(x.toDouble)).max, 1e-30) / 127.0).toFloat
      s > 0f && s == expect
    }

  property("zero vectors quantize to all-zero codes and reconstruct exactly") =
    forAll(Gen.chooseNum(1, 64)) { n =>
      val v = List.fill(n)(0.0f)
      val (s, q) = quantModel(v)
      q.forall(_ == 0) && dequantModel(s, q).forall(_ == 0.0)
    }

  property("the max-magnitude element maps to ±127 within one code") =
    forAll(vec.suchThat(_.exists(f => math.abs(f) > 1e-20))) { v =>
      val (_, q) = quantModel(v)
      q.map(b => math.abs(b.toInt)).max >= 126
    }
}

/** Pins [[QuantizeProps.quantModel]] to the actual Catalyst output: the
  * property suite's model must be the real quantizer, bit for bit, or its
  * laws prove nothing.
  */
class QuantizeModelSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = graft.testing.TestSpark.spark

  test("driver model matches Similarity.quantize/dequantize exactly") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val vecs: Seq[Seq[Float]] = (1 to 40).map { i =>
      Seq.fill(1 + rnd.nextInt(16))((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat)
    } :+ Seq(0.0f, 0.0f) :+ Seq(1e-28f)
    import spark.implicits._
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      .withColumn("qv", Similarity.quantize(col("v")))
      .withColumn("back", Similarity.dequantize(col("qv")))
      .select(col("id"), col("qv.scale"), col("qv.q"), col("back"))
    val got = df.collect().map { r =>
      (r.getInt(0), (r.getFloat(1), r.getSeq[Byte](2), r.getSeq[Double](3)))
    }.toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val (ms, mq) = QuantizeProps.quantModel(v)
      val md = QuantizeProps.dequantModel(ms, mq)
      val (gs, gq, gd) = got(i)
      assert(gs == ms, s"scale mismatch for vec $i: spark=$gs model=$ms")
      assert(gq == mq, s"codes mismatch for vec $i: spark=$gq model=$mq")
      assert(gd == md, s"dequant mismatch for vec $i")
    }
  }
}
