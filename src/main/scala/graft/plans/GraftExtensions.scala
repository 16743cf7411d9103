package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHashSig, SimHash32}

/** SparkSessionExtensions entry point: registers the library's native
  * Catalyst expressions for SQL use.
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; after that
  * `SELECT dot_f64(a, b)`, `SELECT minhash_sig(shingles, 32)`, and
  * `SELECT simhash32(tokens)` resolve to the native expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f64"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)),
    ))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "minhash_sig(shingles, numHashes) takes exactly 2 arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSig(children(0), n)
      },
    ))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash32(tokens) takes exactly 1 argument")
        SimHash32(children(0))
      },
    ))
  }
}
