package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the library's native
  * Catalyst expressions for SQL use.
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; after that
  * `SELECT dot_f64(a, b)` resolves to the codegen'd
  * [[graft.functions.DotProduct]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f64"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)),
    ))
  }
}
