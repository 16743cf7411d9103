package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Shared SQL-function builders used by BOTH registration paths
  * ([[graft.plans.GraftExtensions]] for builder-time injection and
  * `GraftSession.registerFunctions` for running sessions) — one place
  * for arity validation and literal extraction, so the paths cannot
  * drift.
  */
object FunctionBuilders {

  val dotF64: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "dot_f64(a, b) takes exactly 2 arguments")
    DotProduct(children(0), children(1))
  }

  val minhashSig: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "minhash_sig(shingles, numHashes) takes exactly 2 arguments")
    val n = children(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig numHashes must be an integer literal, got $other")
    }
    MinHashSig(children(0), n)
  }

  val simhash32: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "simhash32(tokens) takes exactly 1 argument")
    SimHash32(children(0))
  }

  val shingleHash64: Seq[Expression] => Expression = { children =>
    require(children.length == 2 || children.length == 3,
      "shingle_hash64(tokens, n[, distinct]) takes 2 or 3 arguments")
    val n = children(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"shingle_hash64 n must be an integer literal, got $other")
    }
    val distinct = if (children.length < 3) true else children(2) match {
      case Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"shingle_hash64 distinct must be a boolean literal, got $other")
    }
    ShingleHash64(children(0), n, distinct)
  }
}
