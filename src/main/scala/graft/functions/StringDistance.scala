package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner): edit
  * distance where adjacent-transposition is its own unit operation and —
  * unlike the cheaper "optimal string alignment" variant — a transposed
  * block may be edited again afterwards ("CA"→"ABC" is 2, not 3). This
  * is the variant DuckDB's `damerau_levenshtein` implements, so results
  * hash-match the oracle as exact integers with no float anywhere.
  *
  * The DP is the full (|a|+2)×(|b|+2) Lowrance-Wagner table with the
  * last-seen-row map over code points; O(|a|·|b|) time per pair, like
  * Spark's built-in `levenshtein`. Comparison is by Unicode CODE POINT
  * (surrogate pairs count once), matching DuckDB's UTF-8 walk.
  */
object StringDistances {

  /** Static entry point shared by interpreted eval and generated code.
    *
    * Hot-path shape: common prefix/suffix trim first (safe for
    * unrestricted DL — an optimal script never edits inside a shared
    * flank; near-duplicate IDs like "Customer#000000012" collapse to a
    * few-cell DP), then the Lowrance-Wagner table with a flat int[]
    * last-occurrence row for ASCII (the overwhelming case) and a boxed
    * map only for higher code points.
    */
  def damerau(a: UTF8String, b: UTF8String): Int = {
    val fa = codePoints(a)
    val fb = codePoints(b)
    // trim common prefix and suffix
    var lo = 0
    val minLen = math.min(fa.length, fb.length)
    while (lo < minLen && fa(lo) == fb(lo)) lo += 1
    var haEnd = fa.length
    var hbEnd = fb.length
    while (haEnd > lo && hbEnd > lo && fa(haEnd - 1) == fb(hbEnd - 1)) {
      haEnd -= 1; hbEnd -= 1
    }
    val la = haEnd - lo
    val lb = hbEnd - lo
    if (la == 0) return lb
    if (lb == 0) return la
    def sa(i: Int): Int = fa(lo + i)
    def sb(j: Int): Int = fb(lo + j)
    val maxd = la + lb
    // d is (la+2) x (lb+2), offset by one row/col of maxd sentinels
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    val daAscii = new Array[Int](128)
    var daWide: java.util.HashMap[Integer, Integer] = null
    def daGet(cp: Int): Int =
      if (cp < 128) daAscii(cp)
      else if (daWide == null) 0
      else { val v = daWide.get(Int.box(cp)); if (v == null) 0 else v }
    def daPut(cp: Int, v: Int): Unit =
      if (cp < 128) daAscii(cp) = v
      else {
        if (daWide == null) daWide = new java.util.HashMap[Integer, Integer]()
        daWide.put(Int.box(cp), Int.box(v))
      }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = daGet(sb(j - 1))
        val l = db
        var cost = 1
        if (sa(i - 1) == sb(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      daPut(sa(i - 1), i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** Code-point array of a UTF8String — shared by the distance kernels. */
  private[functions] def cps(s: UTF8String): Array[Int] = codePoints(s)

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0
    var oi = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      out(oi) = cp
      oi += 1
      ci += Character.charCount(cp)
    }
    out
  }
}

/** `damerau_levenshtein(a, b)` as a native expression: one static call
  * inside whole-stage codegen (the [[DotProduct]] convention — no
  * interpreted HOF, no allocation beyond the DP table the algorithm
  * needs).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistances.damerau($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity, replicating DuckDB's
  * `jaro_winkler_similarity` bit-for-bit (verified against its outputs):
  * Jaro over the half-max-length match window with transposition count,
  * then the Winkler common-prefix boost (scale 0.1, prefix cap 4)
  * applied only when jaro > 0.7. Code-point comparison; empty-vs-
  * anything is 0, equal strings are 1.
  */
object JaroWinklerSim {

  /** Static entry point shared by interpreted eval and generated code. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = StringDistances.cps(ua)
    val b = StringDistances.cps(ub)
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val md = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - md)
      val hi = math.min(lb - 1, i + md)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!bm(j) && b(j) == a(i)) { am(i) = true; bm(j) = true; m += 1; hit = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      var l = 0
      val lim = math.min(4, math.min(la, lb))
      while (l < lim && a(l) == b(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }
}

/** `jaro_winkler(a, b)` as a native expression — the [[DotProduct]]
  * codegen convention: one static call inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the string-distance expressions. */
object StringDist {

  /** Unrestricted Damerau-Levenshtein distance between two string
    * columns — integer-exact, codegen-native.
    */
  def damerau(a: Column, b: Column): Column =
    GraftColumns.ofExpr(DamerauLevenshtein(
      GraftColumns.exprOf(a), GraftColumns.exprOf(b)))

  /** Jaro-Winkler similarity between two string columns — DuckDB-exact
    * doubles, codegen-native.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumns.ofExpr(JaroWinkler(
      GraftColumns.exprOf(a), GraftColumns.exprOf(b)))
}
