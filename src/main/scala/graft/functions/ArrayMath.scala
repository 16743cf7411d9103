package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, element_at, transform, array}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst array-math expressions.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * CodegenFallback — every invocation is interpreted and allocates
  * intermediate ArrayData. For the similarity hot path (millions of
  * 64-element dot products per task) that interpretation dominates the
  * runtime, so the dot product is a real `Expression` with `doGenCode`: a
  * tight primitive loop inside whole-stage codegen, no allocations.
  * Identical float semantics to the sequential HOF fold (left-to-right
  * multiply-add in doubles), so results are bit-equal to the reference
  * oracle's `list_sum(list_transform(...))`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  /** Null semantics match the HOF fold it replaces: a null ELEMENT nulls
    * the whole result (zip_with product null → aggregate sum null), same
    * as the oracle's list_sum(list_transform(...)).
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature as a native expression: for each of `numHashes` hash
  * functions, the minimum over the input string array of
  * `XXH64(seed=i)`-rehashed shingle hashes. One base XXH64 pass per
  * shingle, then `numHashes` cheap long-mixes — a tight JVM loop instead
  * of ~numHashes × |shingles| interpreted HOF invocations with
  * per-shingle array allocations. Empty/absent shingle sets yield NULL
  * (short docs must not collapse into one identical signature).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    var seen = false
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val s = arr.getUTF8String(j)
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var i = 0
        while (i < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(base, i.toLong)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingle hashes as a native expression: for each length-`n`
  * token window, XXH64 (seed 42) over exactly the bytes of the
  * space-joined shingle string — hash-equal to `xxhash64(array_join(
  * slice(tokens, i+1, n), ' '))` — WITHOUT materializing any shingle
  * string. The interpreted-HOF formulation this replaces allocates a
  * UTF8String per shingle and re-enters the interpreter per position;
  * here the window bytes are copied into one reusable buffer and hashed
  * in a tight JVM loop.
  *
  * `distinct = true` returns the SET of shingle hashes, sorted (the shape
  * the Jaccard/decontamination paths need — their joins and set sizes are
  * over distinct shingles); `distinct = false` preserves one hash per
  * position in document order (the shape winnowing/repetition need).
  * Fewer than `n` tokens → empty array; null input → null. Null tokens
  * (never produced by `split`) hash as empty strings.
  *
  * 64-bit hash equality stands in for string equality downstream —
  * collision probability over d distinct shingles is ~d²/2⁶⁵
  * (~3·10⁻¹⁰ even at a billion shingles), the standard fingerprinting
  * trade every minhash/simhash pipeline already makes.
  */
case class ShingleHash64(child: Expression, n: Int, distinct: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n > 0, s"shingle size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.Platform
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](m)
    var buf = new Array[Byte](64)
    var i = 0
    while (i < m) {
      var len = n - 1 // the n-1 single-space separators
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(i + j)) len += arr.getUTF8String(i + j).numBytes()
        j += 1
      }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = ' '.toByte; off += 1 }
        if (!arr.isNullAt(i + j)) {
          val s = arr.getUTF8String(i + j)
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += s.numBytes()
        }
        j += 1
      }
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, 42L)
      i += 1
    }
    val out =
      if (!distinct) hashes
      else {
        java.util.Arrays.sort(hashes)
        var w = 0
        var k = 0
        while (k < m) {
          if (k == 0 || hashes(k) != hashes(k - 1)) { hashes(w) = hashes(k); w += 1 }
          k += 1
        }
        java.util.Arrays.copyOf(hashes, w)
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[MinHashSig]] over PRE-HASHED shingles (array<long> base hashes, as
  * produced by [[ShingleHash64]] — same seed-42 XXH64 bytes-hash, so
  * signatures are bit-identical to [[MinHashSig]] over the shingle
  * strings): skips the per-shingle string hash entirely, leaving only
  * the `numHashes` cheap long-mixes per shingle. Duplicate base hashes
  * cannot change a min, so the sorted-distinct and positional inputs
  * yield the same signature. Empty input → NULL (same short-doc contract
  * as [[MinHashSig]]).
  */
case class MinHashSigFromHashes(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_h requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val base = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(base, i.toLong)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash as a native expression: per token, one XXH64 pass
  * (seed 42 — same base hash as Spark's `xxhash64`); per bit of the
  * hash's LOW 32 bits (MSB first), a ±1 count; bit set in the result iff
  * its count is non-negative. Replaces a chain of interpreted HOFs
  * (per-token 32-char bit-string split + array folds) with one tight
  * JVM loop and zero allocations beyond the 32 counters. Semantics are
  * bit-identical to the HOF formulation it replaced
  * ([[graft.text.Dedup.simhash32Hof]] keeps that formulation as the
  * executable spec). Null input → null; an empty token set yields all
  * counts 0 → all bits set (0xFFFFFFFF), matching the HOF fold.
  */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var j = 0
    while (j < n) {
      // Null elements hash to the seed (42L) — exactly what Spark's
      // xxhash64(null) yields, keeping the HOF-identity claim true even
      // for arrays containing nulls.
      val base = if (arr.isNullAt(j)) 42L else {
        val s = arr.getUTF8String(j)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      }
      var k = 0
      while (k < 32) {
        if (((base >>> (31 - k)) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      j += 1
    }
    var acc = 0L
    var k = 0
    while (k < 32) {
      acc = acc * 2 + (if (counts(k) >= 0) 1L else 0L)
      k += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayMath {

  /** Native MinHash signature over an array<string> of shingles. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftColumns.ofExpr(MinHashSig(GraftColumns.exprOf(shingles), numHashes))

  /** Native MinHash signature over array<bigint> base hashes
    * ([[shingleHash64]] output) — bit-identical to [[minhashSig]] over
    * the corresponding shingle strings.
    */
  def minhashSigFromHashes(hashes: Column, numHashes: Int): Column =
    GraftColumns.ofExpr(MinHashSigFromHashes(GraftColumns.exprOf(hashes), numHashes))

  /** Native word n-gram shingle hashes (XXH64 seed 42 over the joined
    * shingle bytes): sorted-distinct set or one hash per position.
    */
  def shingleHash64(tokens: Column, n: Int, distinct: Boolean = true): Column =
    GraftColumns.ofExpr(ShingleHash64(GraftColumns.exprOf(tokens), n, distinct))

  /** Native 32-bit SimHash over an array<string> of tokens. */
  def simhash32(tokens: Column): Column =
    GraftColumns.ofExpr(SimHash32(GraftColumns.exprOf(tokens)))

  /** Codegen'd sequential dot product over two array<double> columns. */
  def dotF64(a: Column, b: Column): Column =
    GraftColumns.ofExpr(DotProduct(GraftColumns.exprOf(a), GraftColumns.exprOf(b)))

  /** Bind `v`'s materialized value as a lambda variable inside `body`.
    *
    * Catalyst's CollapseProject inlines single-reference projections; if
    * the reference sits inside a higher-order-function lambda, the inlined
    * expression is then RE-EVALUATED PER ELEMENT (e.g. `split(text)` once
    * per shingle — a measured 10×+ slowdown). Routing the value through a
    * one-element `transform` makes it a lambda variable, which IS
    * materialized exactly once per row, restoring evaluate-once semantics
    * that no optimizer rule can undo.
    */
  def bound(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), lit(1))
}
