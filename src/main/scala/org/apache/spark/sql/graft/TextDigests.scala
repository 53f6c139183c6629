package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native digest kernels for the dedup family (extension path (b):
  * custom `Expression` beats per-element HOF evaluation).
  *
  * Why: the shingle/span fingerprint stages were written as
  * `transform(arr, x -> md5(...))` higher-order functions — Catalyst
  * HOFs evaluate their lambda INTERPRETED, one expression-tree walk plus
  * UTF8String allocations per element, outside whole-stage codegen.
  * These expressions do the same arithmetic in a single tight Java loop
  * per row with one reused `MessageDigest` instance; `doGenCode` emits a
  * static call, so the surrounding projection stays inside codegen.
  * Semantics are bit-identical to the HOF/SQL forms (md5 of UTF-8
  * bytes, lowercase hex), so every DuckDB oracle is untouched.
  */
private[graft] object TextDigests {
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5ThreadLocal = threadMd5.get()
  private val threadMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def hex(bytes: Array[Byte], out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 16) {
      out(off + 2 * i) = hexChars((bytes(i) >> 4) & 0xf).toByte
      out(off + 2 * i + 1) = hexChars(bytes(i) & 0xf).toByte
      i += 1
    }
  }

  private val SaltBytes = "s:".getBytes("UTF-8")

  /** Per element x: hex(md5(x)) ++ hex(md5("s:" ++ x)) — the 64-char
    * double digest the MinHash windows slice. A null element yields a
    * null digest, exactly as the HOF form's `md5(null)` did (round-5
    * ADVICE: current call sites never carry null elements, but the
    * kernel must keep the documented HOF semantics for any caller). */
  def md5PairAll(arr: ArrayData): ArrayData = {
    val md = md5ThreadLocal
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out(i) = null
      else {
        val s = arr.getUTF8String(i)
        val bytes = s.getBytes
        val o = new Array[Byte](64)
        md.reset(); md.update(bytes); hex(md.digest(), o, 0)
        md.reset(); md.update(SaltBytes); md.update(bytes); hex(md.digest(), o, 32)
        out(i) = UTF8String.fromBytes(o)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused MinHash signature: for each hash h in [0, numHashes), the
    * minimum over shingles of the 5-hex-char window [5h, 5h+5) of that
    * shingle's 64-char double digest ([[md5PairAll]]) — i.e.
    * `array_min(transform(md5_pair(sh), x -> substring(x, 5h+1, 5)))`
    * for all h in ONE pass. The staged form allocates a 64-char
    * UTF8String per shingle and then walks it 12 times through an
    * INTERPRETED transform+array_min (HOFs never enter codegen) —
    * measured as 63% of dd_minhash_lsh's sf10 wall (105.8 s of 167.7 s,
    * Audit round 8). Here the digest lives in one reused 64-byte buffer
    * and each window updates a running 5-byte min; byte-wise comparison
    * over lowercase hex (ASCII < 0x80) is exactly UTF8String ordering,
    * so the emitted signatures are bit-identical and every DuckDB
    * oracle is untouched.
    *
    * Null parity with the HOF form: a null shingle's digest is null and
    * `array_min` skips nulls — so null elements are skipped here, and a
    * row with no non-null shingle yields all-null signatures. */
  def minhashAll(arr: ArrayData, numHashes: Int): ArrayData = {
    val md = md5ThreadLocal
    val n = arr.numElements()
    val digest = new Array[Byte](64)
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        md.reset(); md.update(bytes); hex(md.digest(), digest, 0)
        md.reset(); md.update(SaltBytes); md.update(bytes); hex(md.digest(), digest, 32)
        var h = 0
        while (h < numHashes) {
          val off = 5 * h
          val cur = mins(h)
          if (cur == null) {
            val c = new Array[Byte](5)
            System.arraycopy(digest, off, c, 0, 5)
            mins(h) = c
          } else {
            var j = 0
            var cmp = 0
            while (j < 5 && cmp == 0) {
              cmp = java.lang.Byte.compare(digest(off + j), cur(j))
              j += 1
            }
            if (cmp < 0) System.arraycopy(digest, off, cur, 0, 5)
          }
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      if (mins(h) != null) out(h) = UTF8String.fromBytes(mins(h))
      h += 1
    }
    new GenericArrayData(out)
  }

  private val SpaceByte = ' '.toByte

  /** Rolling fixed-width span fingerprints: for each start i in
    * [0, n-w], hex(md5(words[i] ++ " " ++ ... ++ words[i+w-1])) — the
    * md5(concat_ws(' ', slice(words, i, w))) of the HOF form. Returns an
    * empty array when the document has fewer than `w` words. Null words
    * are skipped inside a window exactly as `concat_ws` skips null
    * arguments (round-5 ADVICE null parity). */
  def spanMd5All(words: ArrayData, w: Int): ArrayData = {
    val md = md5ThreadLocal
    val n = words.numElements()
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (words.isNullAt(i)) null else words.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - w + 1)
    i = 0
    while (i <= n - w) {
      md.reset()
      var j = 0
      var written = 0
      while (j < w) {
        val b = bytes(i + j)
        if (b != null) {
          if (written > 0) md.update(SpaceByte)
          md.update(b)
          written += 1
        }
        j += 1
      }
      val o = new Array[Byte](32)
      hex(md.digest(), o, 0)
      out(i) = UTF8String.fromBytes(o)
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] object Shingles3Kernel {
  private val Space = ' '.toByte

  /** Distinct word 3-shingles in first-occurrence order — the kernel
    * form of `array_distinct(transform(sequence(1, n-2), i ->
    * concat_ws(' ', w[i], w[i+1], w[i+2])))` with the `< 3` fallback to
    * a single all-words join (matching [[graft.operators.TextNorm]]'s
    * HOF formulation byte for byte). Null words are skipped like
    * `concat_ws` skips null arguments (round-5 ADVICE null parity;
    * TextNorm itself coalesces null words upstream, so this path only
    * matters to other callers). */
  def shingles3(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (words.isNullAt(i)) null else words.getUTF8String(i).getBytes
      i += 1
    }
    def join(from: Int, count: Int): UTF8String = {
      var nonNull = 0
      var len = 0
      var j = 0
      while (j < count) {
        val b = bytes(from + j)
        if (b != null) { len += b.length; nonNull += 1 }
        j += 1
      }
      len += math.max(nonNull - 1, 0)
      val out = new Array[Byte](len)
      var off = 0
      var written = 0
      j = 0
      while (j < count) {
        val b = bytes(from + j)
        if (b != null) {
          if (written > 0) { out(off) = Space; off += 1 }
          System.arraycopy(b, 0, out, off, b.length)
          off += b.length
          written += 1
        }
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    if (n < 3) return new GenericArrayData(Array[Any](join(0, n)))
    val seen = new java.util.HashSet[UTF8String]((n - 2) * 2)
    val out = new java.util.ArrayList[Any](n - 2)
    i = 0
    while (i <= n - 3) {
      val sh = join(i, 3)
      if (seen.add(sh)) out.add(sh)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `shingles3(words)`: array<string> → array<string> of distinct word
  * 3-shingles in first-occurrence order. See [[Shingles3Kernel]]. */
case class Shingles3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any =
    Shingles3Kernel.shingles3(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.Shingles3Kernel.shingles3($a)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {
  def of(c: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(c)))
}

/** `md5_pair(arr)`: array<string> → array<string> of 64-char double
  * digests. See [[TextDigests.md5PairAll]]. */
case class Md5PairDigests(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // element null ⇔ input element null (md5(null) = null), so the
  // output's containsNull follows the child's
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _                => ArrayType(StringType)
  }
  override def prettyName: String = "md5_pair"

  override protected def nullSafeEval(input: Any): Any =
    TextDigests.md5PairAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextDigests.md5PairAll($a)")

  override protected def withNewChildInternal(newChild: Expression): Md5PairDigests =
    copy(child = newChild)
}

object Md5PairDigests {
  def of(c: Column): Column =
    ExpressionUtils.column(Md5PairDigests(ExpressionUtils.expression(c)))
}

/** `minhash_sigs(sh, k)`: array<string> → array<string> of k 5-hex-char
  * MinHash signatures in one fused pass. See [[TextDigests.minhashAll]]. */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1 && numHashes * 5 <= 64,
    s"numHashes must be in [1, 12] (5-hex windows of a 64-char digest), got $numHashes")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // an element is null only when the row has no non-null shingle
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    TextDigests.minhashAll(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextDigests.minhashAll($a, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  def of(c: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinhashSigs(ExpressionUtils.expression(c), numHashes))
}

/** `span_md5(words)`: array<string> → array<string> of md5 hex digests
  * of every overlapping `w`-word window. See [[TextDigests.spanMd5All]]. */
case class SpanMd5s(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"span width must be >= 1, got $w")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_md5"

  override protected def nullSafeEval(input: Any): Any =
    TextDigests.spanMd5All(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextDigests.spanMd5All($a, $w)")

  override protected def withNewChildInternal(newChild: Expression): SpanMd5s =
    copy(child = newChild)
}

object SpanMd5s {
  def of(c: Column, w: Int): Column =
    ExpressionUtils.column(SpanMd5s(ExpressionUtils.expression(c), w))
}
