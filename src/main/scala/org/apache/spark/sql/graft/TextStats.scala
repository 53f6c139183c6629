package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native text-normalization / token-statistics kernels (extension
  * path (b): custom `Expression` beats regex scans and per-element HOF
  * evaluation).
  *
  * Why: the text family's hot path was
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""),
  * " +", " "))` plus per-token membership tests. A round-11 controlled
  * experiment on this host (quiet box, loadavg recorded per sample)
  * showed `java.util.regex` char-class scans are the pathology: a
  * single-threaded `[^a-z0-9 ]` find loop runs at 77 ns/char — ~40×
  * slower than a plain byte loop — and its aggregate throughput
  * DECREASES under concurrency (46k docs/s at 1 thread → 29k at 8 and
  * 32 threads), while pure arithmetic scales 32×, zero-alloc byte scans
  * 14×, and allocation-heavy non-regex string work 19× on the same
  * JVM. The poisoned shape is the lambda-compiled negated char class
  * (literal patterns and anchored `[0-9]+` scale fine). Since Spark's
  * `regexp_replace` rides the same engine, every corpus-scan regex
  * serialized the whole query: tx_quality_score measured 627 s and
  * tx_lang_id 293 s at sf100p (5M docs) with all 32 worker threads
  * "busy" inside `java.util.regex`.
  *
  * These kernels do the same work in single tight byte loops with no
  * regex and at most two short-lived allocations per row; `doGenCode`
  * emits a static call so the projection stays inside whole-stage
  * codegen. Bit-parity with the regex/HOF forms is pinned by a
  * randomized differential spec plus a whole-corpus differential
  * (TextStatsSpec), so every DuckDB oracle is untouched.
  */
private[graft] object TextStatsKernel {

  /** Exactly `trim(regexp_replace(regexp_replace(lower(s),
    * "[^a-z0-9 ]", ""), " +", " "))`:
    * Unicode-lowercase (UTF8String.toLowerCase — the same call Spark's
    * `lower()` compiles to, so e.g. İ → i + U+0307 and K → k behave
    * identically), drop every codepoint outside [a-z0-9 ] (in UTF-8,
    * every byte of a multibyte sequence is ≥ 0x80, so a byte-level
    * filter drops exactly the non-ASCII codepoints), collapse space
    * runs, and trim leading/trailing spaces (after the strip the only
    * whitespace left IS 0x20, so trim-vs-regex subtleties vanish). */
  def norm(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    val n = lower.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = Platform.getByte(base, off + i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b; o += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      // every other byte (punct, control, any byte of a multibyte
      // char) is stripped, exactly like [^a-z0-9 ]
      i += 1
    }
    UTF8String.fromBytes(out, 0, o) // trailing space never emitted
  }

  /** Parsed vocab for [[TokenGroupCounts]]: words as UTF-8 byte arrays
    * with their group index, plus the group count. Bound into generated
    * code via `addReferenceObj` (one live object per operator). */
  final class GroupConfig(val words: Array[Array[Byte]],
                          val groups: Array[Int],
                          val nGroups: Int) extends Serializable

  /** One pass over a NORMALIZED text (single-spaced, trimmed, pure
    * ASCII [a-z0-9 ] by construction — [[norm]]'s output): exact
    * whole-token occurrence counts summed per vocab group, plus the
    * token count and non-space char count. Output layout (long array):
    * [0..nGroups-1] group counts, [nGroups] = nTokens, [nGroups+1] =
    * nNonSpace.
    *
    * Token semantics match `split(ntext, " ")`: tokens are the
    * maximal runs between 0x20 bytes, and the empty string yields ONE
    * empty token (split('') = ['']) — hence nTokens = nSpaces + 1
    * unconditionally, which is exactly `size(split(ntext, " "))`.
    * Group counts equal `size(filter(split(ntext," "), w -> w IN
    * vocab_g))` because vocab words are distinct whole tokens. */
  def groupCounts(ntext: UTF8String, cfg: GroupConfig): ArrayData = {
    val base = ntext.getBaseObject
    val off = ntext.getBaseOffset
    val n = ntext.numBytes()
    val res = new Array[Long](cfg.nGroups + 2)
    var spaces = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || Platform.getByte(base, off + i) == ' ') {
        if (!atEnd) spaces += 1
        val len = i - tokStart
        // compare this token against every vocab word of equal length
        var w = 0
        while (w < cfg.words.length) {
          val wb = cfg.words(w)
          if (wb.length == len) {
            var j = 0
            while (j < len && wb(j) == Platform.getByte(base, off + tokStart + j)) j += 1
            if (j == len) res(cfg.groups(w)) += 1L
          }
          w += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    res(cfg.nGroups) = spaces + 1L // size(split(s, " ")) — 1 even when empty
    res(cfg.nGroups + 1) = n - spaces // ASCII: chars == bytes
    new GenericArrayData(res)
  }

  /** One pass over RAW text: the match count of
    * `regexp_extract_all(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")` —
    * the BPE-ish tokenizer's token count — without the regex engine.
    * The alternation admits no backtracking subtleties: at a letter
    * the first branch matches the maximal letter run (greedy, never
    * retried), at a digit the second matches the maximal digit run,
    * at any other non-space CODEPOINT the third matches exactly one
    * char, and spaces match nothing. So: count letter runs + digit
    * runs + other non-space codepoints (leading bytes only — every
    * non-ASCII codepoint is "other"), skip spaces and continuation
    * bytes. */
  def regexishTokenCount(text: UTF8String): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var count = 0L
    var i = 0
    var run = 0 // 0 = none, 1 = letters, 2 = digits
    while (i < n) {
      val b = Platform.getByte(base, off + i)
      val cls =
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) 1
        else if (b >= '0' && b <= '9') 2
        else 0
      if (cls != 0) {
        if (run != cls) { count += 1L; run = cls } // run start
      } else {
        run = 0
        if (b != ' ' && (b >= 0 || (b & 0xC0) != 0x80)) count += 1L
      }
      i += 1
    }
    count
  }

  /** One pass over a NORMALIZED text (single-spaced, trimmed, pure
    * ASCII [a-z0-9 ] — [[norm]]'s output): the six outputs of the
    * x_array_ops HOF pipeline without materializing any array —
    * [0] n_tokens   = size(split(ntext, " ")) (empty string → 1),
    * [1] sum_len    = aggregate(words, 0, (acc,w) -> acc+length(w)),
    * [2] n_long     = size(filter(words, w -> length(w) > 7)),
    * [3] has_num    = exists(words, w -> w rlike '^[0-9]+$') (0/1),
    * [4] all_short  = forall(words, w -> length(w) < 30) (0/1),
    * [5] n_bigrams  = size(array_distinct(zip_with(slice(words,1,n-1),
    *                  slice(words,2,n-1), (a,b) -> concat_ws("_",a,b)))).
    *
    * The bigram distinct count needs no string materialization either:
    * adjacent tokens are CONTIGUOUS byte spans separated by one 0x20,
    * and tokens never contain ' ' or '_', so bigram equality ⟺ span
    * byte equality — dedup the (start_i, end_{i+1}) spans in a small
    * open-addressed table (FNV-1a hash, byte-compare on collision;
    * exact, not probabilistic). */
  def tokenArrayStats(ntext: UTF8String): ArrayData = {
    val base = ntext.getBaseObject
    val off = ntext.getBaseOffset
    val n = ntext.numBytes()
    var nTok = 1
    var i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == ' ') nTok += 1
      i += 1
    }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == ' ') {
        starts(t) = s; ends(t) = i; t += 1; s = i + 1
      }
      i += 1
    }
    var sumLen = 0L
    var nLong = 0L
    var hasNum = false
    var allShort = true
    t = 0
    while (t < nTok) {
      val len = ends(t) - starts(t)
      sumLen += len
      if (len > 7) nLong += 1L
      if (len >= 30) allShort = false
      if (!hasNum && len > 0) {
        var digits = true
        var j = starts(t)
        while (digits && j < ends(t)) {
          val b = Platform.getByte(base, off + j)
          if (b < '0' || b > '9') digits = false
          j += 1
        }
        if (digits) hasNum = true
      }
      t += 1
    }
    val nPairs = nTok - 1
    var nBigrams = 0L
    if (nPairs > 0) {
      // Size the table in Long then clamp: `nPairs * 2` in Int wraps
      // negative at ≥2^30 pairs, freezing cap at 4 and making the probe
      // loop below non-terminating past 4 distinct bigrams. The 2^30
      // clamp still guarantees cap > nPairs (a 2 GiB UTF8String holds at
      // most (2^31)/2 = 2^30 tokens — every pair needs a token byte plus
      // a separator — so nPairs ≤ 2^30 − 1), keeping load factor < 1.
      val want = math.min(nPairs.toLong * 2L, 1L << 30)
      var cap = 4
      while (cap < want) cap <<= 1
      val table = new Array[Int](cap) // 0 = empty, else pair index + 1
      var p = 0
      while (p < nPairs) {
        val ps = starts(p)
        val pe = ends(p + 1)
        var h = 0x811c9dc5
        var j = ps
        while (j < pe) {
          h = (h ^ Platform.getByte(base, off + j)) * 0x01000193
          j += 1
        }
        var idx = h & (cap - 1)
        var done = false
        while (!done) {
          val e = table(idx)
          if (e == 0) { table(idx) = p + 1; nBigrams += 1L; done = true }
          else {
            val qs = starts(e - 1)
            val qe = ends(e)
            val len = pe - ps
            var k = 0
            if (qe - qs == len) {
              while (k < len &&
                Platform.getByte(base, off + qs + k) ==
                  Platform.getByte(base, off + ps + k)) k += 1
            }
            if (qe - qs == len && k == len) done = true // duplicate pair
            else idx = (idx + 1) & (cap - 1)
          }
        }
        p += 1
      }
    }
    new GenericArrayData(Array[Long](nTok.toLong, sumLen, nLong,
      if (hasNum) 1L else 0L, if (allShort) 1L else 0L, nBigrams))
  }

  /** One pass over RAW text: [0] = codepoints outside [A-Za-z0-9 ]
    * (the quality family's "punct" count — exactly `length(text) -
    * length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))`, which counts
    * CODEPOINTS, so multibyte sequences count once: only their leading
    * byte — the one with (b & 0xC0) != 0x80 or b < 0x80 — is
    * classified), [1] = ASCII digit count (`[0-9]` matches nothing
    * outside ASCII). */
  def charClassCounts(text: UTF8String): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var nonAlnumSpace = 0L
    var digits = 0L
    var i = 0
    while (i < n) {
      val b = Platform.getByte(base, off + i)
      if (b >= 0) { // ASCII
        if (b >= '0' && b <= '9') digits += 1L
        else if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == ' '))
          nonAlnumSpace += 1L
      } else if ((b & 0xC0) != 0x80) { // leading byte of a multibyte char
        nonAlnumSpace += 1L
      }
      i += 1
    }
    new GenericArrayData(Array[Long](nonAlnumSpace, digits))
  }
}

/** `norm_text(s)`: the kernel form of
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`.
  * See [[TextStatsKernel.norm]]. */
case class NormText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextStatsKernel.norm($s)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  def of(c: Column): Column =
    ExpressionUtils.column(NormText(ExpressionUtils.expression(c)))
}

/** `token_group_counts(ntext)`: array<long> of per-group whole-token
  * counts over a normalized text, followed by nTokens and nNonSpace.
  * `vocab` maps each word to its group index; `nGroups` fixes the
  * output arity. See [[TextStatsKernel.groupCounts]]. */
case class TokenGroupCounts(child: Expression,
                            vocab: Seq[(String, Int)],
                            nGroups: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty && vocab.forall { case (w, g) =>
    w.nonEmpty && !w.contains(' ') && g >= 0 && g < nGroups },
    "vocab words must be non-empty, space-free, with group in [0, nGroups)")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "vocab words must be distinct (each token can only count once)")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_group_counts"

  @transient private lazy val cfg = new TextStatsKernel.GroupConfig(
    vocab.map(_._1.getBytes("UTF-8")).toArray,
    vocab.map(_._2).toArray, nGroups)

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.groupCounts(input.asInstanceOf[UTF8String], cfg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfgRef = ctx.addReferenceObj("tokenGroupCfg", cfg,
      "org.apache.spark.sql.graft.TextStatsKernel.GroupConfig")
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextStatsKernel.groupCounts($s, $cfgRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGroupCounts =
    copy(child = newChild)
}

object TokenGroupCounts {
  def of(c: Column, vocab: Seq[(String, Int)], nGroups: Int): Column =
    ExpressionUtils.column(
      TokenGroupCounts(ExpressionUtils.expression(c), vocab, nGroups))
}

/** `regexish_token_count(text)`: the match count of the BPE-ish
  * tokenizer `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` as one byte loop. See
  * [[TextStatsKernel.regexishTokenCount]]. */
case class RegexishTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "regexish_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.regexishTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextStatsKernel.regexishTokenCount($s)")

  override protected def withNewChildInternal(newChild: Expression): RegexishTokenCount =
    copy(child = newChild)
}

object RegexishTokenCount {
  def of(c: Column): Column =
    ExpressionUtils.column(RegexishTokenCount(ExpressionUtils.expression(c)))
}

/** `token_array_stats(ntext)`: array<long> [n_tokens, sum_len, n_long,
  * has_num, all_short, n_distinct_bigrams] over a normalized text —
  * the zero-array kernel form of the x_array_ops HOF pipeline. See
  * [[TextStatsKernel.tokenArrayStats]]. */
case class TokenArrayStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_array_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.tokenArrayStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextStatsKernel.tokenArrayStats($s)")

  override protected def withNewChildInternal(newChild: Expression): TokenArrayStats =
    copy(child = newChild)
}

object TokenArrayStats {
  def of(c: Column): Column =
    ExpressionUtils.column(TokenArrayStats(ExpressionUtils.expression(c)))
}

/** `char_class_counts(text)`: array<long> [non-[A-Za-z0-9 ] codepoints,
  * ASCII digits] over the RAW text. See
  * [[TextStatsKernel.charClassCounts]]. */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_counts"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.charClassCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.graft.TextStatsKernel.charClassCounts($s)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

object CharClassCounts {
  def of(c: Column): Column =
    ExpressionUtils.column(CharClassCounts(ExpressionUtils.expression(c)))
}
