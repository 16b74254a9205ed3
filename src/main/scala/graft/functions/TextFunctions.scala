package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text kernels behind the production-path text expressions
  * (same static-forwarder pattern as [[GenomicCodegen]]: one Scala
  * object shared by interpreted eval and generated code). */
object TextKernels {

  /** O(n) winnowing fingerprints (MOSS): 32-bit polynomial rolling hash
    * of the k-char grams, monotonic-deque window minima over w-wide
    * windows, first-appearance distinct — the same gram positions,
    * window count and distinct semantics as the oracle-mirrored
    * HOF formulation in `TextOps.winnowFingerprints` (gram positions
    * `max(len-k+1, 1)` with the short-text tail clamp; window positions
    * `max(nHashes-w+1, 1)` with slice clamp), but a different 32-bit
    * hash family and none of the per-position substring+digest cost:
    * each character is consumed once by the rolling update and each
    * hash enters/leaves the deque once.
    *
    * Length is counted in UTF-16 units (`String.length`), the HOF path
    * in code points (Spark `length` on UTF8String) — for text with
    * non-BMP characters the two paths emit different fingerprint
    * COUNTS. Each path is self-consistent (all a dedup fingerprint
    * needs); do not cross-compare their structure on astral-plane text.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    val s = text.toString
    val n = s.length
    val B = 131L
    val Mask = 0xFFFFFFFFL
    val nGrams = math.max(n - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    if (n <= k) {
      // single clamped gram: hash whatever characters exist
      var h = 0L; var i = 0
      while (i < n) { h = (h * B + s.charAt(i)) & Mask; i += 1 }
      hashes(0) = h
    } else {
      // B^(k-1) mod 2^32 for the rolling subtract
      var bk = 1L
      var e = 0
      while (e < k - 1) { bk = (bk * B) & Mask; e += 1 }
      var h = 0L; var i = 0
      while (i < k) { h = (h * B + s.charAt(i)) & Mask; i += 1 }
      hashes(0) = h
      var p = 1
      while (p < nGrams) {
        h = ((h - (s.charAt(p - 1) * bk & Mask)) & Mask) * B & Mask
        h = (h + s.charAt(p + k - 1)) & Mask
        hashes(p) = h
        p += 1
      }
    }
    windowMinDistinct(hashes, w)
  }

  /** Window minima + first-appearance distinct over a precomputed gram
    * hash array — the shared back half of [[winnow]] and [[winnowMd5]]
    * (extracted verbatim from [[winnow]] so the two hash families can
    * never drift in window/distinct semantics): monotonic-deque minima
    * (indices of increasing hash) over `w`-wide windows
    * (`max(n-w+1, 1)` windows, the final one clamped — implicit in the
    * emission condition), emitted in first-appearance order. Dedup is
    * a PRIMITIVE open-addressing table (-1 sentinel — hashes are
    * 32-bit-masked, so -1 is unreachable): these kernels exist to
    * strip per-position allocation, and a HashSet<Long> would box
    * every window minimum right back. The table sizes against a LONG
    * target: nWins * 2 in Int wraps negative for ~1 GiB documents, the
    * loop would exit with cap = 8, and the undersized table would spin
    * the probe forever — oversized inputs hit the require instead. */
  private def windowMinDistinct(hashes: Array[Long], w: Int): ArrayData = {
    val nGrams = hashes.length
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val nWins = math.max(nGrams - w + 1, 1)
    var cap = 8
    while (cap < nWins.toLong * 2 && cap > 0) cap <<= 1
    require(cap > 0, s"winnow window count $nWins too large to table")
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    val outArr = new Array[Long](nWins)
    var outN = 0
    def addIfNew(m: Long): Unit = {
      var idx = ((m * 0x9E3779B97F4A7C15L) >>> 40).toInt & (cap - 1)
      var done = false
      while (!done) {
        val cur = table(idx)
        if (cur == m) done = true
        else if (cur == -1L) {
          table(idx) = m; outArr(outN) = m; outN += 1; done = true
        } else idx = (idx + 1) & (cap - 1)
      }
    }
    var i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      val winStart = i - w + 1
      while (deque(head) < winStart) head += 1
      if (i >= w - 1 || i == nGrams - 1) addIfNew(hashes(deque(head)))
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(outArr, outN))
  }

  /** Winnowing fingerprints with the ORACLE-REPRODUCIBLE md5 gram hash
    * — value-identical to the HOF formulation
    * `array_distinct(transform(sequence(1, max(nHashes-w+1, 1)), i =>
    * array_min(slice(hashes, i, w))))` over `hashes =
    * transform(sequence(1, max(len-k+1, 1)), i =>
    * conv(substring(md5(substr(text, i, k)), 1, 8), 16, 10))`
    * (parity spec-pinned, `WinnowMd5ParitySpec`), but ONE kernel call
    * instead of interpreted higher-order functions: the HOF path paid
    * a per-position UTF8String substring + hex-string digest + conv
    * parse, plus an O(n·w) per-window `slice` array allocation — the
    * dominant cost of the gated q32 row. Here: code-point byte offsets
    * computed once, one reused MessageDigest over byte slices (the
    * first 4 digest bytes ARE `conv(substring(hex, 1, 8), 16, 10)`),
    * and [[windowMinDistinct]]'s allocation-free deque. Same gram
    * positions (`max(len-k+1, 1)`, code-point counted, short-text tail
    * clamp), same window count, same distinct semantics — same VALUES,
    * which the DuckDB oracle replays independently.
    *
    * NULL text yields the single-null array `[null]`, NOT null — the
    * HOF formulation's exact value (`greatest(length(null) - 7, 1)`
    * is 1 because `greatest` skips nulls, so one null gram hash flows
    * through the window min and the distinct); parity includes the
    * null row. */
  def winnowMd5(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    if (text == null) return new GenericArrayData(Array[Any](null))
    val bytes = text.getBytes
    val n = text.numChars()
    // byte offset of each code point, plus the terminal offset
    val offs = new Array[Int](n + 1)
    var cp = 0
    var bi = 0
    while (cp < n) {
      offs(cp) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      cp += 1
    }
    offs(n) = bytes.length
    val nGrams = math.max(n - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // gram = code points [i, min(i+k, n)) — substr's tail clamp
      val from = offs(i)
      val until = offs(math.min(i + k, n))
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(digest, 0, 16)
      hashes(i) = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
        ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
      i += 1
    }
    windowMinDistinct(hashes, w)
  }

  /** Word tokens split on SINGLE spaces keeping empties — byte-exact
    * with `split(text, " ")` (Java `String.split(" ", -1)`: consecutive
    * spaces yield empty tokens, trailing empties kept, empty input
    * yields one empty token). Space (0x20) never occurs inside a UTF-8
    * multibyte sequence, so the scan is byte-level-safe. */
  private def splitSpaces(s: String): Array[String] = {
    var count = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') count += 1; i += 1 }
    val out = new Array[String](count)
    var start = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') {
        out(k) = s.substring(start, i); k += 1; start = i + 1
      }
      i += 1
    }
    out(k) = s.substring(start)
    out
  }

  private def joinRange(parts: Array[String], from: Int,
      until: Int): UTF8String = {
    var len = 0
    var j = from
    while (j < until) { len += parts(j).length + 1; j += 1 }
    val sb = new java.lang.StringBuilder(math.max(len - 1, 0))
    j = from
    while (j < until) {
      if (j > from) sb.append(' ')
      sb.append(parts(j)); j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Word 3-gram shingles — value-identical to the HOF formulation
    * `transform(sequence(1, greatest(size(ws)-2, 1)), i =>
    * concat_ws(" ", slice(ws, i, 3)))` over `ws = split(text, " ")`
    * (the DuckDB-mirrored spec, pinned by `WordShinglesParitySpec`):
    * `max(n-2, 1)` shingles with the short-text tail clamp. The HOF
    * form is `CodegenFallback` — interpreted lambda dispatch per
    * shingle, megamorphic and inline-fragile (the r14 q50 bisect
    * landed on a commit q50 never executes: pure code-layout JIT
    * sensitivity); this kernel is one monomorphic call. */
  def wordShingles(text: UTF8String): ArrayData = {
    val parts = splitSpaces(text.toString)
    val n = parts.length
    val nOut = math.max(n - 2, 1)
    val out = new Array[Any](nOut)
    var i = 0
    while (i < nOut) {
      out(i) = joinRange(parts, i, math.min(i + 3, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-grams with NO short-document fallback — value-identical to
    * `when(size(ws) >= n, transform(sequence(1, size(ws)-(n-1)), i =>
    * concat_ws(" ", slice(ws, i, n)))).otherwise(array())`: fewer than
    * `n` words (INCLUDING null text, via the `when` null-condition
    * fallthrough) yields the EMPTY array, never null. The q48
    * decontamination path runs this per corpus document with n=13 —
    * the same interpreted-HOF shape the shingle kernel replaced. */
  def wordGrams(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(new Array[Any](0))
    val parts = splitSpaces(text.toString)
    val len = parts.length
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = joinRange(parts, i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fixed-size word paragraphs — value-identical to
    * `transform(sequence(1, ceil(size(ws)/words)), i =>
    * concat_ws(" ", slice(ws, (i-1)*words+1, words)))`:
    * `ceil(n/words)` chunks, last one short. Same kernel rationale as
    * [[wordShingles]]. */
  def wordParagraphs(text: UTF8String, words: Int): ArrayData = {
    val parts = splitSpaces(text.toString)
    val n = parts.length
    val nOut = (n + words - 1) / words // n >= 1 always (split of "")
    val out = new Array[Any](math.max(nOut, 0))
    var i = 0
    while (i < nOut) {
      out(i) = joinRange(parts, i * words, math.min((i + 1) * words, n))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Production-path text expressions (fingerprinting); registered from
  * [[graft.operators.TextOps]] when `fastHash = true`. */
object TextFunctions {

  /** Catalyst expression: O(n) rolling-hash winnowing fingerprints.
    * Codegen'd via a static kernel call — no `CodegenFallback`, no
    * interpreted higher-order functions in the hot path. */
  case class WinnowFast(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.winnow(v.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.winnow($c, $k, $w);")
    override def prettyName: String = "winnow_fingerprints_fast"
    override protected def withNewChildInternal(c: Expression): WinnowFast =
      copy(child = c)
  }

  def winnow_fast(c: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    org.apache.spark.sql.graftshim.ColumnShim.column(
      WinnowFast(org.apache.spark.sql.graftshim.ColumnShim.expression(c),
        k, w))
  }

  /** Catalyst expression: winnowing fingerprints with the md5 gram
    * hash (see [[TextKernels.winnowMd5]] — value-identical to the
    * oracle-mirrored HOF formulation, one codegen'd kernel call). NOT
    * nullSafe: null text yields the `[null]` single-element array the
    * HOF produced, never a null array (same pattern as WordGrams). */
  case class WinnowMd5(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(LongType, containsNull = true)
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : Any =
      TextKernels.winnowMd5(
        child.eval(input).asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      ev.copy(
        isNull = org.apache.spark.sql.catalyst.expressions.codegen
          .FalseLiteral,
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.TextKernels.winnowMd5(
              ${c.isNull} ? null : ${c.value}, $k, $w);""")
    }
    override def prettyName: String = "winnow_fingerprints_md5"
    override protected def withNewChildInternal(c: Expression): WinnowMd5 =
      copy(child = c)
  }

  def winnow_md5(c: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    org.apache.spark.sql.graftshim.ColumnShim.column(
      WinnowMd5(org.apache.spark.sql.graftshim.ColumnShim.expression(c),
        k, w))
  }

  /** Codegen'd word 3-gram shingles (see [[TextKernels.wordShingles]]).
    * Null text → null array (the dedup-signal contract: null docs
    * explode to no rows — previously a `when(isNull)` wrapper). */
  case class WordShingles(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.wordShingles(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.wordShingles($c);")
    override def prettyName: String = "word_shingles"
    override protected def withNewChildInternal(c: Expression)
        : WordShingles = copy(child = c)
  }

  /** Codegen'd word n-grams (see [[TextKernels.wordGrams]]). NOT
    * nullSafe: null text yields the EMPTY array, matching the
    * `when(...).otherwise(array())` fallthrough it replaces. */
  case class WordGrams(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n > 0, "gram size must be positive")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : Any =
      TextKernels.wordGrams(
        child.eval(input).asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      ev.copy(
        isNull = org.apache.spark.sql.catalyst.expressions.codegen
          .FalseLiteral,
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            graft.functions.TextKernels.wordGrams(
              ${c.isNull} ? null : ${c.value}, $n);""")
    }
    override def prettyName: String = "word_grams"
    override protected def withNewChildInternal(c: Expression)
        : WordGrams = copy(child = c)
  }

  /** Codegen'd fixed-size word paragraphs
    * (see [[TextKernels.wordParagraphs]]). Null text → null array. */
  case class WordParagraphs(child: Expression, words: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(words > 0, "paragraph size must be positive")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernels.wordParagraphs(v.asInstanceOf[UTF8String], words)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = " +
          s"graft.functions.TextKernels.wordParagraphs($c, $words);")
    override def prettyName: String = "word_paragraphs"
    override protected def withNewChildInternal(c: Expression)
        : WordParagraphs = copy(child = c)
  }
}
