package graft.formats

/** rANS 4x8 entropy codec (CRAM 3.0 block compression method 4),
  * implemented from the published CRAM specification's rANS section
  * (4 interleaved 32-bit range-ANS states, 12-bit normalized
  * frequencies, byte-wise renormalization at 2^23).
  *
  * Stream layout: order byte (0|1), u32-LE compressed size, u32-LE
  * uncompressed size, frequency table(s), 4 u32-LE initial states,
  * renormalization bytes. Order-0 models bytes independently; order-1
  * conditions each byte's table on the previous byte, with the output
  * split into four quarters (one per state, tail on state 3).
  *
  * Both directions are implemented — decode for reading real CRAM
  * files, encode for generating spec-conformant fixtures.
  */
object RansCodec {

  private val TotFreq = 4096 // 12-bit normalized frequencies
  private val RansByteL = 1 << 23

  // -------------------------------------------------------------- helpers

  private final class In(val data: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
    def u32(): Long = u8() | (u8() << 8) | (u8() << 16) | (u8().toLong << 24)
    /** 1-2 byte frequency: values >= 128 are (0x80|hi, lo). */
    def freq(): Int = {
      val b0 = u8()
      if (b0 >= 128) ((b0 & 0x7f) << 8) | u8() else b0
    }
  }

  private final class Out {
    private val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u32(v: Long): Unit = {
      u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt)
    }
    def freq(f: Int): Unit =
      if (f >= 128) { u8(0x80 | (f >> 8)); u8(f & 0xff) } else u8(f)
    def bytes: Array[Byte] = buf.toByteArray
  }

  /** Per-model decode tables: F/C per symbol + 4096-entry symbol lookup. */
  private final class Model {
    val F = new Array[Int](256)
    val C = new Array[Int](256)
    lazy val lookup: Array[Byte] = {
      val t = new Array[Byte](TotFreq)
      var s = 0
      while (s < 256) {
        var i = 0
        while (i < F(s)) { t(C(s) + i) = s.toByte; i += 1 }
        s += 1
      }
      t
    }
    def buildCumulative(): Unit = {
      var x = 0
      var s = 0
      while (s < 256) { C(s) = x; x += F(s); s += 1 }
    }
  }

  /** Shared sym/freq RLE loop of the spec's ReadFrequencies0/1. */
  private def readFreqTable(in: In): Model = {
    val m = new Model
    var sym = in.u8()
    var lastSym = sym
    var rle = 0
    var done = false
    while (!done) {
      m.F(sym) = in.freq()
      if (rle > 0) { rle -= 1; sym += 1 }
      else {
        sym = in.u8()
        if (sym == lastSym + 1) rle = in.u8()
      }
      lastSym = sym
      if (sym == 0) done = true
    }
    m.buildCumulative()
    m
  }

  /** Mirror of readFreqTable's state machine: a symbol announced as
    * `last+1` is followed by a run byte counting the FURTHER consecutive
    * symbols whose freqs follow without announcements. */
  private def writeFreqTable(out: Out, f: Array[Int]): Unit = {
    val present = (0 until 256).filter(f(_) > 0)
    var i = 0
    var lastWritten = -10
    while (i < present.size) {
      val sym = present(i)
      out.u8(sym)
      if (sym == lastWritten + 1) {
        var run = 0
        while (i + run + 1 < present.size &&
          present(i + run + 1) == sym + run + 1) run += 1
        out.u8(run)
        (0 to run).foreach(k => out.freq(f(sym + k)))
        lastWritten = sym + run
        i += run + 1
      } else {
        out.freq(f(sym))
        lastWritten = sym
        i += 1
      }
    }
    out.u8(0)
  }

  private def normalize(hist: Array[Long], total: Long): Array[Int] = {
    val f = new Array[Int](256)
    if (total == 0) return f
    var assigned = 0
    var maxSym = 0
    (0 until 256).foreach { s =>
      if (hist(s) > 0) {
        val v = math.max(1L, hist(s) * TotFreq / total).toInt
        f(s) = v
        assigned += v
        if (hist(s) > hist(maxSym)) maxSym = s
      }
    }
    // absorb rounding error into the most frequent symbol
    f(maxSym) += TotFreq - assigned
    require(f(maxSym) > 0, "rANS frequency normalization failed")
    f
  }

  // --------------------------------------------------------------- decode

  /** Corrupt or truncated payloads raise [[IllegalArgumentException]]
    * naming the codec, never a bare index error — the same error
    * contract as the 3.1 block codecs. */
  def decode(data: Array[Byte]): Array[Byte] =
    try decodeImpl(data)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: NullPointerException | _: java.io.IOException) =>
        throw new IllegalArgumentException(
          s"rANS 4x8: corrupt or truncated payload " +
            s"(${data.length} bytes): ${e.getClass.getSimpleName}", e)
    }

  private def decodeImpl(data: Array[Byte]): Array[Byte] = {
    val in = new In(data)
    val order = in.u8()
    in.u32() // compressed size (informational)
    val outSz = in.u32().toInt
    // empty blocks carry no frequency tables or states (writers normally
    // use the raw method for these, but accept them in either direction)
    if (outSz == 0) return Array.empty
    order match {
      case 0 => decode0(in, outSz)
      case 1 => decode1(in, outSz)
      case other => throw new IllegalArgumentException(
        s"rANS 4x8: corrupt payload, order byte $other (spec defines 0/1)")
    }
  }

  private def decode0(in: In, outSz: Int): Array[Byte] = {
    val m = readFreqTable(in)
    val R = Array.fill(4)(in.u32())
    val out = new Array[Byte](outSz)
    var i = 0
    while (i < outSz) {
      val j = i & 3
      val mask = (R(j) & (TotFreq - 1)).toInt
      val s = m.lookup(mask) & 0xff
      out(i) = s.toByte
      R(j) = m.F(s) * (R(j) >>> 12) + mask - m.C(s)
      while (R(j) < RansByteL) R(j) = (R(j) << 8) | in.u8()
      i += 1
    }
    out
  }

  private def decode1(in: In, outSz: Int): Array[Byte] = {
    // context-conditioned tables, outer RLE over contexts
    val models = new Array[Model](256)
    var ctx = in.u8()
    var lastCtx = ctx
    var rle = 0
    var done = false
    while (!done) {
      models(ctx) = readFreqTable(in)
      if (rle > 0) { rle -= 1; ctx += 1 }
      else {
        ctx = in.u8()
        if (ctx == lastCtx + 1) rle = in.u8()
      }
      lastCtx = ctx
      if (ctx == 0) done = true
    }
    val R = Array.fill(4)(in.u32())
    val out = new Array[Byte](outSz)
    val isz4 = outSz >> 2
    val l = new Array[Int](4)
    var i = 0
    while (i < isz4) {
      var j = 0
      while (j < 4) {
        val m = models(l(j))
        val mask = (R(j) & (TotFreq - 1)).toInt
        val s = m.lookup(mask) & 0xff
        out(j * isz4 + i) = s.toByte
        R(j) = m.F(s) * (R(j) >>> 12) + mask - m.C(s)
        while (R(j) < RansByteL) R(j) = (R(j) << 8) | in.u8()
        l(j) = s
        j += 1
      }
      i += 1
    }
    // tail bytes decode on state 3
    var t = 4 * isz4
    while (t < outSz) {
      val m = models(l(3))
      val mask = (R(3) & (TotFreq - 1)).toInt
      val s = m.lookup(mask) & 0xff
      out(t) = s.toByte
      R(3) = m.F(s) * (R(3) >>> 12) + mask - m.C(s)
      while (R(3) < RansByteL) R(3) = (R(3) << 8) | in.u8()
      l(3) = s
      t += 1
    }
    out
  }

  // --------------------------------------------------------------- encode

  private def encSymbol(x0: Long, f: Int, c: Int,
      emit: Int => Unit): Long = {
    var x = x0
    val xMax = ((RansByteL >>> 12) << 8).toLong * f
    while (x >= xMax) { emit((x & 0xff).toInt); x >>>= 8 }
    (x / f) * TotFreq + c + (x % f)
  }

  def encode(input: Array[Byte], order: Int): Array[Byte] = {
    require(order == 0 || order == 1, s"rANS order $order")
    val body =
      if (input.isEmpty) Array.empty[Byte]
      else if (order == 0) encode0(input) else encode1(input)
    val out = new Out
    out.u8(order)
    out.u32(body.length.toLong)
    out.u32(input.length.toLong)
    out.bytes ++ body
  }

  private def encode0(input: Array[Byte]): Array[Byte] = {
    val hist = new Array[Long](256)
    input.foreach(b => hist(b & 0xff) += 1)
    val f = normalize(hist, input.length.toLong)
    val c = new Array[Int](256)
    var x = 0
    (0 until 256).foreach { s => c(s) = x; x += f(s) }

    val head = new Out
    writeFreqTable(head, f)
    // encode in reverse; renorm bytes are emitted backwards
    val tail = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val R = Array.fill(4)(RansByteL.toLong)
    var i = input.length - 1
    while (i >= 0) {
      val j = i & 3
      val s = input(i) & 0xff
      R(j) = encSymbol(R(j), f(s), c(s), b => tail += b.toByte)
      i -= 1
    }
    finish(head, tail, R)
  }

  private def encode1(input: Array[Byte]): Array[Byte] = {
    val n = input.length
    val isz4 = n >> 2
    // per-context histograms: context = previous byte (0 at quarter start)
    val hist = Array.fill(256)(new Array[Long](256))
    val totals = new Array[Long](256)
    def ctxOf(pos: Int, qStart: Int): Int =
      if (pos == qStart) 0 else input(pos - 1) & 0xff
    val qStarts = Array(0, isz4, 2 * isz4, 3 * isz4)
    var q = 0
    while (q < 4) {
      val start = qStarts(q)
      val end = if (q == 3) n else start + isz4
      var p = start
      while (p < end) {
        val cx = ctxOf(p, start)
        hist(cx)(input(p) & 0xff) += 1
        totals(cx) += 1
        p += 1
      }
      q += 1
    }
    val f = new Array[Array[Int]](256)
    val c = new Array[Array[Int]](256)
    (0 until 256).foreach { cx =>
      if (totals(cx) > 0) {
        f(cx) = normalize(hist(cx), totals(cx))
        val cc = new Array[Int](256)
        var x = 0
        (0 until 256).foreach { s => cc(s) = x; x += f(cx)(s) }
        c(cx) = cc
      }
    }

    val head = new Out
    // outer context table, same announce/run state machine as the inner
    val present = (0 until 256).filter(totals(_) > 0)
    var i = 0
    var lastWritten = -10
    while (i < present.size) {
      val cx = present(i)
      head.u8(cx)
      if (cx == lastWritten + 1) {
        var run = 0
        while (i + run + 1 < present.size &&
          present(i + run + 1) == cx + run + 1) run += 1
        head.u8(run)
        (0 to run).foreach(k => writeFreqTable(head, f(cx + k)))
        lastWritten = cx + run
        i += run + 1
      } else {
        writeFreqTable(head, f(cx))
        lastWritten = cx
        i += 1
      }
    }
    head.u8(0)

    val tail = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val R = Array.fill(4)(RansByteL.toLong)
    // encode each quarter in reverse on its state; tail first (state 3)
    var t = n - 1
    while (t >= 4 * isz4) {
      val cx = ctxOf(t, qStarts(3))
      val s = input(t) & 0xff
      R(3) = encSymbol(R(3), f(cx)(s), c(cx)(s), b => tail += b.toByte)
      t -= 1
    }
    var p = isz4 - 1
    while (p >= 0) {
      var j = 3
      while (j >= 0) {
        val pos = qStarts(j) + p
        val cx = ctxOf(pos, qStarts(j))
        val s = input(pos) & 0xff
        R(j) = encSymbol(R(j), f(cx)(s), c(cx)(s), b => tail += b.toByte)
        j -= 1
      }
      p -= 1
    }
    finish(head, tail, R)
  }

  private def finish(head: Out, tail: scala.collection.mutable.ArrayBuffer[Byte],
      R: Array[Long]): Array[Byte] = {
    val states = new Out
    R.foreach(states.u32)
    head.bytes ++ states.bytes ++ tail.reverseIterator.toArray
  }
}
