package graft.formats

/** Adaptive arithmetic entropy codec — CRAM 3.1 block method 6
  * (hts-specs CRAMcodecs §"Adaptive arithmetic coding"; the reference
  * reads 3.1 through noodles, `/root/reference/oxbow/src/alignment/
  * scanner/cram.rs`, which delegates to the same published spec).
  *
  * Stream layout mirrors the ransNx16 wrapper ([[RansNx16Codec]]): a
  * format byte, then (unless NOSZ) the uncompressed length as a uint7
  * varint, then transform metadata, then the range-coded payload. Bit
  * flags of the format byte (same bit positions as ransNx16, except
  * 0x04 which selects an external bzip2 payload instead of 32 rANS
  * states — the arithmetic coder is sequential and has no state count):
  *
  *   0x01 ORDER-1    0x04 EXT (bzip2 payload)    0x08 STRIPE
  *   0x10 NOSZ       0x20 CAT (stored raw)       0x40 RLE    0x80 PACK
  *
  * Core coder: a carry-counting range coder (the LZMA-family scheme the
  * spec adopts) — 32-bit range renormalized at 2^24, encoder `low` held
  * in 64 bits so a carry shows up in bit 32 and propagates through the
  * cached byte and the pending-0xFF run; the decoder primes a 32-bit
  * window from five bytes (the first, always the encoder's initial zero
  * cache, falls off the top). Symbol statistics adapt per decoded
  * symbol: frequency += 16, halving renormalization when the total
  * exceeds 2^16 - 16 (keeping the total inside the coder's 16-bit
  * precision budget), and a hot symbol bubbles one slot toward the
  * front of the search order when its count passes its neighbor's.
  *
  * Order-0 codes each byte against one model; order-1 keeps one model
  * per previous byte. Both stream variants open with a max-symbol byte
  * (0 meaning 256) so small alphabets adapt faster. RLE mode codes
  * (literal, run) pairs: the run's first chunk is modeled per literal
  * byte, continuation chunks (value 255 keeps the run going) by two
  * shared follow-on contexts. PACK/STRIPE reuse the ransNx16 bit-pack
  * and interleave transforms byte-for-byte.
  *
  * Conformance notes: no tool-produced method-6 CRAM exists in the test
  * corpus, so the wrapper and model layers are validated by round-trip
  * plus byte-literal range-coder fixtures hand-derived from the spec's
  * arithmetic in `ArithCodecSpec` (full carry/renormalization traces in
  * comments, not produced by this encoder).
  */
object ArithCodec {

  private val Top = 1L << 24 // renormalization threshold
  private val Step = 16 // adaptive frequency increment
  private val MaxTotal = (1 << 16) - Step // renormalize model above this

  // flags
  private val FOrder1 = 0x01
  private val FExt = 0x04
  private val FStripe = 0x08
  private val FNosz = 0x10
  private val FCat = 0x20
  private val FRle = 0x40
  private val FPack = 0x80

  private[formats] final class In(val data: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
    /** Reads past the end decode as 0 — the encoder's final flush can
      * leave the decoder's renormalization a byte short of the buffer. */
    def u8OrZero(): Int =
      if (pos < data.length) u8() else { pos += 1; 0 }
    def uint7(): Int = {
      var v = 0
      var c = 0
      do { c = u8(); v = (v << 7) | (c & 0x7f) } while ((c & 0x80) != 0)
      v
    }
    def take(n: Int): Array[Byte] = {
      // copyOfRange zero-pads past the end — a truncated CAT/PACK
      // payload must throw instead of decoding as silent zeros
      if (n < 0 || pos.toLong + n > data.length)
        throw new IndexOutOfBoundsException(
          s"need $n bytes at offset $pos, have ${data.length}")
      val out = java.util.Arrays.copyOfRange(data, pos, pos + n)
      pos += n
      out
    }
    def remaining(): Array[Byte] =
      java.util.Arrays.copyOfRange(data, pos, data.length)
  }

  private final class Out {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def uint7(v0: Int): Unit = {
      var v = v0
      val tmp = new Array[Int](5)
      var n = 0
      do { tmp(n) = v & 0x7f; v >>>= 7; n += 1 } while (v != 0)
      var i = n - 1
      while (i > 0) { u8(tmp(i) | 0x80); i -= 1 }
      u8(tmp(0))
    }
    def bytes(bs: Array[Byte]): Unit = buf.write(bs, 0, bs.length)
    def result: Array[Byte] = buf.toByteArray
  }

  // -------------------------------------------------------- range coder

  /** Carry-counting range encoder. `low` uses 33 bits of a Long: bit 32
    * is the carry, resolved through `cache` (the last undecided output
    * byte) and `pending` (a run of 0xFF bytes that a carry would turn
    * into 0x00s). */
  private[formats] final class RangeEncoder(out: java.io.ByteArrayOutputStream) {
    private var low: Long = 0L
    private var range: Long = 0xffffffffL
    private var cache: Int = 0
    private var pending: Long = 1L // counts the initial zero cache byte

    def encode(cumFreq: Int, freq: Int, totFreq: Int): Unit = {
      range /= totFreq
      low += cumFreq * range
      range *= freq
      while (range < Top) {
        range <<= 8
        shiftLow()
      }
    }

    private def shiftLow(): Unit = {
      if ((low & 0xffffffffL) < 0xff000000L || (low >>> 32) != 0) {
        val carry = (low >>> 32).toInt
        var b = cache + carry
        do {
          out.write(b & 0xff)
          b = 0xff + carry
          pending -= 1
        } while (pending != 0)
        cache = ((low >>> 24) & 0xff).toInt
      }
      pending += 1
      low = (low << 8) & 0xffffffffL
    }

    def finish(): Unit = {
      var i = 0
      while (i < 5) { shiftLow(); i += 1 }
    }
  }

  /** Mirror decoder: a 32-bit code window over the byte stream, primed
    * with five bytes (the first — the encoder's initial cache — shifts
    * off the top of the 32-bit window). */
  private[formats] final class RangeDecoder(in: In) {
    private var range: Long = 0xffffffffL
    private var code: Long = 0L
    (0 until 5).foreach { _ =>
      code = ((code << 8) | in.u8OrZero()) & 0xffffffffL
    }

    /** Narrows the range by the total and returns the cumulative-
      * frequency slot the code sits in (capped for robustness against a
      * final-byte-flush code at the very top of the range). */
    def getFreq(totFreq: Int): Int = {
      range /= totFreq
      math.min(totFreq - 1, (code / range).toInt)
    }

    def decode(cumFreq: Int, freq: Int): Unit = {
      code -= cumFreq * range
      range *= freq
      while (range < Top) {
        code = ((code << 8) | in.u8OrZero()) & 0xffffffffL
        range <<= 8
      }
    }
  }

  // ----------------------------------------------------- adaptive model

  /** Adaptive symbol statistics: parallel symbol/frequency arrays kept
    * in roughly-descending frequency order by adjacent transposition.
    * All symbols start present with frequency 1 (total = numSym), so
    * coder and decoder stay in lockstep with no escape mechanism. */
  private[formats] final class AdaptiveModel(numSym: Int) {
    private val syms = Array.tabulate(numSym)(identity)
    private val freqs = Array.fill(numSym)(1)
    private var total = numSym

    def encodeSymbol(rc: RangeEncoder, s: Int): Unit = {
      var i = 0
      var cum = 0
      while (syms(i) != s) { cum += freqs(i); i += 1 }
      rc.encode(cum, freqs(i), total)
      bump(i)
    }

    def decodeSymbol(rc: RangeDecoder): Int = {
      val f = rc.getFreq(total)
      var i = 0
      var cum = 0
      while (cum + freqs(i) <= f) { cum += freqs(i); i += 1 }
      rc.decode(cum, freqs(i))
      val s = syms(i)
      bump(i)
      s
    }

    private def bump(i: Int): Unit = {
      freqs(i) += Step
      total += Step
      if (total > MaxTotal) {
        total = 0
        var j = 0
        while (j < numSym) {
          freqs(j) -= freqs(j) >> 1 // halve, keeping >= 1
          total += freqs(j)
          j += 1
        }
      }
      if (i > 0 && freqs(i) > freqs(i - 1)) {
        val ts = syms(i); syms(i) = syms(i - 1); syms(i - 1) = ts
        val tf = freqs(i); freqs(i) = freqs(i - 1); freqs(i - 1) = tf
      }
    }
  }

  // ------------------------------------------------------------- decode

  /** Decode an arith stream. `expectedLen` is the block's declared raw
    * size, needed when the NOSZ flag omits the in-stream length.
    * Corrupt or truncated payloads raise [[IllegalArgumentException]]
    * naming the codec, never a bare index error. */
  def decode(src: Array[Byte], expectedLen: Int): Array[Byte] =
    try decode(new In(src), expectedLen)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: NullPointerException | _: java.io.IOException) =>
        throw new IllegalArgumentException(
          s"adaptive arithmetic: corrupt or truncated payload " +
            s"(${src.length} bytes): ${e.getClass.getSimpleName}", e)
    }

  private def decode(in: In, expectedLen: Int): Array[Byte] = {
    val flags = in.u8()
    val ulen = if ((flags & FNosz) != 0) expectedLen else in.uint7()

    if ((flags & FStripe) != 0) return decodeStripe(in, ulen)

    // PACK metadata (expansion applied last) — parsed BEFORE choosing
    // the payload transport: the spec orders [pack meta][cat|ext|coded],
    // so an EXT(bzip2) payload of PACKed bytes must still unpack after
    var packMap: Array[Byte] = null
    var innerLen = ulen
    if ((flags & FPack) != 0) {
      val nsym = in.u8()
      packMap = in.take(nsym)
      innerLen = in.uint7()
    }

    val inner =
      if ((flags & FExt) != 0) {
        val bz = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorInputStream(
            new java.io.ByteArrayInputStream(in.remaining()))
        try {
          val out = new Array[Byte](innerLen)
          var off = 0
          while (off < innerLen) {
            val n = bz.read(out, off, innerLen - off)
            require(n > 0, s"arith EXT payload shorter than $innerLen")
            off += n
          }
          out
        } finally bz.close()
      }
      else if ((flags & FCat) != 0) in.take(innerLen)
      else if ((flags & FRle) != 0)
        decodeRle(in, innerLen, (flags & FOrder1) != 0)
      else if ((flags & FOrder1) != 0) decodeO1(in, innerLen)
      else decodeO0(in, innerLen)

    if (packMap == null) inner else unpack(inner, packMap, ulen)
  }

  private def decodeStripe(in: In, ulen: Int): Array[Byte] = {
    val n = in.u8()
    val clens = Array.fill(n)(in.uint7())
    val subs = Array.tabulate(n) { j =>
      val expect = (ulen - j + n - 1) / n
      decode(new In(in.take(clens(j))), expect)
    }
    val out = new Array[Byte](ulen)
    var i = 0
    while (i < ulen) { out(i) = subs(i % n)(i / n); i += 1 }
    out
  }

  private def maxSymOf(in: In): Int = {
    val m = in.u8()
    if (m == 0) 256 else m
  }

  private def decodeO0(in: In, ulen: Int): Array[Byte] = {
    val maxSym = maxSymOf(in)
    val model = new AdaptiveModel(maxSym)
    val rc = new RangeDecoder(in)
    val out = new Array[Byte](ulen)
    var i = 0
    while (i < ulen) {
      out(i) = model.decodeSymbol(rc).toByte
      i += 1
    }
    out
  }

  private def decodeO1(in: In, ulen: Int): Array[Byte] = {
    val maxSym = maxSymOf(in)
    val models = Array.fill(maxSym)(new AdaptiveModel(maxSym))
    val rc = new RangeDecoder(in)
    val out = new Array[Byte](ulen)
    var last = 0
    var i = 0
    while (i < ulen) {
      val s = models(last).decodeSymbol(rc)
      out(i) = s.toByte
      last = s
      i += 1
    }
    out
  }

  /** (literal, run) pairs: the literal order-0 or order-1 modeled; the
    * run in 255-continuation chunks — first chunk conditioned on the
    * literal byte, later chunks on two shared follow-on contexts. The
    * run value counts EXTRA copies beyond the literal itself. */
  private def decodeRle(in: In, ulen: Int, order1: Boolean): Array[Byte] = {
    val maxSym = maxSymOf(in)
    val lit =
      if (order1) Array.fill(maxSym)(new AdaptiveModel(maxSym))
      else Array(new AdaptiveModel(maxSym))
    val runs = Array.fill(maxSym + 2)(new AdaptiveModel(256))
    val rc = new RangeDecoder(in)
    val out = new Array[Byte](ulen)
    var last = 0
    var i = 0
    while (i < ulen) {
      val b = lit(if (order1) last else 0).decodeSymbol(rc)
      last = b
      var part = runs(b).decodeSymbol(rc)
      var run = part
      var ctx = maxSym
      while (part == 255) {
        part = runs(ctx).decodeSymbol(rc)
        run += part
        ctx = maxSym + 1
      }
      out(i) = b.toByte
      i += 1
      while (run > 0) { out(i) = b.toByte; i += 1; run -= 1 }
    }
    out
  }

  /** Identical bit-pack transform to ransNx16 — one shared impl. */
  private def unpack(packed: Array[Byte], map: Array[Byte],
      ulen: Int): Array[Byte] =
    RansNx16Codec.unpack(packed, map, ulen, codec = "arith")

  // ------------------------------------------------------------- encode

  /** Encode with the requested wrapper flags (subset: ORDER1, RLE, PACK,
    * CAT, EXT, STRIPE). Used by fixtures and round-trip tests; a real
    * writer would pick flags per content type the way htslib does. */
  def encode(data: Array[Byte], flags: Int = 0): Array[Byte] = {
    val out = new Out()
    out.u8(flags & ~FNosz) // always store the length explicitly
    out.uint7(data.length)

    if ((flags & FStripe) != 0) {
      val n = 4
      val subs = Array.tabulate(n) { j =>
        val sub = Array.tabulate((data.length - j + n - 1) / n)(k =>
          data(k * n + j))
        encode(sub, flags & ~FStripe)
      }
      out.u8(n)
      subs.foreach(s => out.uint7(s.length))
      subs.foreach(out.bytes)
      return out.result
    }
    var inner = data
    if ((flags & FPack) != 0) {
      val present = data.map(_ & 0xff).distinct.sorted
      require(present.length <= 16,
        s"arith PACK needs <= 16 distinct symbols, got ${present.length}")
      val index = new Array[Byte](256)
      present.zipWithIndex.foreach { case (s, i) => index(s) = i.toByte }
      val (bits, per) =
        if (present.length <= 2) (1, 8)
        else if (present.length <= 4) (2, 4) else (4, 2)
      val packed = new Array[Byte]((data.length + per - 1) / per)
      var i = 0
      while (i < data.length) {
        packed(i / per) = (packed(i / per) |
          ((index(data(i) & 0xff) & 0xff) << (bits * (i % per)))).toByte
        i += 1
      }
      out.u8(present.length)
      present.foreach(out.u8)
      out.uint7(packed.length)
      inner = packed
    }

    // EXT transports the (possibly packed) bytes as a bzip2 stream —
    // emitted AFTER the pack metadata, mirroring decode's spec ordering
    if ((flags & FExt) != 0) {
      val b = new java.io.ByteArrayOutputStream()
      val bz = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(b)
      bz.write(inner); bz.close()
      out.bytes(b.toByteArray)
      return out.result
    }

    if ((flags & FCat) != 0) {
      out.bytes(inner)
      return out.result
    }

    val maxSym = if (inner.isEmpty) 1
      else (inner.map(_ & 0xff).max + 1)
    out.u8(if (maxSym == 256) 0 else maxSym)
    val body = new java.io.ByteArrayOutputStream()
    val rc = new RangeEncoder(body)
    if ((flags & FRle) != 0) {
      val order1 = (flags & FOrder1) != 0
      val lit =
        if (order1) Array.fill(maxSym)(new AdaptiveModel(maxSym))
        else Array(new AdaptiveModel(maxSym))
      val runs = Array.fill(maxSym + 2)(new AdaptiveModel(256))
      var last = 0
      var i = 0
      while (i < inner.length) {
        val b = inner(i) & 0xff
        var run = 0
        while (i + run + 1 < inner.length &&
          (inner(i + run + 1) & 0xff) == b) run += 1
        lit(if (order1) last else 0).encodeSymbol(rc, b)
        last = b
        i += run + 1
        // emit run in 255-continuation chunks; 255 always continues
        var rem = run
        var ctx = b
        var chunk = math.min(rem, 255)
        runs(ctx).encodeSymbol(rc, chunk)
        ctx = maxSym
        while (chunk == 255) {
          rem -= 255
          chunk = math.min(rem, 255)
          runs(ctx).encodeSymbol(rc, chunk)
          ctx = maxSym + 1
        }
      }
    } else if ((flags & FOrder1) != 0) {
      val models = Array.fill(maxSym)(new AdaptiveModel(maxSym))
      var last = 0
      inner.foreach { d =>
        val s = d & 0xff
        models(last).encodeSymbol(rc, s)
        last = s
      }
    } else {
      val model = new AdaptiveModel(maxSym)
      inner.foreach(d => model.encodeSymbol(rc, d & 0xff))
    }
    rc.finish()
    out.bytes(body.toByteArray)
    out.result
  }
}
