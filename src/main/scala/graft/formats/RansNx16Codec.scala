package graft.formats

/** rANS Nx16 entropy codec — the workhorse block method of CRAM 3.1
  * (method id 5; hts-specs CRAMcodecs §rANS Nx16; the reference reads 3.1
  * through noodles, `/root/reference/oxbow/src/alignment/scanner/cram.rs`).
  *
  * Stream layout: a format byte, then (unless NOSZ) the uncompressed
  * length as a uint7 varint, then optional transform metadata, then the
  * entropy payload. Bit flags of the format byte:
  *
  *   0x01 ORDER-1    0x04 N=32 states (else 4)   0x08 STRIPE
  *   0x10 NOSZ       0x20 CAT (stored raw)       0x40 RLE    0x80 PACK
  *
  * Decode pipeline (encode runs the reverse): entropy/CAT decode → RLE
  * expand → PACK expand; STRIPE splits the stream into `n` interleaved
  * sub-streams each recursively coded. The rANS core uses 12-bit
  * normalized frequencies with 16-bit renormalization at 2^15 over N
  * interleaved u32 states (order-0: byte i from state i mod N; order-1:
  * N contiguous slices conditioned on the previous byte, state N-1 also
  * covering the tail), matching the 4x8 codec's structure
  * ([[RansCodec]]) with a wider reload.
  *
  * Conformance notes: the wrapper layers (CAT/PACK and the metadata
  * framing) are validated against a samtools-written CRAM 3.1 file
  * (`/root/reference/fixtures/sample-ref.cram`); the o0 and o1 entropy
  * sections are validated against byte-literal streams hand-derived from
  * the spec's algorithm (full state arithmetic in `RansNx16CodecSpec`,
  * not produced by this encoder), including down-shifted frequency
  * tables; RLE/STRIPE by hand-built streams plus round-trip. No
  * tool-produced sample of the entropy paths exists in the test corpus.
  */
object RansNx16Codec {

  private val Shift = 12 // 12-bit frequencies for o0 and o1
  private val TotFreq = 1 << Shift
  private val RenormLow = 1 << 15 // reload 16 bits when a state drops below

  // flags
  private val FOrder1 = 0x01
  private val FN32 = 0x04
  private val FStripe = 0x08
  private val FNosz = 0x10
  private val FCat = 0x20
  private val FRle = 0x40
  private val FPack = 0x80

  private final class In(val data: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
    def u16le(): Int = u8() | (u8() << 8)
    def u32le(): Long = u16le() | (u16le().toLong << 16)
    /** Big-endian base-128 varint (the spec's uint7). */
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
    def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32le(v: Long): Unit = { u16le(v.toInt & 0xffff); u16le((v >> 16).toInt) }
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

  // ------------------------------------------------------------- decode

  /** Decode a ransNx16 stream. `expectedLen` is the block's declared raw
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
          s"ransNx16: corrupt or truncated payload " +
            s"(${src.length} bytes): ${e.getClass.getSimpleName}", e)
    }

  private def decode(in: In, expectedLen: Int): Array[Byte] = {
    val flags = in.u8()
    val ulen = if ((flags & FNosz) != 0) expectedLen else in.uint7()

    if ((flags & FStripe) != 0) return decodeStripe(in, ulen)

    // PACK metadata (expansion applied last)
    var packMap: Array[Byte] = null
    var innerLen = ulen
    if ((flags & FPack) != 0) {
      val nsym = in.u8()
      packMap = in.take(nsym)
      innerLen = in.uint7()
    }
    // RLE metadata (expansion applied between entropy and pack)
    var rleSyms: Array[Boolean] = null
    var rleRuns: In = null
    var entropyLen = innerLen
    if ((flags & FRle) != 0) {
      val metaLen = in.uint7()
      entropyLen = in.uint7()
      val meta =
        if ((metaLen & 1) != 0) new In(in.take(metaLen >> 1))
        else {
          val compLen = in.uint7()
          new In(decode(new In(in.take(compLen)), metaLen >> 1))
        }
      var n = meta.u8()
      if (n == 0) n = 256
      rleSyms = new Array[Boolean](256)
      (0 until n).foreach(_ => rleSyms(meta.u8()) = true)
      rleRuns = meta
    }

    val entropy =
      if ((flags & FCat) != 0) in.take(entropyLen)
      else if ((flags & FOrder1) != 0)
        decodeO1(in, entropyLen, if ((flags & FN32) != 0) 32 else 4)
      else decodeO0(in, entropyLen, if ((flags & FN32) != 0) 32 else 4)

    val unrle =
      if (rleSyms == null) entropy
      else {
        val out = new Array[Byte](innerLen)
        var i = 0
        var j = 0
        while (i < entropy.length) {
          val b = entropy(i)
          out(j) = b; j += 1
          if (rleSyms(b & 0xff)) {
            var run = rleRuns.uint7()
            while (run > 0) { out(j) = b; j += 1; run -= 1 }
          }
          i += 1
        }
        require(j == innerLen, s"ransNx16 RLE expanded to $j, want $innerLen")
        out
      }

    if (packMap == null) unrle else unpack(unrle, packMap, ulen)
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

  /** Shared by [[ArithCodec]] — both 3.1 codecs define the identical
    * bit-pack transform. `codec` only labels error messages. */
  private[formats] def unpack(packed: Array[Byte], map: Array[Byte],
      ulen: Int, codec: String = "ransNx16"): Array[Byte] = {
    val nsym = map.length
    val out = new Array[Byte](ulen)
    if (nsym <= 1) {
      java.util.Arrays.fill(out, if (nsym == 1) map(0) else 0.toByte)
    } else {
      val (bits, per) =
        if (nsym <= 2) (1, 8) else if (nsym <= 4) (2, 4)
        else if (nsym <= 16) (4, 2)
        else throw new IllegalArgumentException(
          s"$codec PACK with $nsym symbols (max 16)")
      val mask = (1 << bits) - 1
      var i = 0
      while (i < ulen) {
        var v = packed(i / per) & 0xff
        var k = 0
        while (k < (i % per)) { v >>= bits; k += 1 }
        out(i) = map(v & mask)
        i += 1
      }
    }
    out
  }

  /** Alphabet + uint7 frequencies, scaled to 4096 (spec ReadFrequencies0
    * + the shift-based NormaliseFrequencies0). Same sym/run RLE scheme
    * as the 4x8 codec's tables, 0-terminated. */
  private def readFreqs0(in: In): (Array[Int], Array[Int]) = {
    val alphabet = readAlphabet(in)
    val f = new Array[Int](256)
    alphabet.foreach(s => f(s) = in.uint7())
    scaleFreqs(f, 0 until 256, TotFreq)
    val c = new Array[Int](257)
    var x = 0
    var s = 0
    while (s < 256) { c(s) = x; x += f(s); s += 1 }
    c(256) = x
    (f, c)
  }

  private def readAlphabet(in: In): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var sym = in.u8()
    var lastSym = sym
    var rle = 0
    var done = false
    while (!done) {
      out += sym
      if (rle > 0) { rle -= 1; sym += 1 }
      else {
        sym = in.u8()
        if (sym == lastSym + 1) rle = in.u8()
      }
      lastSym = sym
      if (sym == 0) done = true
    }
    out.toSeq
  }

  /** Decoder-side frequency scaling, matching the spec/htscodecs scheme:
    * stored tables sum either to `tot` exactly or to a smaller
    * power-of-two fraction of it (encoders may down-shift small tables),
    * in which case every frequency is scaled up by the shift difference.
    * Any other total is a corrupt/non-conformant table — fail loudly
    * rather than silently building a different table than the encoder
    * used (which would emit garbage bytes). */
  private def scaleFreqs(f: Array[Int], syms: Iterable[Int],
      tot: Int): Unit = {
    var total = 0L
    syms.foreach(s => total += f(s))
    if (total == 0 || total == tot) return
    require(total < tot && tot % total == 0,
      s"ransNx16 frequency table sums to $total, " +
        s"not a power-of-two fraction of $tot")
    val mul = (tot / total).toInt
    syms.foreach(s => f(s) *= mul)
  }

  /** Encoder-side proportional normalization of raw counts to [[TotFreq]]
    * (spec NormaliseFrequencies0): min-1 clamp, remainder onto the most
    * frequent symbol. Decode uses the strict [[scaleFreqs]] instead. */
  private def normalize(f: Array[Int]): Unit = {
    var total = 0L
    var s = 0
    while (s < 256) { total += f(s); s += 1 }
    if (total == 0 || total == TotFreq) return
    // pick the remainder carrier from the RAW histogram before any slot
    // is overwritten: comparing raw counts against already-normalized
    // slots can select a small symbol and drive it negative
    var maxSym = 0
    s = 0
    while (s < 256) { if (f(s) > f(maxSym)) maxSym = s; s += 1 }
    var assigned = 0
    s = 0
    while (s < 256) {
      if (f(s) > 0) {
        f(s) = math.max(1, (f(s).toLong * TotFreq / total).toInt)
        assigned += f(s)
      }
      s += 1
    }
    f(maxSym) += TotFreq - assigned
    require(f(maxSym) > 0, "ransNx16 frequency normalization failed")
  }

  private def symbolLookup(f: Array[Int], c: Array[Int]): Array[Byte] = {
    val lut = new Array[Byte](TotFreq)
    var s = 0
    while (s < 256) {
      if (f(s) > 0) java.util.Arrays.fill(lut, c(s), c(s) + f(s), s.toByte)
      s += 1
    }
    lut
  }

  private def decodeO0(in: In, ulen: Int, n: Int): Array[Byte] = {
    val (f, c) = readFreqs0(in)
    val lut = symbolLookup(f, c)
    val states = Array.fill(n)(in.u32le())
    val out = new Array[Byte](ulen)
    var i = 0
    while (i < ulen) {
      val j = i % n
      var r = states(j)
      val m = (r & (TotFreq - 1)).toInt
      val s = lut(m) & 0xff
      r = f(s) * (r >>> Shift) + m - c(s)
      // no end-of-buffer skip here: a valid stream always has the bytes
      // a needed renorm asks for, so running out is corruption and must
      // surface (u8's bounds check → the wrapper's IAE), not decode on
      // with an under-filled state and return silent garbage
      while (r < RenormLow) {
        r = (r << 16) | in.u16le()
      }
      states(j) = r
      out(i) = s.toByte
      i += 1
    }
    out
  }

  /** Order-1: a flag byte (high nibble = shift, low bit = tables stored
    * rans-o0-compressed), then per-context frequency tables over a shared
    * alphabet, each row normalized to `1 << shift`. Output is split into
    * N contiguous slices, each decoded by one state conditioned on the
    * previous byte of its slice (state N-1 also covers the tail). */
  private def decodeO1(in: In, ulen: Int, n: Int): Array[Byte] = {
    val comp = in.u8()
    val shift = comp >> 4
    val tblIn =
      if ((comp & 1) != 0) {
        val uSize = in.uint7()
        val cSize = in.uint7()
        new In(decode(new In(in.take(cSize)), uSize))
      } else in
    val tot = 1 << shift
    val alphabet = readAlphabet(tblIn)
    val fs = Array.ofDim[Int](256, 256)
    val cs = Array.ofDim[Int](256, 257)
    val luts = new Array[Array[Byte]](256)
    alphabet.foreach { ctx =>
      val f = fs(ctx)
      alphabet.foreach { s => f(s) = tblIn.uint7() }
      // scale this row to 1 << shift (strict power-of-two-fraction rule)
      scaleFreqs(f, alphabet, tot)
      val c = cs(ctx)
      var x = 0
      var s = 0
      while (s < 256) { c(s) = x; x += f(s); s += 1 }
      c(256) = x
      val lut = new Array[Byte](tot)
      alphabet.foreach(s =>
        if (f(s) > 0) java.util.Arrays.fill(lut, c(s), c(s) + f(s), s.toByte))
      luts(ctx) = lut
    }
    val states = Array.fill(n)(in.u32le())
    val out = new Array[Byte](ulen)
    val sliceLen = ulen / n
    val starts = Array.tabulate(n)(_ * sliceLen)
    val ends = Array.tabulate(n)(j => if (j == n - 1) ulen else (j + 1) * sliceLen)
    val posArr = starts.clone()
    val ctxArr = new Array[Int](n)
    var remaining = ulen
    while (remaining > 0) {
      var j = 0
      while (j < n) {
        if (posArr(j) < ends(j)) {
          var r = states(j)
          val ctx = ctxArr(j)
          val m = (r & (tot - 1)).toInt
          val s = luts(ctx)(m) & 0xff
          r = fs(ctx)(s) * (r >>> shift) + m - cs(ctx)(s)
          // truncation must throw, not silently skip the reload (see O0)
          while (r < RenormLow) {
            r = (r << 16) | in.u16le()
          }
          states(j) = r
          out(posArr(j)) = s.toByte
          posArr(j) += 1
          ctxArr(j) = s
          remaining -= 1
        }
        j += 1
      }
    }
    out
  }

  // ------------------------------------------------------------- encode
  // (round-trip validation + 3.1 fixture generation; order-0 only, with
  // optional CAT/PACK exactly as the decode side expects)

  /** Encode with order-0 rANS, CAT, or a 1/2/4-bit PACK transform with
    * an entropy-coded packed stream — whichever serializes smallest
    * (mirroring htscodecs' per-stream method selection). */
  def encode(data: Array[Byte], n: Int = 4): Array[Byte] = {
    val distinct = data.map(_ & 0xff).distinct.sorted
    val nflag = if (n == 32) FN32 else 0

    def cat: Array[Byte] = {
      val out = new Out
      out.u8(FCat | nflag)
      out.uint7(data.length)
      out.bytes(data)
      out.result
    }
    def o0: Option[Array[Byte]] =
      if (data.length < 32) None
      else {
        val out = new Out
        out.u8(nflag)
        out.uint7(data.length)
        encodeO0(out, data, n)
        Some(out.result)
      }
    def pack1: Option[Array[Byte]] =
      if (distinct.length != 1) None
      else {
        val out = new Out
        out.u8(FPack | FCat | nflag)
        out.uint7(data.length)
        out.u8(1)
        out.u8(distinct(0))
        out.uint7(0)
        Some(out.result)
      }
    def packN: Option[Array[Byte]] =
      if (distinct.length < 2 || distinct.length > 16 || data.isEmpty) None
      else {
        val (bits, per) =
          if (distinct.length <= 2) (1, 8)
          else if (distinct.length <= 4) (2, 4)
          else (4, 2)
        val index = new Array[Int](256)
        distinct.zipWithIndex.foreach { case (v, k) => index(v) = k }
        val packed = new Array[Byte]((data.length + per - 1) / per)
        var i = 0
        while (i < data.length) {
          packed(i / per) = (packed(i / per) |
            (index(data(i) & 0xff) << ((i % per) * bits))).toByte
          i += 1
        }
        val out = new Out
        if (packed.length < 32) {
          out.u8(FPack | FCat | nflag)
          out.uint7(data.length)
          out.u8(distinct.length)
          distinct.foreach(out.u8)
          out.uint7(packed.length)
          out.bytes(packed)
        } else {
          out.u8(FPack | nflag)
          out.uint7(data.length)
          out.u8(distinct.length)
          distinct.foreach(out.u8)
          out.uint7(packed.length)
          encodeO0(out, packed, n)
        }
        Some(out.result)
      }

    (Seq(cat) ++ o0 ++ pack1 ++ packN).minBy(_.length)
  }

  private def encodeO0(out: Out, data: Array[Byte], n: Int): Unit = {
    val hist = new Array[Int](256)
    data.foreach(b => hist(b & 0xff) += 1)
    val f = hist.clone()
    normalize(f)
    // alphabet + freqs, mirroring readFreqs0
    val present = (0 until 256).filter(f(_) > 0)
    writeAlphabet(out, present)
    present.foreach(s => out.uint7(f(s)))
    val c = new Array[Int](257)
    var x = 0
    (0 until 256).foreach { s => c(s) = x; x += f(s) }
    // rANS: encode backwards, emitting 16-bit chunks; replay state writes
    val states = Array.fill(n)(RenormLow.toLong)
    val emitted = new java.util.ArrayList[Integer]()
    var i = data.length - 1
    while (i >= 0) {
      val j = i % n
      val s = data(i) & 0xff
      var r = states(j)
      val fs = f(s)
      val xMax = ((RenormLow.toLong >> Shift) << 16) * fs
      while (r >= xMax) { emitted.add((r & 0xffff).toInt); r >>= 16 }
      states(j) = ((r / fs) << Shift) + (r % fs) + c(s)
      i -= 1
    }
    var j = 0
    while (j < n) { out.u32le(states(j)); j += 1 }
    var k = emitted.size() - 1
    while (k >= 0) { out.u16le(emitted.get(k)); k -= 1 }
  }

  private def writeAlphabet(out: Out, present: Seq[Int]): Unit = {
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
        lastWritten = sym + run
        i += run + 1
      } else {
        lastWritten = sym
        i += 1
      }
    }
    out.u8(0)
  }
}
