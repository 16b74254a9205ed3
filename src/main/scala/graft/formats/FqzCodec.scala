package graft.formats

/** FQZComp quality codec — CRAM 3.1 block method 7 (hts-specs
  * CRAMcodecs §"FQZComp quality codec"; the reference reads 3.1 through
  * noodles, `/root/reference/oxbow/src/alignment/scanner/cram.rs`).
  *
  * Quality strings are strongly autocorrelated: the next quality is
  * predicted by the previous few, by the position within the read, and
  * by how "noisy" the read has been so far. FQZComp codes each quality
  * against an adaptive model ([[ArithCodec.AdaptiveModel]] over the
  * same carry-counting range coder as method 6) selected by a 16-bit
  * mixed context assembled from configurable slices:
  *
  *   context = ((qctx & (2^qbits-1)) << qloc)     recent-quality history
  *           + (ptab[min(p, 1023)]   << ploc)     position in read
  *           + (dtab[min(delta,255)] << dloc)     running mismatch count
  *           + (sel                  << sloc)     parameter selector
  *
  * where `qctx` accumulates `qtab[q]` values shifted by `qshift` per
  * symbol, `p` counts down the record, and `delta` increments whenever
  * a quality differs from its predecessor. All tables, bit widths and
  * locations come from the parameter block, so the decoder is fully
  * table-driven; the initial context of each record is the header's
  * `context` word. Record lengths are themselves range-coded (four
  * byte-models), as are the optional per-record selector, duplicate
  * flag (whole-record repeat) and reversal flag.
  *
  * Layout: version byte (5), gflags (1 = multi-param, 2 = selector
  * table, 4 = reversal flags), optional parameter-set count and RLE'd
  * selector table, then per parameter set: u16-LE initial context,
  * pflags (1 dedup, 2 explicit lengths, 4 selector-in-context, 8 qmap,
  * 16 ptab, 32 dtab, 64 qtab), max_sym, three packed nibble pairs
  * (qbits|qshift, qloc|sloc, ploc|dloc), optional qmap (max_sym bytes)
  * and RLE'd qtab/ptab/dtab arrays; then the range-coded payload.
  *
  * Array framing: qtab/ptab/dtab are monotone non-decreasing bucket
  * tables, serialized per the spec's `read_array` scheme — a list of
  * run lengths, one per value `k = 0, 1, 2, ...` (a length of 255
  * continues the same value in the next byte; a length of 0 skips a
  * value), with the run-length list itself byte-RLE'd (a byte equal to
  * its predecessor is followed by a count of additional repeats).
  *
  * Conformance notes: no tool-produced method-7 CRAM exists in the test
  * corpus, so validation is by round-trip over realistic quality
  * corpora (plateau, ramp, binned, dedup-heavy shapes) with the
  * context-mixing architecture, header layout and array framing
  * following the published spec; byte-level identity with htscodecs
  * output is not asserted anywhere.
  */
object FqzCodec {

  // gflags
  private val GMultiParam = 1
  private val GHaveSTab = 2
  private val GDoRev = 4
  // pflags
  private val PDoDedup = 1
  private val PDoLen = 2
  private val PDoSel = 4
  private val PHaveQMap = 8
  private val PHavePTab = 16
  private val PHaveDTab = 32
  private val PHaveQTab = 64

  private final case class Params(
      context: Int, pflags: Int, maxSym: Int,
      qbits: Int, qshift: Int, qloc: Int, sloc: Int, ploc: Int, dloc: Int,
      qmap: Array[Int], qtab: Array[Int], ptab: Array[Int],
      dtab: Array[Int]) {
    def qmask: Int = (1 << qbits) - 1
    def doDedup: Boolean = (pflags & PDoDedup) != 0
    def doLen: Boolean = (pflags & PDoLen) != 0
    def doSel: Boolean = (pflags & PDoSel) != 0
  }

  /** Shared per-block model set. Quality models are lazily materialized:
    * a 16-bit context space is 65k models but a given block touches a
    * tiny fraction of them. */
  private final class Models(numQSym: Int, maxSel: Int) {
    private val qual = new Array[ArithCodec.AdaptiveModel](1 << 16)
    def q(ctx: Int): ArithCodec.AdaptiveModel = {
      val m = qual(ctx)
      if (m != null) m
      else {
        val nm = new ArithCodec.AdaptiveModel(numQSym)
        qual(ctx) = nm
        nm
      }
    }
    val len: Array[ArithCodec.AdaptiveModel] =
      Array.fill(4)(new ArithCodec.AdaptiveModel(256))
    val dup = new ArithCodec.AdaptiveModel(2)
    val rev = new ArithCodec.AdaptiveModel(2)
    val sel = new ArithCodec.AdaptiveModel(math.max(1, maxSel))
  }

  // ------------------------------------------------- RLE'd array framing

  /** Spec `store_array`: run length per value k (chunked at 255: a 255
    * byte continues the same value; 0 skips a value), then the run
    * list byte-RLE'd — a byte equal to its predecessor is followed by
    * a count of additional repeats. Tables must be monotone
    * non-decreasing starting from 0. */
  private def writeArray(out: java.io.ByteArrayOutputStream,
      arr: Array[Int]): Unit = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var k = 0
    while (i < arr.length) {
      require(arr(i) >= k && arr(i) >= 0,
        s"fqzcomp tables must be monotone non-decreasing (saw ${arr(i)} after $k)")
      var run = 0
      while (i < arr.length && arr(i) == k) { run += 1; i += 1 }
      var r = 0
      do { r = math.min(255, run); runs += r; run -= r } while (r == 255)
      k += 1
    }
    var j = 0
    var last = -1
    while (j < runs.length) {
      val b = runs(j)
      out.write(b)
      if (b == last) {
        var extra = 0
        while (j + 1 + extra < runs.length && extra < 255 &&
          runs(j + 1 + extra) == b) extra += 1
        out.write(extra)
        j += extra
      } else last = b
      j += 1
    }
  }

  /** Spec `read_array`: inverse of [[writeArray]]. */
  private def readArray(in: ArithCodec.In, size: Int): Array[Int] = {
    // undo the byte-RLE into the per-value run-length list
    val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var z = 0
    var last = -1
    // a 255 chunk continues the same value in the next byte, so the
    // stream is only complete once the final chunk is < 255 — even
    // after the run total has reached `size` (a run that is an exact
    // multiple of 255 ends with a 0 continuation byte)
    while (z < size || (runs.nonEmpty && runs.last == 255)) {
      val b = in.u8()
      runs += b; z += b
      if (b == last) {
        var rep = in.u8()
        while (rep > 0) { runs += b; z += b; rep -= 1 }
      } else last = b
    }
    require(z == size, s"fqzcomp array runs sum $z != $size")
    // expand: value k repeated runs(j) times, 255 continuing the value
    val out = new Array[Int](size)
    var i = 0
    var j = 0
    var k = 0
    while (i < size) {
      require(j < runs.length, "fqzcomp array truncated")
      var runLen = 0
      var r = 0
      do { r = runs(j); j += 1; runLen += r } while (r == 255 && j < runs.length)
      require(i + runLen <= size, s"fqzcomp array overrun at $i run $runLen")
      var c = 0
      while (c < runLen) { out(i) = k; i += 1; c += 1 }
      k += 1
    }
    out
  }

  // ------------------------------------------------------------- decode

  /** Corrupt or truncated payloads raise [[IllegalArgumentException]]
    * naming the codec, never a bare index error. */
  def decode(src: Array[Byte], expectedLen: Int): Array[Byte] =
    try decodeImpl(src, expectedLen)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
          _: java.io.IOException) =>
        throw new IllegalArgumentException(
          s"fqzcomp: corrupt or truncated payload " +
            s"(${src.length} bytes): ${e.getClass.getSimpleName}", e)
    }

  private def decodeImpl(src: Array[Byte], expectedLen: Int): Array[Byte] = {
    if (expectedLen <= 0) return Array.empty
    val in = new ArithCodec.In(src)
    val vers = in.u8()
    require(vers == 5, s"fqzcomp version $vers not supported (want 5)")
    val gflags = in.u8()
    val nParam = if ((gflags & GMultiParam) != 0) in.u8() else 1
    require(nParam >= 1,
      "fqzcomp: corrupt payload, multi-param header with 0 parameter sets")
    var maxSel = if (nParam > 1) nParam else 0
    val stab: Array[Int] =
      if ((gflags & GHaveSTab) != 0) {
        maxSel = in.u8()
        readArray(in, maxSel + 1)
      } else Array.tabulate(math.max(1, maxSel))(i =>
        math.min(i, nParam - 1))

    val params = Array.fill(nParam) {
      val context = in.u8() | (in.u8() << 8)
      val pflags = in.u8()
      val maxSym = { val b = in.u8(); if (b == 0) 256 else b }
      val x0 = in.u8(); val qbits = x0 >> 4; val qshift = x0 & 15
      val x1 = in.u8(); val qloc = x1 >> 4; val sloc = x1 & 15
      val x2 = in.u8(); val ploc = x2 >> 4; val dloc = x2 & 15
      val qmap =
        if ((pflags & PHaveQMap) != 0) Array.fill(maxSym)(in.u8())
        else Array.tabulate(256)(identity)
      val qtab =
        if ((pflags & PHaveQTab) != 0) readArray(in, 256)
        else Array.tabulate(256)(identity)
      val ptab =
        if ((pflags & PHavePTab) != 0) readArray(in, 1024)
        else new Array[Int](1024)
      val dtab =
        if ((pflags & PHaveDTab) != 0) readArray(in, 256)
        else new Array[Int](256)
      Params(context, pflags, maxSym, qbits, qshift, qloc, sloc, ploc,
        dloc, qmap, qtab, ptab, dtab)
    }

    val numQSym = params.map(_.maxSym).max
    val models = new Models(numQSym, maxSel + 1)
    val rc = new ArithCodec.RangeDecoder(in)

    val out = new Array[Byte](expectedLen)
    val revFlags = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
    var i = 0
    var recStart = 0
    var recLen = 0
    var lastLen = 0
    var pm = params(0)
    // per-record state
    var p = 0
    var qctx = 0
    var delta = 0
    var prevQ = 0
    var ctx = 0
    var sel = 0
    while (i < expectedLen) {
      if (p == 0) {
        // ---- new record
        val s =
          if (maxSel > 0) models.sel.decodeSymbol(rc)
          else 0
        sel = s
        pm = params(if (s < stab.length) stab(s) else nParam - 1)
        recLen =
          if (pm.doLen || i == 0) {
            val l = models.len(0).decodeSymbol(rc) |
              (models.len(1).decodeSymbol(rc) << 8) |
              (models.len(2).decodeSymbol(rc) << 16) |
              (models.len(3).decodeSymbol(rc) << 24)
            lastLen = l
            l
          } else lastLen
        require(recLen > 0 && i + recLen <= expectedLen,
          s"fqzcomp record length $recLen overruns output at $i")
        val isRev =
          if ((gflags & GDoRev) != 0) models.rev.decodeSymbol(rc) == 1
          else false
        if (isRev) revFlags += ((i, recLen, true))
        if (pm.doDedup && models.dup.decodeSymbol(rc) == 1) {
          // whole-record duplicate of the previous record
          System.arraycopy(out, recStart, out, i, recLen)
          recStart = i
          i += recLen
          p = 0
        } else {
          recStart = i
          p = recLen
          qctx = 0
          delta = 0
          prevQ = 0
          ctx = pm.context
        }
      } else {
        val q = models.q(ctx).decodeSymbol(rc)
        out(i) = (if (q < pm.qmap.length) pm.qmap(q) else q).toByte
        i += 1
        // mix the next context; the position term reads p BEFORE the
        // decrement (spec: ptab[min(p,1023)], then p--)
        qctx = (qctx << pm.qshift) + pm.qtab(q)
        var next = (qctx & pm.qmask) << pm.qloc
        next += pm.ptab(math.min(p, 1023)) << pm.ploc
        next += pm.dtab(math.min(delta, 255)) << pm.dloc
        if (pm.doSel) next += sel << pm.sloc
        p -= 1
        if (prevQ != q) delta += 1
        prevQ = q
        ctx = next & 0xffff
      }
    }
    revFlags.foreach { case (start, len, _) =>
      var a = start
      var b = start + len - 1
      while (a < b) {
        val t = out(a); out(a) = out(b); out(b) = t
        a += 1; b -= 1
      }
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Encode concatenated quality bytes with the given record lengths.
    * Single parameter set, explicit lengths, dedup on, qmap over the
    * observed alphabet, position and delta context tables — the shape
    * htslib's default profile produces for typical short-read data. */
  def encode(data: Array[Byte], lens: Seq[Int]): Array[Byte] = {
    require(data.nonEmpty, "fqzcomp needs at least one quality byte")
    require(lens.sum == data.length,
      s"record lengths sum ${lens.sum} != data ${data.length}")
    require(lens.forall(_ > 0), "fqzcomp records must be non-empty")

    val present = data.map(_ & 0xff).distinct.sorted.toArray
    val qmap = present
    val qIndex = new Array[Int](256)
    present.zipWithIndex.foreach { case (v, k) => qIndex(v) = k }
    val maxSym = present.length

    // context geometry: 10 bits of quality history, 3 of position,
    // 3 of delta — 16 bits total
    val qbits = 10
    val qshift = 5
    val qloc = 0
    val ploc = 10
    val dloc = 13
    val sloc = 15
    val ptab = Array.tabulate(1024)(pv => math.min(7, pv >> 4))
    val dtab = Array.tabulate(256)(d => math.min(7, d))
    val qtab = Array.tabulate(256)(identity)

    val pflags = PDoDedup | PDoLen | PHaveQMap | PHavePTab | PHaveDTab
    val context = 0

    val out = new java.io.ByteArrayOutputStream()
    out.write(5) // version
    out.write(0) // gflags: single param, no stab, no rev
    out.write(context & 0xff); out.write((context >> 8) & 0xff)
    out.write(pflags)
    out.write(maxSym & 0xff) // 256 symbols write as 0 (0-means-256)
    out.write((qbits << 4) | qshift)
    out.write((qloc << 4) | sloc)
    out.write((ploc << 4) | dloc)
    qmap.foreach(out.write)
    writeArray(out, ptab)
    writeArray(out, dtab)

    val pm = Params(context, pflags, maxSym, qbits, qshift, qloc, sloc,
      ploc, dloc, qmap.map(_.toInt), qtab, ptab, dtab)
    val models = new Models(maxSym, 1)
    val body = new java.io.ByteArrayOutputStream()
    val rc = new ArithCodec.RangeEncoder(body)

    var off = 0
    var prevStart = -1
    var prevLen = -1
    lens.foreach { len =>
      models.len(0).encodeSymbol(rc, len & 0xff)
      models.len(1).encodeSymbol(rc, (len >> 8) & 0xff)
      models.len(2).encodeSymbol(rc, (len >> 16) & 0xff)
      models.len(3).encodeSymbol(rc, (len >> 24) & 0xff)
      val isDup = prevLen == len && (0 until len).forall(k =>
        data(prevStart + k) == data(off + k))
      models.dup.encodeSymbol(rc, if (isDup) 1 else 0)
      if (!isDup) {
        var p = len
        var qctx = 0
        var delta = 0
        var prevQ = 0
        var ctx = pm.context
        var k = off
        while (k < off + len) {
          val q = qIndex(data(k) & 0xff)
          models.q(ctx).encodeSymbol(rc, q)
          // position term reads p before the decrement (mirrors decode)
          qctx = (qctx << pm.qshift) + pm.qtab(q)
          var next = (qctx & pm.qmask) << pm.qloc
          next += pm.ptab(math.min(p, 1023)) << pm.ploc
          next += pm.dtab(math.min(delta, 255)) << pm.dloc
          if (pm.doSel) next += 0 << pm.sloc // single-param encode: sel 0
          p -= 1
          if (prevQ != q) delta += 1
          prevQ = q
          ctx = next & 0xffff
          k += 1
        }
      }
      prevStart = off
      prevLen = len
      off += len
    }
    rc.finish()
    out.write(body.toByteArray, 0, body.size())
    out.toByteArray
  }
}
