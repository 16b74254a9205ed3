package graft.formats

import scala.collection.mutable

/** Name tokeniser codec — CRAM 3.1 block method 8 (hts-specs CRAMcodecs
  * §"Name tokenisation"; the reference reads 3.1 through noodles,
  * `/root/reference/oxbow/src/alignment/scanner/cram.rs`).
  *
  * Read names ("SRR1234.567/1", "chr1:10002-20001#7", ...) are highly
  * structured: instrument/run prefixes repeat verbatim and trailing
  * counters step by small deltas. The codec decomposes each name into
  * tokens — digit runs (zero-padded or not), alphabetic runs, single
  * punctuation characters — and codes each (token position, token
  * type) pair as its own stream, so a column of near-identical values
  * compresses to almost nothing. Token types relate a name to an
  * EARLIER name chosen by distance: the position-0 TYPE stream holds
  * DIFF (tokens delta against name `i - dist`) or DUP (name `i` is a
  * verbatim copy of name `i - dist`), with `dist` stored as uint32-LE
  * in the DIFF/DUP value stream (`dist = 0` on a DIFF means "no
  * reference" — all tokens literal; used for the first name). Each
  * stream is entropy-coded independently by either rANS Nx16
  * ([[RansNx16Codec]]) or adaptive arithmetic ([[ArithCodec]]),
  * selected by the `use_arith` header byte.
  *
  * Serialized layout (per the spec): a fixed 9-byte header — uint32-LE
  * uncompressed length, uint32-LE name count, one `use_arith` byte —
  * then the streams in position order (TYPE stream first within a
  * position, then value streams by ascending type id). Per stream: a
  * descriptor byte (type id in bits 0-5, 0x80 = starts a new position,
  * 0x40 = duplicate stream), then EITHER two bytes (position, type) of
  * an earlier stream whose uncompressed bytes this stream repeats
  * (0x40 set), OR a uint7 compressed length and the compressed bytes.
  *
  * Separator convention (htscodecs `tok3_decode_names`): the encoder
  * accepts names terminated by `\n` or NUL and does not code the
  * terminators; the decoder regenerates names each followed by a NUL
  * byte — the shape CRAM's BYTE_ARRAY_STOP(stop=0) RN series consumes
  * directly. A missing trailing terminator is reproduced exactly (the
  * header's uncompressed length disambiguates).
  *
  * Conformance notes: no tool-produced method-8 CRAM exists in the test
  * corpus, so byte-level identity with htscodecs output is not asserted
  * anywhere; the header framing, descriptor bits, distance semantics
  * and token model follow the published spec, and validation is by
  * round-trip over realistic name corpora plus the end-to-end CRAM
  * gate fixture (s23).
  */
object NameTokCodec {

  // token types (spec ids)
  private val TType = 0
  private val TString = 1
  private val TChar = 2
  private val TDigits0 = 3
  private val TDzLen = 4
  private val TDup = 5
  private val TDiff = 6
  private val TDigits = 7
  private val TDelta = 8
  private val TDelta0 = 9
  private val TMatch = 10
  private val TEnd = 12

  /** One decomposed token: the literal text plus, for numeric tokens,
    * the value and whether it was zero-padded to `text.length`. */
  private final case class Tok(text: String, value: Long = -1,
      padded: Boolean = false)

  private def tokenize(name: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c.isDigit) {
        var j = i
        // cap digit runs so values stay below 2^32 (spec stores uint32)
        while (j < name.length && name.charAt(j).isDigit && j - i < 9) j += 1
        val s = name.substring(i, j)
        out += Tok(s, s.toLong, padded = s.length > 1 && s.charAt(0) == '0')
        i = j
      } else if (c.isLetter) {
        var j = i
        while (j < name.length && name.charAt(j).isLetter) j += 1
        out += Tok(name.substring(i, j))
        i = j
      } else {
        out += Tok(c.toString)
        i += 1
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- encode

  /** Encode a block of names terminated by newline (the CLI convention)
    * or NUL (the CRAM RN convention — BYTE_ARRAY_STOP with stop 0).
    * Terminators separate names and are not themselves coded; a final
    * name without a terminator is allowed and reproduced. `useArith`
    * picks the per-stream entropy coder: adaptive arithmetic instead
    * of rANS Nx16. */
  def encode(raw: Array[Byte], useArith: Boolean = false): Array[Byte] = {
    val text = new String(raw, "ISO-8859-1")
    // split on separators; terminators excluded from the names
    val names: Array[String] = {
      val out = Array.newBuilder[String]
      var start = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c == '\n' || c == '\u0000') {
          out += text.substring(start, i)
          start = i + 1
        }
        i += 1
      }
      if (start < text.length) out += text.substring(start)
      out.result()
    }

    // per-(position, type) byte streams
    val streams = mutable.LinkedHashMap.empty[(Int, Int), mutable.ArrayBuffer[Byte]]
    def s(pos: Int, t: Int): mutable.ArrayBuffer[Byte] =
      streams.getOrElseUpdate((pos, t), mutable.ArrayBuffer.empty[Byte])
    def u32le(b: mutable.ArrayBuffer[Byte], v: Long): Unit = {
      b += (v & 0xff).toByte; b += ((v >> 8) & 0xff).toByte
      b += ((v >> 16) & 0xff).toByte; b += ((v >> 24) & 0xff).toByte
    }

    var prevToks: Vector[Tok] = Vector.empty
    var prevName: String = null
    names.foreach { name =>
      if (prevName != null && name == prevName) {
        s(0, TType) += TDup.toByte
        u32le(s(0, TDup), 1) // name i duplicates name i - 1
        // tokens carry over unchanged for the next name's reference
      } else {
        s(0, TType) += TDiff.toByte
        // dist 0 = no reference name (first / fresh); else delta vs i-1
        u32le(s(0, TDiff), if (prevName == null) 0 else 1)
        val toks = tokenize(name)
        toks.zipWithIndex.foreach { case (tok, idx) =>
          val p = idx + 1
          val prev = if (idx < prevToks.length) prevToks(idx) else null
          val numeric = tok.value >= 0
          if (prev != null && prev.text == tok.text) {
            s(p, TType) += TMatch.toByte
          } else if (numeric && prev != null && prev.value >= 0 &&
            !tok.padded && !prev.padded &&
            tok.value >= prev.value && tok.value - prev.value <= 255) {
            s(p, TType) += TDelta.toByte
            s(p, TDelta) += (tok.value - prev.value).toByte
          } else if (numeric && prev != null && prev.value >= 0 &&
            tok.padded && prev.padded && prev.text.length == tok.text.length &&
            tok.value >= prev.value && tok.value - prev.value <= 255) {
            s(p, TType) += TDelta0.toByte
            s(p, TDelta0) += (tok.value - prev.value).toByte
          } else if (numeric && tok.padded) {
            s(p, TType) += TDigits0.toByte
            u32le(s(p, TDigits0), tok.value)
            s(p, TDzLen) += tok.text.length.toByte
          } else if (numeric) {
            s(p, TType) += TDigits.toByte
            u32le(s(p, TDigits), tok.value)
          } else if (tok.text.length == 1 && !tok.text.charAt(0).isLetter) {
            s(p, TType) += TChar.toByte
            s(p, TChar) += tok.text.charAt(0).toByte
          } else {
            s(p, TType) += TString.toByte
            tok.text.getBytes("ISO-8859-1").foreach(s(p, TString) += _)
            s(p, TString) += 0.toByte
          }
        }
        s(toks.length + 1, TType) += TEnd.toByte
        prevToks = toks
      }
      prevName = name
    }

    val out = new java.io.ByteArrayOutputStream()
    def u32leOut(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def uint7(v0: Int): Unit = {
      var v = v0
      val tmp = new Array[Int](5)
      var n = 0
      do { tmp(n) = v & 0x7f; v >>>= 7; n += 1 } while (v != 0)
      var i = n - 1
      while (i > 0) { out.write(tmp(i) | 0x80); i -= 1 }
      out.write(tmp(0))
    }
    // fixed 9-byte header: uint32-LE ulen, uint32-LE nnames, use_arith
    u32leOut(raw.length)
    u32leOut(names.length)
    out.write(if (useArith) 1 else 0)
    // position-major, TYPE stream first, then value streams by type id
    val ordered = streams.toSeq.sortBy { case ((p, t), _) => (p, t) }
    // uncompressed bytes of already-emitted streams, for 0x40 dup refs
    val emitted = mutable.ArrayBuffer.empty[((Int, Int), Array[Byte])]
    var lastPos = -1
    ordered.foreach { case ((p, t), bytes) =>
      val newPos = p != lastPos
      lastPos = p
      val payload = bytes.toArray
      val dup = emitted.find { case ((dp, _), b) =>
        dp <= 255 && java.util.Arrays.equals(b, payload)
      }
      dup match {
        case Some(((dp, dt), _)) =>
          out.write(t | (if (newPos) 0x80 else 0) | 0x40)
          out.write(dp)
          out.write(dt)
        case None =>
          out.write(t | (if (newPos) 0x80 else 0))
          val comp =
            if (useArith) ArithCodec.encode(payload, 0)
            else RansNx16Codec.encode(payload)
          uint7(comp.length)
          out.write(comp, 0, comp.length)
      }
      if (p <= 255 && t <= 255) emitted += (((p, t), payload))
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"name tokeniser: $msg")

  private final class In(val data: Array[Byte], var pos: Int = 0) {
    def hasNext: Boolean = pos < data.length
    def u8(): Int = {
      if (pos >= data.length) fail(
        s"truncated stream: need byte at offset $pos, have ${data.length}")
      val b = data(pos) & 0xff; pos += 1; b
    }
    def uint7(): Int = {
      var v = 0
      var c = 0
      do { c = u8(); v = (v << 7) | (c & 0x7f) } while ((c & 0x80) != 0)
      v
    }
    def u32le(): Long =
      u8().toLong | (u8().toLong << 8) | (u8().toLong << 16) |
        (u8().toLong << 24)
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > data.length) fail(
        s"truncated stream: need $n bytes at offset $pos, have ${data.length}")
      val out = java.util.Arrays.copyOfRange(data, pos, pos + n)
      pos += n
      out
    }
    def cstring(): String = {
      val sb = new StringBuilder
      var c = u8()
      while (c != 0) { sb.append(c.toChar); c = u8() }
      sb.toString()
    }
  }

  /** Decode to names each followed by a NUL separator (htscodecs
    * convention — directly consumable by BYTE_ARRAY_STOP(stop=0)); a
    * missing final separator in the original input is reproduced. */
  def decode(src: Array[Byte], expectedLen: Int): Array[Byte] = {
    val in = new In(src)
    if (src.length < 9) {
      if (src.isEmpty && expectedLen <= 0) return Array.empty[Byte]
      fail(s"header truncated: ${src.length} bytes, need 9")
    }
    val ulen = in.u32le().toInt
    val nNames = in.u32le().toInt
    val useArith = in.u8() != 0
    if (nNames < 0 || ulen < 0 || nNames > ulen + 1)
      fail(s"implausible header: ulen=$ulen names=$nNames")

    val rawStreams = mutable.Map.empty[(Int, Int), Array[Byte]]
    val streams = mutable.Map.empty[(Int, Int), In]
    var pos = -1
    while (in.hasNext) {
      val desc = in.u8()
      if ((desc & 0x80) != 0) pos += 1
      if (pos < 0) fail("first stream descriptor lacks the new-position bit")
      val t = desc & 0x3f
      val raw =
        if ((desc & 0x40) != 0) {
          // duplicate-stream descriptor: copy an earlier stream's bytes
          val dp = in.u8(); val dt = in.u8()
          rawStreams.getOrElse((dp, dt),
            fail(s"dup descriptor references missing stream (pos=$dp, type=$dt)"))
        } else {
          val clen = in.uint7()
          val payload = in.take(clen)
          if (useArith) ArithCodec.decode(payload, -1)
          else RansNx16Codec.decode(payload, -1)
        }
      rawStreams((pos, t)) = raw
      streams((pos, t)) = new In(raw)
    }
    def stream(p: Int, t: Int): In =
      streams.getOrElse((p, t),
        fail(s"missing stream (pos=$p, type=$t)"))

    val names = new Array[String](nNames)
    // per-name token vectors: DIFF/DUP distances may reference any
    // earlier name, not just i-1 (spec: reference is name i - dist)
    val allToks = new Array[Vector[Tok]](nNames)
    var i = 0
    while (i < nNames) {
      val t0 = stream(0, TType).u8()
      if (t0 == TDup) {
        // distances are unsigned 32-bit: validate in Long so values
        // past 2^31 fail typed instead of wrapping negative
        val dist = stream(0, TDup).u32le()
        if (dist < 1 || dist > i)
          fail(s"DUP distance $dist out of range at name $i")
        names(i) = names(i - dist.toInt)
        allToks(i) = allToks(i - dist.toInt)
      } else {
        if (t0 != TDiff) fail(s"unexpected name-type $t0")
        val dist = stream(0, TDiff).u32le()
        if (dist != 0 && dist > i)
          fail(s"DIFF distance $dist out of range at name $i")
        val prevToks: Vector[Tok] =
          if (dist == 0) Vector.empty else allToks(i - dist.toInt)
        val toks = Vector.newBuilder[Tok]
        val sb = new StringBuilder
        var p = 1
        var done = false
        while (!done) {
          val t = stream(p, TType).u8()
          val prev = if (p - 1 < prevToks.length) prevToks(p - 1) else null
          t match {
            case TEnd => done = true
            case TMatch =>
              if (prev == null) fail(s"MATCH with no previous token at pos $p")
              toks += prev
              sb.append(prev.text)
            case TChar =>
              val c = stream(p, TChar).u8().toChar
              toks += Tok(c.toString)
              sb.append(c)
            case TString =>
              val str = stream(p, TString).cstring()
              toks += Tok(str)
              sb.append(str)
            case TDigits =>
              val v = stream(p, TDigits).u32le()
              toks += Tok(v.toString, v)
              sb.append(v.toString)
            case TDigits0 =>
              val v = stream(p, TDigits0).u32le()
              val dl = stream(p, TDzLen).u8()
              val text = f"%%0${dl}d".format(v)
              toks += Tok(text, v, padded = true)
              sb.append(text)
            case TDelta =>
              if (prev == null || prev.value < 0)
                fail(s"DELTA with no previous number at pos $p")
              val v = prev.value + stream(p, TDelta).u8()
              toks += Tok(v.toString, v)
              sb.append(v.toString)
            case TDelta0 =>
              if (prev == null || prev.value < 0)
                fail(s"DELTA0 with no previous number at pos $p")
              val v = prev.value + stream(p, TDelta0).u8()
              val text = f"%%0${prev.text.length}d".format(v)
              toks += Tok(text, v, padded = true)
              sb.append(text)
            case other =>
              fail(s"unsupported token type $other at pos $p")
          }
          p += 1
        }
        names(i) = sb.toString()
        allToks(i) = toks.result()
      }
      i += 1
    }

    // reassemble with NUL separators; the final separator existed in
    // the original iff the declared uncompressed length says so
    val joined = names.mkString("\u0000")
    val out =
      if (joined.length + 1 == ulen) joined + "\u0000"
      else joined
    val bytes = out.getBytes("ISO-8859-1")
    if (!(bytes.length == ulen || (expectedLen >= 0 && bytes.length == expectedLen)))
      fail(s"decoded ${bytes.length} bytes, header says $ulen")
    bytes
  }
}
