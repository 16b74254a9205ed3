package graft.formats

import scala.collection.mutable

/** Name tokeniser codec — CRAM 3.1 block method 8 (hts-specs CRAMcodecs
  * §"Name tokenisation"; the reference reads 3.1 through noodles,
  * `/root/reference/oxbow/src/alignment/scanner/cram.rs`).
  *
  * Read names ("SRR1234.567/1", "chr1:10002-20001#7", ...) are highly
  * structured: instrument/run prefixes repeat verbatim and trailing
  * counters step by small deltas. The codec decomposes each
  * newline-separated name into tokens — digit runs (zero-padded or
  * not), alphabetic runs, single punctuation characters — and codes
  * each (token position, token type) pair as its own stream, so a
  * column of near-identical values compresses to almost nothing. Token
  * types relate a name to the previous one: MATCH repeats the previous
  * name's token at the same position, DELTA/DELTA0 store a 0-255
  * increment on the previous numeric value, DUP repeats an entire
  * earlier name. Each stream is entropy-coded independently by either
  * rANS Nx16 ([[RansNx16Codec]]) or adaptive arithmetic
  * ([[ArithCodec]]), selected by the `use_arith` header byte.
  *
  * Serialized layout: uint7 uncompressed length, uint7 name count, one
  * `use_arith` byte, then the streams in position order (TYPE stream
  * first within a position, then value streams by ascending type id).
  * Per stream: a descriptor byte (type id, 0x80 = starts a new
  * position), a uint7 compressed length, and the compressed bytes.
  *
  * Conformance notes: no tool-produced method-8 CRAM exists in the test
  * corpus, so this implementation is validated by round-trip over
  * realistic name corpora (Illumina, SRA, PacBio and name-sorted
  * shapes) plus unit fixtures for the token decomposition; the token
  * model and stream framing follow the published spec, but byte-level
  * identity with htscodecs output is not asserted anywhere.
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

  /** Encode a block of names separated by newline (the CLI convention)
    * or NUL (the CRAM RN convention — BYTE_ARRAY_STOP with stop 0).
    * Each name keeps its terminator as a trailing CHAR token, so the
    * codec needs no out-of-band separator convention and arbitrary
    * trailing-byte shapes round-trip exactly; after the first name the
    * terminator column collapses to MATCH tokens. `useArith` picks the
    * per-stream entropy coder: adaptive arithmetic instead of rANS
    * Nx16. */
  def encode(raw: Array[Byte], useArith: Boolean = false): Array[Byte] = {
    val text = new String(raw, "ASCII")
    // split AFTER each separator, terminators staying with their name
    val names: Array[String] = {
      val out = Array.newBuilder[String]
      var start = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c == '\n' || c == '\u0000') {
          out += text.substring(start, i + 1)
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
        u32le(s(0, TDup), 0) // distance to the duplicated name
        // tokens carry over unchanged for the next name's reference
      } else {
        s(0, TType) += TDiff.toByte
        u32le(s(0, TDiff), 0) // distance to the reference name
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
            tok.text.getBytes("ASCII").foreach(s(p, TString) += _)
            s(p, TString) += 0.toByte
          }
        }
        s(toks.length + 1, TType) += TEnd.toByte
        prevToks = toks
      }
      prevName = name
    }

    val out = new java.io.ByteArrayOutputStream()
    def uint7(v0: Int): Unit = {
      var v = v0
      val tmp = new Array[Int](5)
      var n = 0
      do { tmp(n) = v & 0x7f; v >>>= 7; n += 1 } while (v != 0)
      var i = n - 1
      while (i > 0) { out.write(tmp(i) | 0x80); i -= 1 }
      out.write(tmp(0))
    }
    uint7(raw.length)
    uint7(names.length)
    out.write(if (useArith) 1 else 0)
    // position-major, TYPE stream first, then value streams by type id
    val ordered = streams.toSeq.sortBy { case ((p, t), _) => (p, t) }
    var lastPos = -1
    ordered.foreach { case ((p, t), bytes) =>
      val newPos = p != lastPos
      lastPos = p
      out.write(t | (if (newPos) 0x80 else 0))
      val payload = bytes.toArray
      val comp =
        if (useArith) ArithCodec.encode(payload, 0)
        else RansNx16Codec.encode(payload)
      uint7(comp.length)
      out.write(comp, 0, comp.length)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  private final class In(val data: Array[Byte], var pos: Int = 0) {
    def hasNext: Boolean = pos < data.length
    def u8(): Int = { val b = data(pos) & 0xff; pos += 1; b }
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

  def decode(src: Array[Byte], expectedLen: Int): Array[Byte] = {
    val in = new In(src)
    val ulen = in.uint7()
    val nNames = in.uint7()
    val useArith = in.u8() != 0

    val streams = mutable.Map.empty[(Int, Int), In]
    var pos = -1
    while (in.hasNext) {
      val desc = in.u8()
      if ((desc & 0x80) != 0) pos += 1
      val t = desc & 0x3f
      val clen = in.uint7()
      val payload = in.take(clen)
      val raw =
        if (useArith) ArithCodec.decode(payload, -1)
        else RansNx16Codec.decode(payload, -1)
      streams((pos, t)) = new In(raw)
    }
    def stream(p: Int, t: Int): In =
      streams.getOrElse((p, t), throw new IllegalArgumentException(
        s"name tokeniser: missing stream (pos=$p, type=$t)"))

    val names = new Array[String](nNames)
    var prevToks: Vector[Tok] = Vector.empty
    var i = 0
    while (i < nNames) {
      val t0 = stream(0, TType).u8()
      if (t0 == TDup) {
        val dist = stream(0, TDup).u32le().toInt
        names(i) = names(i - 1 - dist)
        // re-derive this name's tokens so a following DIFF name deltas
        // against the duplicate, not the name before it
        if (dist != 0) prevToks = tokenize(names(i))
      } else {
        require(t0 == TDiff, s"name tokeniser: unexpected name-type $t0")
        val dist = stream(0, TDiff).u32le().toInt
        require(dist == 0 || i - 1 - dist >= 0,
          s"name tokeniser: DIFF distance $dist out of range at name $i")
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
              require(prev != null,
                s"name tokeniser: MATCH with no previous token at pos $p")
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
              require(prev != null && prev.value >= 0,
                s"name tokeniser: DELTA with no previous number at pos $p")
              val v = prev.value + stream(p, TDelta).u8()
              toks += Tok(v.toString, v)
              sb.append(v.toString)
            case TDelta0 =>
              require(prev != null && prev.value >= 0,
                s"name tokeniser: DELTA0 with no previous number at pos $p")
              val v = prev.value + stream(p, TDelta0).u8()
              val text = f"%%0${prev.text.length}d".format(v)
              toks += Tok(text, v, padded = true)
              sb.append(text)
            case other =>
              throw new IllegalArgumentException(
                s"name tokeniser: unsupported token type $other at pos $p")
          }
          p += 1
        }
        names(i) = sb.toString()
        prevToks = toks.result()
      }
      i += 1
    }

    // reassemble: '\n' after every name iff the original had a trailing
    // separator (derivable from the declared uncompressed length)
    val joined = names.mkString("\n")
    val out =
      if (joined.length + 1 == ulen) joined + "\n"
      else joined
    val bytes = out.getBytes("ASCII")
    require(bytes.length == ulen || (expectedLen >= 0 && bytes.length == expectedLen),
      s"name tokeniser: decoded ${bytes.length} bytes, header says $ulen")
    bytes
  }
}
