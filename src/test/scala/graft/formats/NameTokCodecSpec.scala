package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class NameTokCodecSpec extends AnyFunSuite {

  /** Byte-exact round trip over the codec's native NUL-separated shape
    * (the CRAM RN convention: BYTE_ARRAY_STOP with stop 0). */
  private def roundTrip(names: Seq[String], useArith: Boolean = false,
      trailing: Boolean = true): Unit = {
    val raw = (names.mkString("\u0000") + (if (trailing) "\u0000" else ""))
      .getBytes("ASCII")
    val enc = NameTokCodec.encode(raw, useArith)
    val dec = NameTokCodec.decode(enc, raw.length)
    assert(new String(dec, "ASCII") == new String(raw, "ASCII"))
  }

  test("illumina-style names: instrument prefix + stepping coordinates") {
    val names = (0 until 500).map(i =>
      s"M00123:45:000000000-ABCDE:1:1101:${15000 + i * 3}:${1000 + i}")
    roundTrip(names)
    roundTrip(names, useArith = true)
  }

  test("SRA-style names with /1 /2 suffixes and zero-padded counters") {
    val names = (1 to 300).flatMap(i =>
      Seq(f"SRR000001.$i%06d/1", f"SRR000001.$i%06d/2"))
    roundTrip(names)
    roundTrip(names, useArith = true)
  }

  test("pacbio-style movie/zmw/range names") {
    val names = (0 until 200).map(i =>
      s"m54238_180901_011437/${4325376 + i * 7}/${i * 100}_${i * 100 + 999}")
    roundTrip(names)
  }

  test("name-sorted duplicates (paired reads, DUP tokens)") {
    val names = (0 until 100).flatMap(i =>
      Seq(s"read_$i", s"read_$i")) // exact adjacent duplicates
    roundTrip(names)
    roundTrip(names, useArith = true)
  }

  test("irregular corpus: mixed shapes, empty names, non-alnum runs") {
    val names = Seq("a", "", "chr1:1,000-2,000", "x" * 300,
      "123", "0012", "0013", "name-with-dash.and.dots_9",
      "##weird##", "A1B2C3", "9999999999999999999", // > uint32: splits
      "trailing0")
    roundTrip(names)
    roundTrip(names, useArith = true)
    roundTrip(names, trailing = false)
  }

  test("single name and empty block") {
    roundTrip(Seq("only_one.name/1"))
    val empty = NameTokCodec.encode(Array.empty[Byte])
    assert(NameTokCodec.decode(empty, 0).isEmpty)
  }

  test("newline-separated input decodes to NUL-separated names") {
    // htscodecs convention: the encoder accepts \n or NUL terminators,
    // the decoder always regenerates NUL separators
    val names = (0 until 20).map(i => s"rd:$i")
    val nl = (names.mkString("\n") + "\n").getBytes("ASCII")
    val dec = NameTokCodec.decode(NameTokCodec.encode(nl), nl.length)
    assert(new String(dec, "ASCII") ==
      names.mkString("\u0000") + "\u0000")
  }

  test("delta chains: monotone counters use 1-byte deltas") {
    val names = (0 until 1000).map(i => s"q${100000 + i}")
    val raw = (names.mkString("\u0000") + "\u0000").getBytes("ASCII")
    val enc = NameTokCodec.encode(raw)
    // the whole counter column should collapse into a tiny delta stream:
    // 1000 names x 7+ bytes raw, well under 200 bytes once tokenised
    assert(enc.length < 200,
      s"expected sub-200-byte encoding of delta chain, got ${enc.length}")
    assert(NameTokCodec.decode(enc, raw.length).sameElements(raw))
  }

  test("fixed 9-byte header: uint32-LE ulen, uint32-LE nnames, use_arith") {
    val raw = "abc\u0000de\u0000".getBytes("ASCII")
    val enc = NameTokCodec.encode(raw, useArith = true)
    def u32(off: Int): Long =
      (enc(off) & 0xffL) | ((enc(off + 1) & 0xffL) << 8) |
        ((enc(off + 2) & 0xffL) << 16) | ((enc(off + 3) & 0xffL) << 24)
    assert(u32(0) == raw.length)
    assert(u32(4) == 2)
    assert(enc(8) == 1)
  }

  test("identical token streams are emitted once via 0x40 dup descriptors") {
    // names shaped x:<i>:<i> give byte-identical streams at positions
    // 2/4 (colon TYPE+CHAR) and 3/5 (digit TYPE+DELTA), which must
    // serialize as 3-byte dup descriptors, not repeated compressed
    // copies; the round trip exercises the decode side of 0x40
    val names = (0 until 300).map(i => s"x:$i:$i")
    val raw = (names.mkString("\u0000") + "\u0000").getBytes("ASCII")
    val enc = NameTokCodec.encode(raw)
    assert(NameTokCodec.decode(enc, raw.length).sameElements(raw))
    // walk the serialized stream descriptors counting 0x40 flags
    var pos = 9 // fixed header
    var dups = 0
    def uint7(): Int = {
      var v = 0; var c = 0
      do { c = enc(pos) & 0xff; pos += 1; v = (v << 7) | (c & 0x7f) }
      while ((c & 0x80) != 0)
      v
    }
    while (pos < enc.length) {
      val desc = enc(pos) & 0xff; pos += 1
      if ((desc & 0x40) != 0) { dups += 1; pos += 2 }
      else { val clen = uint7(); pos += clen }
    }
    assert(dups >= 2, s"expected >=2 dup-stream descriptors, found $dups")
  }

  test("cram blocks declared method=8 decode through the tokeniser") {
    val names = (0 until 50).map(i => s"inst:1:$i")
      .mkString("", "\u0000", "\u0000")
    val payload = names.getBytes("ASCII")
    val compressed = NameTokCodec.encode(payload)
    val o = new java.io.ByteArrayOutputStream()
    o.write(8) // method name-tokeniser
    o.write(4) // content type external
    CramCodec.writeItf8(o, 92)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 92)
    assert(block.data.sameElements(payload))
  }

  test("truncated and corrupt payloads raise typed errors naming the codec") {
    val raw = (Seq("r1", "r2").mkString("\u0000") + "\u0000").getBytes("ASCII")
    val enc = NameTokCodec.encode(raw)
    // truncated header
    val e1 = intercept[IllegalArgumentException] {
      NameTokCodec.decode(enc.take(5), raw.length)
    }
    assert(e1.getMessage.contains("name tokeniser"))
    // truncated body (cut inside a stream payload)
    val e2 = intercept[IllegalArgumentException] {
      NameTokCodec.decode(enc.take(enc.length - 3), raw.length)
    }
    assert(e2.getMessage.contains("name tokeniser") ||
      e2.getMessage.contains("rans"))
    // garbage bytes
    val e3 = intercept[IllegalArgumentException] {
      NameTokCodec.decode(Array[Byte](1, 2), 10)
    }
    assert(e3.getMessage.contains("name tokeniser"))
  }
}
