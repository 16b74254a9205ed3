package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class ArithCodecSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes("ASCII")

  private val samples: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.empty[Byte],
    "single" -> Array[Byte](42),
    "ascii text" -> bytes("the quick brown fox jumps over the lazy dog " * 20),
    "skewed" -> Array.tabulate[Byte](4000)(i =>
      if (i % 17 == 0) 'G'.toByte else 'A'.toByte),
    "runs" -> bytes("AAAAAAAAAABBBBBBBBBBBBBBBBBBBBBBBBBBBBBBCCCCCCCCCD" * 30),
    "long run" -> Array.fill[Byte](3000)('Q'.toByte), // 255-chunk chains
    "all bytes" -> Array.tabulate[Byte](2048)(i => (i * 131 % 256).toByte),
    "quality-like" -> Array.tabulate[Byte](5000)(i =>
      (33 + (i * 7 + i / 100) % 40).toByte))

  test("order-0 round-trip") {
    samples.foreach { case (name, data) =>
      val enc = ArithCodec.encode(data, 0)
      assert(ArithCodec.decode(enc, data.length).sameElements(data), name)
    }
  }

  test("order-1 round-trip") {
    samples.foreach { case (name, data) =>
      val enc = ArithCodec.encode(data, 1)
      assert(ArithCodec.decode(enc, data.length).sameElements(data), name)
    }
  }

  test("RLE round-trip, both orders") {
    samples.foreach { case (name, data) =>
      val enc0 = ArithCodec.encode(data, 0x40)
      assert(ArithCodec.decode(enc0, data.length).sameElements(data),
        s"$name o0")
      val enc1 = ArithCodec.encode(data, 0x41)
      assert(ArithCodec.decode(enc1, data.length).sameElements(data),
        s"$name o1")
    }
  }

  test("PACK round-trip (small alphabets)") {
    val acgt = Array.tabulate[Byte](6000)(i => "ACGT" ((i * 7) % 4).toByte)
    val enc = ArithCodec.encode(acgt, 0x80)
    assert(ArithCodec.decode(enc, acgt.length).sameElements(acgt))
    val binary = Array.tabulate[Byte](999)(i => if (i % 3 == 0) 1 else 0)
    val encB = ArithCodec.encode(binary, 0x80 | 0x01)
    assert(ArithCodec.decode(encB, binary.length).sameElements(binary))
  }

  test("CAT, EXT (bzip2) and STRIPE round-trip") {
    val data = bytes("stripe me four ways, please and thank you! " * 40)
    Seq(0x20, 0x04, 0x08, 0x08 | 0x01).foreach { flags =>
      val enc = ArithCodec.encode(data, flags)
      assert(ArithCodec.decode(enc, data.length).sameElements(data),
        s"flags=0x${flags.toHexString}")
    }
  }

  test("EXT+PACK: spec byte layout, hand-assembled (not round-trip)") {
    // flags 0x84 = EXT | PACK. Spec ordering: [flags][ulen][nsym][map]
    // [packed-len][bzip2 of packed bytes] — the pack metadata precedes
    // the external payload, and unpack applies AFTER decompression. A
    // round-trip can't prove this (a mirrored encode/decode bug cancels),
    // so assemble the stream by hand from the spec layout.
    val packed = Array[Byte](0xf0.toByte) // 8×1-bit: AAAA then BBBB
    val bz = {
      val b = new java.io.ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(b)
      z.write(packed); z.close()
      b.toByteArray
    }
    val stream = Array[Byte](0x84.toByte, 8, 2, 'A', 'B', 1) ++ bz
    assert(ArithCodec.decode(stream, 8).sameElements(bytes("AAAABBBB")))
    // and the encoder emits that same layout: pack meta before bzip2 magic
    val enc = ArithCodec.encode(bytes("AAAABBBB"), 0x84)
    assert(enc(0) == 0x84.toByte && enc(1) == 8 && enc(2) == 2 &&
      enc(3) == 'A' && enc(4) == 'B' && enc(5) == 1 &&
      enc(6) == 'B' && enc(7) == 'Z' && enc(8) == 'h') // bzip2 magic "BZh"
    assert(ArithCodec.decode(enc, 8).sameElements(bytes("AAAABBBB")))
  }

  test("decode rejects truncated streams") {
    val enc = ArithCodec.encode(bytes("some content to trim"), 0)
    intercept[Exception] {
      // chop mid-metadata so even the zero-padded renorm path can't hide it
      ArithCodec.decode(java.util.Arrays.copyOf(enc, 1), 20)
    }
  }

  // ------------------------------------------------- byte-literal fixtures
  //
  // Hand-derived from the spec's range-coder arithmetic (not produced by
  // this encoder): one symbol coded against a STATIC uniform 256-symbol
  // distribution, i.e. a single RC_Encode(cum=0xAB, freq=1, tot=256).
  //
  // Encoder trace (low 64-bit, range 32-bit, TOP = 2^24):
  //   start        low=0            range=0xFFFFFFFF  cache=0 pending=1
  //   encode       range /= 256         -> 0x00FFFFFF
  //                low += 0xAB*0xFFFFFF -> 0xAAFFFF55
  //                range *= 1           -> 0x00FFFFFF < TOP: renorm
  //     shiftLow   low<0xFF000000, no carry -> emit cache+0 = 0x00,
  //                cache=0xAA (low>>24), low=(low<<8)&2^32-1 = 0xFFFF5500
  //   finish (5x shiftLow)
  //     #1  low=0xFFFF5500 >= 0xFF000000, no carry: defer (pending=2),
  //         low=0xFF550000
  //     #2  low=0xFF550000 >= 0xFF000000: defer (pending=3), low=0x55000000
  //     #3  low=0x55000000 < 0xFF000000: emit cache 0xAA then the two
  //         deferred 0xFF bytes; cache=0x55, low=0
  //     #4  emit 0x55; cache=0, low=0
  //     #5  emit 0x00
  //   output: 00 AA FF FF 55 00
  //
  // Decoder trace: prime 5 bytes -> code=0xAAFFFF55 (leading 00 falls off
  // the 32-bit window). GetFreq(256): range=0x00FFFFFF,
  // code/range = 0xAB (exactly, as 0xAB*0xFFFFFF = 0xAAFFFF55).
  // Decode(cum=0xAB, freq=1): code -= 0xAB*range -> 0; renorm pulls the
  // trailing 00.
  test("range coder decodes a hand-derived single-symbol stream") {
    val in = Array[Byte](0x00, 0xAA.toByte, 0xFF.toByte, 0xFF.toByte,
      0x55, 0x00)
    // decode via the package-private coder pieces
    val rc = new ArithCodec.RangeDecoder(new ArithCodec.In(in))
    val f = rc.getFreq(256)
    assert(f == 0xAB)
    rc.decode(0xAB, 1)
    // and the encoder reproduces the byte-identical stream
    val buf = new java.io.ByteArrayOutputStream()
    val enc = new ArithCodec.RangeEncoder(buf)
    enc.encode(0xAB, 1, 256)
    enc.finish()
    assert(buf.toByteArray.sameElements(in))
  }

  // A carry case: cum/tot chosen so the second symbol's low-addition
  // overflows bit 32 and must propagate through the cached byte.
  //   encode #1: cum=0xFE, freq=1, tot=256:
  //     range=0x00FFFFFF, low=0xFE*0xFFFFFF=0xFDFFFF02, renorm:
  //     shiftLow emits cache 0x00, cache=0xFD, low=0xFFFF0200,
  //     range=0xFFFFFF00
  //   encode #2: cum=0xFF, freq=1, tot=256:
  //     range=0x00FFFFFF, low += 0xFF*0xFFFFFF (=0xFEFFFF01)
  //       -> 0x1_FEFF_0101 (carry into bit 32!)
  //     renorm shiftLow: low mod 2^32 = 0xFEFF0101 < 0xFF000000 and
  //       carry set -> emit cache+1 = 0xFD+1 = 0xFE; cache=(low>>24)&0xFF
  //       = 0xFE; low=0xFF010100
  //   finish (5x shiftLow):
  //     #1 low=0xFF010100 >= 0xFF000000, no carry: defer (pending=2),
  //        low=0x01010000
  //     #2 low < 0xFF000000: emit cache 0xFE + one deferred 0xFF;
  //        cache=0x01, low=0x01000000
  //     #3 emit 0x01; cache=0x01, low=0
  //     #4 emit 0x01; cache=0x00
  //     #5 emit 0x00
  //   output: 00 FE FE FF 01 01 00
  //
  // Decoder: code=0xFEFEFF01. GetFreq(256) -> 0xFE (0xFE*0xFFFFFF =
  // 0xFDFFFF02 <= code < 0xFF*0xFFFFFF). Decode leaves 0x00FEFFFF,
  // renorm pulls 0x01 -> code=0xFEFFFF01; GetFreq -> exactly 0xFF.
  test("range coder carry propagates through the cached byte") {
    val expected = Array[Byte](0x00, 0xFE.toByte, 0xFE.toByte, 0xFF.toByte,
      0x01, 0x01, 0x00)
    val buf = new java.io.ByteArrayOutputStream()
    val enc = new ArithCodec.RangeEncoder(buf)
    enc.encode(0xFE, 1, 256)
    enc.encode(0xFF, 1, 256)
    enc.finish()
    val out = buf.toByteArray
    assert(out.sameElements(expected),
      out.map(b => f"${b & 0xff}%02x").mkString(" "))
    // decode the byte-literal stream (derivation above, not the encoder)
    val rc = new ArithCodec.RangeDecoder(new ArithCodec.In(expected))
    assert(rc.getFreq(256) == 0xFE)
    rc.decode(0xFE, 1)
    assert(rc.getFreq(256) == 0xFF)
    rc.decode(0xFF, 1)
  }

  test("adaptive model: frequency bump, transposition and renormalization") {
    // encode a run of one symbol then verify the decoder model tracks the
    // identical state by decoding the full stream (divergence would break
    // the round-trip at the first renormalization, len >> 2^16/16 bumps)
    val data = Array.fill[Byte](9000)(7) ++ Array.fill[Byte](9000)(3)
    val enc = ArithCodec.encode(data, 0)
    assert(ArithCodec.decode(enc, data.length).sameElements(data))
  }

  test("cram blocks declared method=6 decode through arith") {
    val payload = ("alignment qualities " * 60).getBytes("ASCII")
    val compressed = ArithCodec.encode(payload, 1)
    val o = new java.io.ByteArrayOutputStream()
    o.write(6) // method arith
    o.write(4) // content type external
    CramCodec.writeItf8(o, 91)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 91)
    assert(block.data.sameElements(payload))
  }
}
