package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class RansCodecSpec extends AnyFunSuite {

  private val samples: Seq[Array[Byte]] = Seq(
    "A".getBytes("ASCII"),
    "AAAAAAAAAA".getBytes("ASCII"),
    "ACGTACGTACGTACGT".getBytes("ASCII"),
    ("the quick brown fox jumps over the lazy dog " * 20).getBytes("ASCII"),
    Array.tabulate[Byte](4096)(i => (i % 251).toByte),
    { // skewed distribution with consecutive symbol runs (RLE paths)
      val rnd = new scala.util.Random(3)
      Array.fill[Byte](10000)(
        if (rnd.nextInt(10) < 7) (65 + rnd.nextInt(4)).toByte
        else rnd.nextInt(256).toByte)
    },
    Array.tabulate[Byte](4099)(i => (i * 7 % 13 + 60).toByte)) // n%4 != 0

  test("rans empty input round-trips in both orders") {
    Seq(0, 1).foreach { order =>
      val enc = RansCodec.encode(Array.empty[Byte], order)
      assert(RansCodec.decode(enc).isEmpty, s"order $order")
    }
  }

  test("unknown order byte raises IAE naming the codec") {
    // spec defines orders 0/1 only; anything else is corruption and must
    // honor the documented IAE contract, not leak an UnsupportedOperation
    val payload = Array[Byte](2, 0, 0, 0, 0, 1, 0, 0, 0)
    val e = intercept[IllegalArgumentException] { RansCodec.decode(payload) }
    assert(e.getMessage.contains("rANS"))
  }

  test("rans order-0 round-trip") {
    samples.foreach { s =>
      val enc = RansCodec.encode(s, 0)
      assert(RansCodec.decode(enc).sameElements(s),
        s"order-0 failed for len ${s.length}")
    }
  }

  test("rans order-1 round-trip") {
    samples.foreach { s =>
      val enc = RansCodec.encode(s, 1)
      assert(RansCodec.decode(enc).sameElements(s),
        s"order-1 failed for len ${s.length}")
    }
  }

  test("rans order-1 compresses context-heavy data better than order-0") {
    val s = ("ACGT" * 5000).getBytes("ASCII")
    val o0 = RansCodec.encode(s, 0).length
    val o1 = RansCodec.encode(s, 1).length
    assert(o1 < o0, s"o1=$o1 o0=$o0")
  }

  test("cram blocks declared method=4 decode through rans") {
    val payload = ("read data payload " * 50).getBytes("ASCII")
    val compressed = RansCodec.encode(payload, 1)
    val o = new java.io.ByteArrayOutputStream()
    o.write(4) // method rans4x8
    o.write(4) // content type external
    CramCodec.writeItf8(o, 77)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 77)
    assert(block.data.sameElements(payload))
  }

  test("cram blocks declared method=3 accept bare .lzma alone format") {
    // htslib emits the .xz container (covered by CramSourceSpec); the
    // bare LZMA-alone framing is the documented fallback sniff path
    val payload = ("quality string data " * 40).getBytes("ASCII")
    val b = new java.io.ByteArrayOutputStream()
    val lz = new org.tukaani.xz.LZMAOutputStream(
      b, new org.tukaani.xz.LZMA2Options(), payload.length.toLong)
    lz.write(payload); lz.close()
    val compressed = b.toByteArray
    assert(compressed(0) != 0xfd.toByte) // genuinely not the xz container
    val o = new java.io.ByteArrayOutputStream()
    o.write(3) // method lzma
    o.write(4) // content type external
    CramCodec.writeItf8(o, 78)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 78)
    assert(block.data.sameElements(payload))
  }
}
