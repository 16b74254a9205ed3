package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class NameTokCodecSpec extends AnyFunSuite {

  private def roundTrip(names: Seq[String], useArith: Boolean = false,
      trailing: Boolean = true): Unit = {
    val raw = (names.mkString("\n") + (if (trailing) "\n" else ""))
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

  test("delta chains: monotone counters use 1-byte deltas") {
    val names = (0 until 1000).map(i => s"q${100000 + i}")
    val raw = (names.mkString("\n") + "\n").getBytes("ASCII")
    val enc = NameTokCodec.encode(raw)
    // the whole counter column should collapse into a tiny delta stream:
    // 1000 names x 7+ bytes raw, well under 200 bytes once tokenised
    assert(enc.length < 200,
      s"expected sub-200-byte encoding of delta chain, got ${enc.length}")
    assert(NameTokCodec.decode(enc, raw.length).sameElements(raw))
  }

  test("cram blocks declared method=8 decode through the tokeniser") {
    val names = (0 until 50).map(i => s"inst:1:$i").mkString("", "\n", "\n")
    val payload = names.getBytes("ASCII")
    val compressed = NameTokCodec.encode(payload)
    val o = new java.io.ByteArrayOutputStream()
    o.write(8) // method name-tokeniser
    o.write(4) // content type external
    CramCodec.writeItf8(o, 92)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(Array.fill[Byte](4)(0)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 92)
    assert(block.data.sameElements(payload))
  }
}
