package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class FqzCodecSpec extends AnyFunSuite {

  private def roundTrip(records: Seq[Array[Byte]]): Int = {
    val data = records.flatten.toArray
    val enc = FqzCodec.encode(data, records.map(_.length))
    val dec = FqzCodec.decode(enc, data.length)
    assert(dec.sameElements(data))
    enc.length
  }

  private val rng = new scala.util.Random(7)

  test("plateau qualities (typical illumina: high with dips)") {
    val records = (0 until 400).map { _ =>
      Array.tabulate[Byte](100) { i =>
        val base = if (i > 80) 30 else 37
        (base + (if (rng.nextInt(20) == 0) -15 else rng.nextInt(3))).toByte
      }
    }
    val clen = roundTrip(records)
    // 40k bytes of ~2-bit-entropy data must compress well below half
    assert(clen < 20000, s"fqzcomp produced $clen bytes for 40000 raw")
  }

  test("ramped qualities exercise the position context") {
    val records = (0 until 300).map { r =>
      Array.tabulate[Byte](60 + r % 40)(i => (40 - i / 3).toByte)
    }
    val clen = roundTrip(records)
    assert(clen < 4000, s"position-predictable ramp stayed at $clen bytes")
  }

  test("binned qualities (novaseq: 4-symbol alphabet via qmap)") {
    val bins = Array[Byte](2, 12, 23, 37)
    val records = (0 until 500).map { _ =>
      Array.tabulate[Byte](150)(i => bins((i / 25 + rng.nextInt(2)) % 4))
    }
    roundTrip(records)
  }

  test("duplicate records collapse through the dedup flag") {
    val one = Array.tabulate[Byte](120)(i => (33 + (i * 13) % 40).toByte)
    val records = Seq.fill(200)(one)
    val clen = roundTrip(records)
    // one real record + 199 dup flags: must be a fraction of one record
    assert(clen < 600, s"dedup-heavy block stayed at $clen bytes")
  }

  test("variable lengths, single-byte records, alphabet edges") {
    val records = Seq(
      Array[Byte](0),
      Array.fill[Byte](1)(93),
      Array.tabulate[Byte](17)(i => (i * 5 % 94).toByte),
      Array.fill[Byte](1024)(40),
      Array.tabulate[Byte](255)(i => (rng.nextInt(94)).toByte))
    roundTrip(records)
  }

  test("random incompressible qualities still round-trip") {
    val records = (0 until 50).map(_ =>
      Array.tabulate[Byte](80)(_ => rng.nextInt(64).toByte))
    roundTrip(records)
  }

  test("decode rejects truncated and version-mismatched streams") {
    val data = Array.fill[Byte](100)(35)
    val enc = FqzCodec.encode(data, Seq(100))
    intercept[Exception] {
      FqzCodec.decode(java.util.Arrays.copyOf(enc, 3), 100)
    }
    val wrongVers = enc.clone(); wrongVers(0) = 4
    intercept[Exception] { FqzCodec.decode(wrongVers, 100) }
    // multi-param header claiming 0 parameter sets: IAE, not a bare
    // UnsupportedOperationException from empty.max
    val e = intercept[IllegalArgumentException] {
      FqzCodec.decode(Array[Byte](5, 1, 0), 10)
    }
    assert(e.getMessage.contains("fqzcomp"))
  }

  test("cram blocks declared method=7 decode through fqzcomp") {
    val payload = (0 until 30).flatMap(_ =>
      Array.tabulate[Byte](90)(i => (35 + i % 5).toByte)).toArray
    val compressed = FqzCodec.encode(payload, Seq.fill(30)(90))
    val o = new java.io.ByteArrayOutputStream()
    o.write(7) // method fqzcomp
    o.write(4) // content type external
    CramCodec.writeItf8(o, 93)
    CramCodec.writeItf8(o, compressed.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(compressed)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 93)
    assert(block.data.sameElements(payload))
  }
}
