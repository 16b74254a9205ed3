package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class RansNx16CodecSpec extends AnyFunSuite {

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("real samtools 3.1 payloads: PACK(nsym=1) + CAT quality blocks") {
    // the two ransNx16 blocks of /root/reference/fixtures/sample-ref.cram
    // (QS data series, missing quals → 0xff): flags PACK|CAT, ulen, pack
    // meta {nsym=1, map=[0xff], packed_len=0}, empty payload
    val d1 = RansNx16Codec.decode(bytes("a01c01ff00"), 28)
    assert(d1.length == 28 && d1.forall(_ == 0xff.toByte))
    val d2 = RansNx16Codec.decode(bytes("a01801ff00"), 24)
    assert(d2.length == 24 && d2.forall(_ == 0xff.toByte))
  }

  test("byte-literal order-0 stream hand-derived from the spec algorithm") {
    // data = "abababab", N=4, freqs normalized to 4096: f(a)=f(b)=2048,
    // c(a)=0, c(b)=2048. Encoding backwards from L=2^15 per state, each
    // state handles 2 symbols; x_max = ((2^15)>>12 << 16)*2048 = 2^30 is
    // never reached, so no 16-bit words are emitted:
    //   a-states: 32768 -> (16<<12)+0+0    = 65536  -> (32<<12) = 131072
    //   b-states: 32768 -> (16<<12)+0+2048 = 67584  -> (33<<12)+0+2048
    //                                                = 137216
    // Stream: flags=0, ulen=8, alphabet {a,b} as 61 62 00(run) 00(term),
    // freqs uint7(2048)=[0x90,0x00] twice, then states u32le
    // j=0..3: 131072=0x20000, 137216=0x21800, 131072, 137216.
    val o0 = bytes("00" + "08" + "6162" + "0000" + "9000" + "9000" +
      "00000200" + "00180200" + "00000200" + "00180200")
    assert(new String(RansNx16Codec.decode(o0, 8)) == "abababab")
    // same payload with the frequency table stored down-shifted to sum
    // 1024 (f=512 each, uint7=[0x84,0x00]): the decoder must scale by 4,
    // landing on the identical 2048/2048 table
    val o0shifted = bytes("00" + "08" + "6162" + "0000" + "8400" + "8400" +
      "00000200" + "00180200" + "00000200" + "00180200")
    assert(new String(RansNx16Codec.decode(o0shifted, 8)) == "abababab")
    // a table summing to 12 (not a power-of-two fraction of 4096) is
    // non-conformant: fail loudly, never silently rebuild a table
    val bad = bytes("00" + "08" + "6162" + "0000" + "03" + "09" +
      "00000200" + "00180200" + "00000200" + "00180200")
    val e = intercept[IllegalArgumentException] {
      RansNx16Codec.decode(bad, 8)
    }
    assert(e.getMessage.contains("power-of-two"))
  }

  test("byte-literal order-1 stream hand-derived from the spec algorithm") {
    // data = "abababab", N=4 slices of 2: each state decodes "ab" with
    // context chain 0 -> 'a'. Shared alphabet {0,'a','b'} (0 is the
    // initial context); 3x3 row-major freq rows:
    //   ctx 0:  [0,1,0]      (stored down-shifted: total 1, scaled x4096)
    //   ctx 'a':[0,0,4096]   (stored exact; uint7(4096)=[0xA0,0x00])
    //   ctx 'b':[0,0,0]      (never a context: all-zero row stays unused)
    // With a single 4096-frequency symbol per row, each encode step maps
    // L=32768 -> (8<<12)+0+0 = 32768, so all 4 states are 32768.
    // comp byte 0xC0 = shift 12, tables raw. Alphabet bytes: 00 61 62
    // 00(run after consecutive 61->62) 00(terminator).
    val o1 = bytes("01" + "08" + "c0" + "00616200" + "00" +
      "000100" + "0000a000" + "000000" +
      "00800000" + "00800000" + "00800000" + "00800000")
    assert(new String(RansNx16Codec.decode(o1, 8)) == "abababab")
  }

  test("order-0 round-trip, 4 and 32 states") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(4, 32); len <- Seq(32, 100, 4096, 65537)) {
      val data = Array.fill(len)((rnd.nextInt(20) + 60).toByte)
      val enc = RansNx16Codec.encode(data, n)
      if (len >= 4096)
        assert(enc.length < data.length, s"n=$n len=$len should compress")
      val dec = RansNx16Codec.decode(enc, data.length)
      assert(dec.sameElements(data), s"n=$n len=$len")
    }
  }

  test("single-symbol and tiny payloads take PACK/CAT paths") {
    val uniform = Array.fill(1000)('I'.toByte)
    val encU = RansNx16Codec.encode(uniform)
    assert(encU.length <= 6) // flags + ulen(2) + nsym + sym + packed_len
    assert(RansNx16Codec.decode(encU, 1000).sameElements(uniform))
    val tiny = "ACGT".getBytes
    val encT = RansNx16Codec.encode(tiny)
    assert(RansNx16Codec.decode(encT, 4).sameElements(tiny))
    val empty = RansNx16Codec.encode(Array.empty[Byte])
    assert(RansNx16Codec.decode(empty, 0).isEmpty)
  }

  test("hand-built PACK 2/4/16-symbol streams expand correctly") {
    // nsym=2: 1 bit/val, low bits first. packed byte 0b00000110 → A,B,B,A...
    // stream: flags=PACK|CAT(0xa0), ulen=8, nsym=2, map=[65,66],
    // packed_len=1, payload=0x06
    val p2 = RansNx16Codec.decode(bytes("a00802414201" + "06"), 8)
    assert(new String(p2) == "ABBAAAAA")
    // nsym=4: 2 bits/val: 0b11100100 → 0,1,2,3
    val p4 = RansNx16Codec.decode(bytes("a004044142434401" + "e4"), 4)
    assert(new String(p4) == "ABCD")
    // nsym=16: 4 bits/val: 0x21 → 1,2
    val p16 = RansNx16Codec.decode(
      bytes("a0021041424344454647484950515253545556" + "01" + "21"), 2)
    assert(new String(p16) == "BC")
  }

  test("hand-built RLE stream expands runs") {
    // flags=RLE|CAT(0x60), ulen=10; meta (raw, bit0 set): one runnable
    // symbol 'A'; entropy stream "AB" with run meta [8] → A×9 B
    // meta bytes: n=1, sym=65, runs=[8] → meta len 3 → metaLen=(3<<1)|1=7
    val stream = bytes("600a" + "07" + "02" + "014108" + "4142")
    val out = RansNx16Codec.decode(stream, 10)
    assert(new String(out) == "AAAAAAAAAB")
  }

  test("hand-built STRIPE stream interleaves sub-streams") {
    // flags=STRIPE(0x08), ulen=6, n=2, clens, two CAT sub-streams
    // sub0 = "ACE" (flags CAT|NOSZ=0x30, payload ACE) len 4
    // sub1 = "BDF" likewise
    val sub = "30"
    val stream = bytes("0806" + "02" + "0404" +
      sub + "414345" + sub + "424446")
    val out = RansNx16Codec.decode(stream, 6)
    assert(new String(out) == "ABCDEF")
  }

  test("truncated entropy bytes raise IAE, never silent garbage") {
    // chopping the tail of the renorm byte stream must surface as the
    // documented IllegalArgumentException — a skipped state reload would
    // instead return ulen bytes of wrong data
    // high-entropy data encodes as CAT: take() must throw, not zero-pad
    val flat = Array.tabulate[Byte](4096)(i => ((i * 131 + i / 7) % 256).toByte)
    // skewed data wins the order-0 entropy path: a renorm with no bytes
    // left must throw, not decode on with an under-filled state
    val skewed = Array.tabulate[Byte](4096)(i =>
      if (i % 11 == 0) ((i * 53) % 256).toByte else 'A'.toByte)
    for (data <- Seq(flat, skewed)) {
      val enc = RansNx16Codec.encode(data)
      assert(RansNx16Codec.decode(enc, data.length).sameElements(data))
      val e = intercept[IllegalArgumentException] {
        RansNx16Codec.decode(java.util.Arrays.copyOf(enc, enc.length - 8),
          data.length)
      }
      assert(e.getMessage.contains("ransNx16"))
    }
  }

  test("cram blocks with method=5 decode through ransNx16") {
    val rnd = new scala.util.Random(5)
    val payload = Array.fill[Byte](500)((33 + rnd.nextInt(40)).toByte)
    val enc = RansNx16Codec.encode(payload)
    val o = new java.io.ByteArrayOutputStream()
    o.write(5) // method ransNx16
    o.write(4) // content type external
    CramCodec.writeItf8(o, 12)
    CramCodec.writeItf8(o, enc.length)
    CramCodec.writeItf8(o, payload.length)
    o.write(enc)
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray)) // crc
    val block = CramCodec.readBlock(
      new java.io.ByteArrayInputStream(o.toByteArray))
    assert(block.contentId == 12)
    assert(block.data.sameElements(payload))
    // a flipped payload byte in a CONSUMED block must fail the CRC check
    // (skipped blocks are exempt — CramSourceSpec pins that side)
    val corrupt = o.toByteArray.clone()
    corrupt(10) = (corrupt(10) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] {
      CramCodec.readBlock(new java.io.ByteArrayInputStream(corrupt))
    }
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("3.1 codec methods dispatch; corrupt payloads raise typed errors") {
    // methods 6/7/8 are implemented: a garbage 2-byte payload must
    // reach the real decoder and come back as IllegalArgumentException
    // naming the codec — never a bare ArrayIndexOutOfBoundsException
    for ((id, name) <- Seq(6 -> "adaptive arithmetic", 7 -> "fqzcomp",
        8 -> "name tokeniser")) {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id); o.write(4)
      CramCodec.writeItf8(o, 1)
      CramCodec.writeItf8(o, 2)
      CramCodec.writeItf8(o, 10)
      o.write(Array[Byte](1, 2))
      o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray))
      val e = intercept[IllegalArgumentException] {
        CramCodec.readBlock(new java.io.ByteArrayInputStream(o.toByteArray))
      }
      assert(e.getMessage.contains(name), s"method $id: ${e.getMessage}")
    }
    // method 2 (bzip2) goes through commons-compress, which reports
    // garbage as an IOException
    val o = new java.io.ByteArrayOutputStream()
    o.write(2); o.write(4)
    CramCodec.writeItf8(o, 1)
    CramCodec.writeItf8(o, 2)
    CramCodec.writeItf8(o, 10)
    o.write(Array[Byte](1, 2))
    o.write(graft.fixtures.CramFixture.crc32le(o.toByteArray))
    intercept[java.io.IOException] {
      CramCodec.readBlock(new java.io.ByteArrayInputStream(o.toByteArray))
    }
    // a genuinely unknown method id still names the supported set
    val u = new java.io.ByteArrayOutputStream()
    u.write(9); u.write(4)
    CramCodec.writeItf8(u, 1)
    CramCodec.writeItf8(u, 2)
    CramCodec.writeItf8(u, 10)
    u.write(Array[Byte](1, 2))
    u.write(graft.fixtures.CramFixture.crc32le(u.toByteArray))
    val e = intercept[UnsupportedOperationException] {
      CramCodec.readBlock(new java.io.ByteArrayInputStream(u.toByteArray))
    }
    assert(e.getMessage.contains("unknown id"))
  }
}
