package graft.formats

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trips for the CRAM 3.1 entropy codecs: randomized
  * corpora beyond the hand-picked shapes in the per-codec specs. Each
  * property runs a few hundred cases with scalacheck's default sizes;
  * failures shrink to minimal counterexamples. */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, s"$name: $res")
  }

  private val byteArrays: Gen[Array[Byte]] = Gen.oneOf(
    // skewed/low-cardinality shapes exercise PACK/RLE paths
    Gen.listOf(Gen.oneOf[Byte](0.toByte, 1.toByte)).map(_.toArray),
    Gen.listOf(Gen.oneOf[Byte](65.toByte, 66.toByte, 67.toByte, 68.toByte)).map(_.toArray),
    Gen.listOf(Gen.chooseNum[Byte](Byte.MinValue, Byte.MaxValue))
      .map(_.toArray),
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.const(Array.fill[Byte](n)(42))))

  test("ransNx16 encode/decode round-trips arbitrary byte arrays") {
    check("ransNx16", Prop.forAll(byteArrays) { data =>
      RansNx16Codec.decode(RansNx16Codec.encode(data), data.length)
        .sameElements(data)
    })
  }

  test("arith encode/decode round-trips arbitrary byte arrays, all modes") {
    // PACK requires <= 16 distinct symbols, so it gets its own
    // low-cardinality property below
    val flagsGen = Gen.oneOf(0, 1, 0x40, 0x41, 0x20)
    check("arith", Prop.forAll(byteArrays, flagsGen) { (data, flags) =>
      ArithCodec.decode(ArithCodec.encode(data, flags), data.length)
        .sameElements(data)
    })
    val lowCard = Gen.listOf(
      Gen.oneOf[Byte](65.toByte, 66.toByte, 67.toByte, 68.toByte))
      .map(_.toArray)
    check("arith-pack", Prop.forAll(lowCard) { data =>
      ArithCodec.decode(ArithCodec.encode(data, 0x80), data.length)
        .sameElements(data)
    })
  }

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(':', '.', '/', '#', '-', '_', '*')))
  } yield cs.mkString

  test("name tokeniser round-trips random printable name corpora") {
    val corpus = Gen.listOf(nameGen)
    check("nameTok", Prop.forAll(corpus, Gen.oneOf(true, false)) {
      (names, arith) =>
        val raw = names.map(_ + "\u0000").mkString.getBytes("ASCII")
        NameTokCodec.decode(NameTokCodec.encode(raw, arith), raw.length)
          .sameElements(raw)
    })
  }

  test("fqzcomp round-trips random quality blocks with random lengths") {
    val gen = for {
      lens <- Gen.nonEmptyListOf(Gen.chooseNum(1, 40))
      nSym <- Gen.chooseNum(1, 8)
      quals <- Gen.listOfN(lens.sum,
        Gen.chooseNum(0, nSym - 1).map(q => (33 + q).toByte))
    } yield (quals.toArray, lens)
    check("fqz", Prop.forAll(gen) { case (data, lens) =>
      FqzCodec.decode(FqzCodec.encode(data, lens), data.length)
        .sameElements(data)
    })
  }

  test("normalize picks the remainder carrier from raw counts") {
    // skewed histogram where a mid-frequency symbol's RAW count exceeds
    // the DOMINANT symbol's already-normalized frequency: the old code
    // flipped maxSym mid-loop and drove its slot negative
    val data = new Array[Byte](1048576)
    var i = 0
    while (i < 1044122) { data(i) = 0; i += 1 }
    while (i < 1044122 + 4200) { data(i) = 1; i += 1 }
    var s = 2
    while (i < data.length && s < 256) { data(i) = s.toByte; s += 1; i += 1 }
    val dec = RansNx16Codec.decode(RansNx16Codec.encode(data), data.length)
    assert(dec.sameElements(data))
  }

  test("fqzcomp round-trips a full 256-symbol quality alphabet") {
    // max_sym is a single byte: 256 symbols must use the 0-means-256
    // convention on both sides
    val data = Array.tabulate[Byte](512)(i => (i % 256).toByte)
    val dec = FqzCodec.decode(FqzCodec.encode(data, Seq(256, 256)), 512)
    assert(dec.sameElements(data))
  }

  test("name tokeniser round-trips bytes above 0x7f losslessly") {
    // ISO-8859-1, not ASCII: 0x80-0xff must not collapse to '?'
    val raw = Array[Byte](0x41, 0x80.toByte, 0xff.toByte, 0x41, 0) ++
      Array[Byte](0xe9.toByte, 0x31, 0)
    val dec = NameTokCodec.decode(NameTokCodec.encode(raw), raw.length)
    assert(dec.sameElements(raw),
      dec.map(b => f"$b%02x").mkString(","))
  }

  test("rans 4x8 decode reports truncated payloads with a typed error") {
    val enc = RansCodec.encode(
      Array.tabulate[Byte](500)(i => (i % 7).toByte), 1)
    val e = intercept[IllegalArgumentException] {
      RansCodec.decode(enc.take(enc.length / 2))
    }
    assert(e.getMessage.contains("rANS 4x8"))
  }

  test("bgzf writeBlock refuses payloads whose block overflows BSIZE") {
    // incompressible payloads near 64 KiB deflate LARGER than the
    // input; the u16 BSIZE field would silently wrap
    val rnd = new scala.util.Random(3)
    val incompressible = Array.fill[Byte](65536)(rnd.nextInt().toByte)
    val e = intercept[IllegalArgumentException] {
      Bgzf.writeBlock(incompressible)
    }
    assert(e.getMessage.contains("BSIZE"))
    // a compressible payload of the same size still writes + reads back
    val compressible = Array.fill[Byte](65536)(7)
    val block = Bgzf.writeBlock(compressible)
    val f = java.nio.file.Files.createTempFile("graft-bgzf", ".gz")
    java.nio.file.Files.write(f, block)
    val in = SeekableInputs.forLocal(f.toString)
    try {
      val back = Bgzf.readBlock(in, 0L).get
      assert(back.data.sameElements(compressible))
    } finally in.close()
  }

  test("autosql parse skips parentheses inside the table description") {
    val asql = "table t\n\"coverage (percent) of (things)\"\n(\n" +
      "string chrom; \"c\"\nuint score; \"s\"\n)\n"
    val t = AutoSql.parse(asql)
    assert(t.description == "coverage (percent) of (things)")
    assert(t.fields.map(_.name) == Seq("chrom", "score"))
  }

  test("fqzcomp table framing round-trips monotone tables incl. 255 runs") {
    // exercises writeArray/readArray through full encode/decode with a
    // qual alphabet of one symbol repeated n times: ptab runs hit exact
    // 255-chunk boundaries for lens near 255/510
    for (n <- Seq(254, 255, 256, 510, 511)) {
      val data = Array.fill[Byte](n)(40)
      val dec = FqzCodec.decode(FqzCodec.encode(data, Seq(n)), n)
      assert(dec.sameElements(data), s"n=$n")
    }
  }

  test("ByteCursor inline ITF8 decode matches the stream decoder") {
    // the cursor's allocation-free inline form must agree with the
    // canonical stream readItf8 on every prefix width and on packed
    // back-to-back values
    check("itf8Inline", Prop.forAll(
      org.scalacheck.Gen.listOfN(8,
        org.scalacheck.Gen.chooseNum(Int.MinValue, Int.MaxValue))) { vs =>
      val bo = new java.io.ByteArrayOutputStream()
      vs.foreach(v => CramCodec.writeItf8(bo, v))
      val bytes = bo.toByteArray
      val cur = new CramCodec.ByteCursor(bytes)
      val sin = new java.io.ByteArrayInputStream(bytes)
      vs.forall { _ =>
        cur.readItf8Value() == CramCodec.readItf8(sin)
      } && cur.pos == bytes.length
    })
  }
}
