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
}
