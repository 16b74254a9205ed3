package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.MediaDecoder

/** Property-based round-trips for the REAL media decode paths
  * (ImageIO pixels, WAV PCM samples): randomized shapes beyond the
  * hand-picked cases in PipelineOpsSpec, pinning the closed-form
  * exactness contracts the q56/q57 oracles rely on. */
class MediaPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, s"$name: $res")
  }

  test("two-tone png decode recovers exact mean luminance at any size") {
    val gen = for {
      w <- Gen.chooseNum(1, 24).map(_ * 2) // even: exact halves
      h <- Gen.chooseNum(1, 16)
      a <- Gen.chooseNum(0, 255)
      b <- Gen.chooseNum(0, 255)
    } yield (w, h, a, b)
    check("pngLuma", Prop.forAll(gen) { case (w, h, a, b) =>
      val png = Multimodal.encodeTwoTonePng(w, h, a, b)
      val img = MediaDecoder.pixelDecode(png).get
      // lossless + single fused division of the same exact rational:
      // the decoder's pixel sum is exactly 3(a+b)(w/2)h, so both sides
      // are the correctly-rounded double of the same value — bit-equal
      img.getWidth == w && img.getHeight == h &&
        MediaDecoder.meanLuminance(img) ==
          3L * (a + b) * (w / 2) * h / (3.0 * 255.0 * w * h)
    })
  }

  test("thumbnail cell means aggregate back to the image mean") {
    // grid-aligned dims: the unweighted cell mean equals the image mean
    val gen = for {
      gw <- Gen.chooseNum(1, 4)
      gh <- Gen.chooseNum(1, 3)
      cw <- Gen.chooseNum(1, 5)
      ch <- Gen.chooseNum(1, 5)
      a <- Gen.chooseNum(0, 255)
      b <- Gen.chooseNum(0, 255)
    } yield (gw, gh, gw * cw * 2, gh * ch, a, b)
    check("thumbAgg", Prop.forAll(gen) { case (gw, gh, w, h, a, b) =>
      val png = Multimodal.encodeTwoTonePng(w, h, a, b)
      val img = MediaDecoder.pixelDecode(png).get
      val cells = MediaDecoder.thumbnail(img, gw, gh)
      val cellMean = cells.map(_.toDouble).sum / cells.length
      math.abs(cellMean - MediaDecoder.meanLuminance(img)) < 1e-6 &&
        cells.forall(c => c >= 0f && c <= 1f)
    })
  }

  test("wav pcm rms/peak round-trip random sample sets exactly") {
    val gen = for {
      bits <- Gen.oneOf(8, 16)
      n <- Gen.chooseNum(1, 300)
      samples <- Gen.listOfN(n,
        if (bits == 8) Gen.chooseNum(0, 255)
        else Gen.chooseNum(-32768, 32767)).map(_.toArray)
    } yield (bits, samples)
    check("pcmRms", Prop.forAll(gen) { case (bits, samples) =>
      val wav = Multimodal.encodePcmWav(8000, bits, samples)
      val xs = samples.map(v =>
        if (bits == 8) (v - 128) / 128.0 else v / 32768.0)
      val expect =
        (math.sqrt(xs.map(x => x * x).sum / xs.length),
          xs.map(math.abs).max)
      MediaDecoder.wavPcmFeatures(wav).contains(expect)
    })
  }

  test("pixel decode never throws on arbitrary or truncated bytes") {
    val gen = Gen.oneOf(
      Gen.listOf(Gen.chooseNum[Byte](Byte.MinValue, Byte.MaxValue))
        .map(_.toArray),
      // structured prefixes: real encodes truncated at a random point
      for {
        full <- Gen.const(Multimodal.encodeTwoTonePng(8, 4, 10, 200))
        cut <- Gen.chooseNum(0, Multimodal
          .encodeTwoTonePng(8, 4, 10, 200).length - 1)
      } yield full.take(cut))
    check("noThrow", Prop.forAll(gen) { bytes =>
      MediaDecoder.pixelDecode(bytes) // Option, never an exception
      MediaDecoder.wavPcmFeatures(bytes)
      true
    })
  }
}
