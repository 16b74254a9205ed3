package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class TextFunctionsSpec extends AnyFunSuite {

  /** Brute-force reference: per-position polynomial hash, per-window
    * min over clamped slices, first-appearance distinct — the spec the
    * rolling+deque kernel must match exactly. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val B = 131L; val Mask = 0xFFFFFFFFL
    val nGrams = math.max(s.length - k + 1, 1)
    val hashes = (0 until nGrams).map { i =>
      s.substring(i, math.min(i + k, s.length))
        .foldLeft(0L)((h, c) => (h * B + c) & Mask)
    }
    val nWins = math.max(nGrams - w + 1, 1)
    val mins = (0 until nWins).map(i =>
      hashes.slice(i, math.min(i + w, nGrams)).min)
    mins.distinct
  }

  private def kernel(s: String, k: Int, w: Int): Seq[Long] =
    TextKernels.winnow(UTF8String.fromString(s), k, w).toLongArray().toSeq

  test("winnow kernel matches the brute-force reference") {
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("ab", "abcd", "abcdefghijklmnop ")
    for {
      alpha <- alphabets
      len <- Seq(0, 1, 3, 7, 8, 9, 20, 100, 500)
      (k, w) <- Seq((8, 4), (3, 2), (5, 5), (2, 10))
    } {
      val s = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(kernel(s, k, w) == reference(s, k, w),
        s"len=$len k=$k w=$w alpha='$alpha' s='$s'")
    }
  }

  test("winnow kernel: values are 32-bit, repeats collapse") {
    val out = kernel("abababababababababab", 4, 3)
    assert(out.nonEmpty && out.forall(v => v >= 0L && v < (1L << 32)))
    assert(out.distinct == out)
    // a 2-periodic string has at most 2 distinct gram hashes
    assert(out.size <= 2)
  }
}
