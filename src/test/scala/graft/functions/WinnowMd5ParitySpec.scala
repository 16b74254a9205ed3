package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parity of the codegen'd [[TextFunctions.WinnowMd5]] kernel against
  * the HOF formulation it replaced — the HOF form (per-position
  * `conv(substring(md5(substr(text, i, k)), 1, 8), 16, 10)` gram
  * hashes, windowed `array_min(slice(...))`, `array_distinct`) is the
  * semantic spec the DuckDB q32 oracle mirrors, so agreement must be
  * value-exact on every edge: null text, empty text, texts shorter
  * than the gram (tail clamp), gram counts shorter than the window
  * (single clamped window), repeats (distinct order), and MULTIBYTE
  * text (Spark's substr/length count code points; the kernel walks
  * UTF-8 byte offsets). */
class WinnowMd5ParitySpec extends SparkSuite {

  private def bindCol(bound: Column, f: Column => Column): Column =
    element_at(transform(array(bound), f), 1)

  /** The exact pre-r21 TextOps.winnowFingerprints(fastHash = false)
    * formulation, inlined as the reference. */
  private def hofWinnow(text: Column, k: Int, w: Int): Column = bindCol(
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => conv(substring(md5(text.substr(i, lit(k))), 1, 8), 16, 10)
        .cast("long")),
    hashes =>
      array_distinct(transform(
        sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
        i => array_min(slice(hashes, i, lit(w))))))

  private val corpus: Seq[String] = Seq(
    null,
    "",
    "a",
    "short",
    "exactly8", // == default k
    "ninechars",
    "the quick brown fox jumps over the lazy dog",
    "abababababababababab", // periodic: distinct collapse
    "aaaaaaaaaaaaaaaaaaaa",
    "unicode éü中文 𝄞 mixed ascii and astral text here",
    "中文字符串没有空格但是足够长可以产生多个窗口",
    "x" * 200) ++
    (0 until 30).map { i =>
      val rnd = new scala.util.Random(100 + i)
      val alpha = "ab cdéf中\t0"
      (0 until rnd.nextInt(60))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }

  private def df = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      corpus.map(s => org.apache.spark.sql.Row(s)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
  }

  test("WinnowMd5 is value-exact with the HOF md5 formulation") {
    for ((k, w) <- Seq((8, 4), (3, 2), (5, 5), (2, 10), (1, 1))) {
      val rows = df.select(col("t"),
        TextFunctions.winnow_md5(col("t"), k, w).as("kern"),
        hofWinnow(col("t"), k, w).as("hof")).collect()
      rows.foreach { r =>
        val kern = if (r.isNullAt(1)) null else r.getSeq[Long](1)
        val hof = if (r.isNullAt(2)) null else r.getSeq[Long](2)
        assert(kern == hof,
          s"k=$k w=$w text=${r.get(0)}: kernel $kern vs HOF $hof")
      }
    }
  }

  test("winnowFingerprints(fastHash = false) routes to the kernel " +
      "and stays 32-bit") {
    val out = df.where(col("t").isNotNull).select(
      graft.operators.TextOps.winnowFingerprints(col("t")
        , 8, 4, fastHash = false).as("fp")).collect()
    out.foreach { r =>
      val fp = r.getSeq[Long](0)
      assert(fp.nonEmpty && fp.forall(v => v >= 0L && v < (1L << 32)))
      assert(fp.distinct == fp)
    }
  }
}
