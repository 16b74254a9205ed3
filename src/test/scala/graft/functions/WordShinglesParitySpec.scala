package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parity of the codegen'd [[TextFunctions.WordShingles]] /
  * [[TextFunctions.WordParagraphs]] kernels against the
  * `transform`/`sequence`/`slice`/`concat_ws` HOF formulations they
  * replaced — the HOF forms are the semantic spec the DuckDB oracles
  * mirror, so agreement must be string-exact on every edge: empty
  * text, single word, consecutive/leading/trailing spaces (empty
  * tokens), short texts (tail clamp), unicode, and null text. */
class WordShinglesParitySpec extends SparkSuite {

  private def bindCol(bound: Column, f: Column => Column): Column =
    element_at(transform(array(bound), f), 1)

  private def hofShingles(text: Column): Column =
    when(text.isNull, lit(null).cast("array<string>"))
      .otherwise(bindCol(split(text, " "), ws =>
        transform(
          sequence(lit(1), greatest(size(ws) - 2, lit(1))),
          i => concat_ws(" ", slice(ws, i, lit(3))))))

  private def hofParagraphs(text: Column, words: Int): Column =
    when(text.isNull, lit(null).cast("array<string>"))
      .otherwise(bindCol(split(text, " "), ws =>
        transform(sequence(lit(1), ceil(size(ws) / lit(words.toDouble))
            .cast("int")),
          i => concat_ws(" ", slice(ws, (i - 1) * words + 1,
            lit(words))))))

  private val corpus: Seq[String] = Seq(
    null,
    "",
    "one",
    "two words",
    "three word text",
    "four word text here",
    "a b c d e f g h i j",
    "double  space", // empty token between the spaces
    " leading", "trailing ", "  ", " ",
    "unicode éü中文 token mix",
    "tab\tis not a separator",
    "x " * 50 + "tail") ++
    (0 until 40).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until rnd.nextInt(12)).map(_ =>
        if (rnd.nextInt(5) == 0) "" else s"w${rnd.nextInt(9)}")
        .mkString(" ")
    }

  private def df = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      corpus.map(s => org.apache.spark.sql.Row(s)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
  }

  private def assertSame(kernel: Column, hof: Column,
      label: String): Unit = {
    val rows = df.select(col("t"), kernel.as("k"), hof.as("h")).collect()
    rows.foreach { r =>
      val k = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val h = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(k == h, s"$label for text=${r.get(0)}: kernel $k vs HOF $h")
    }
  }

  test("WordShingles is string-exact with the HOF formulation") {
    assertSame(graft.operators.TextOps.shingles(col("t")),
      hofShingles(col("t")), "shingles")
  }

  test("WordParagraphs is string-exact with the HOF formulation") {
    for (words <- Seq(1, 2, 5, 50))
      assertSame(graft.operators.TextOps.paragraphs(col("t"), words),
        hofParagraphs(col("t"), words), s"paragraphs($words)")
  }

  test("WordGrams is string-exact with the HOF formulation " +
      "(incl. null text -> EMPTY array, not null)") {
    def hofGrams(text: Column, n: Int): Column =
      bindCol(split(text, " "), ws =>
        when(size(ws) >= n,
          transform(sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws(" ", slice(ws, i, lit(n)))))
          .otherwise(array().cast("array<string>")))
    for (n <- Seq(1, 2, 3, 13))
      assertSame(graft.operators.TextOps.wordGrams(col("t"), n),
        hofGrams(col("t"), n), s"wordGrams($n)")
  }
}
