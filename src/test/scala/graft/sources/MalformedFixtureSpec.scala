package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Malformed-input policy over the reference's real corruption corpus
  * (`/root/reference/fixtures/malformed.*`): PERMISSIVE keeps every
  * well-formed record and skips the broken ones; FAILFAST surfaces a
  * parse error; binary containers with corrupted framing fail loudly
  * rather than returning garbage. Good-record counts derived with awk
  * over the files, not with our readers. */
class MalformedFixtureSpec extends SparkSuite {

  private val fx = "/root/reference/fixtures"
  private def have(name: String): Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(s"$fx/$name"))
  private def withFixture(names: String*)(body: => Unit): Unit =
    if (names.forall(have)) body else cancel(s"fixtures missing: $names")

  test("malformed.sam: truncated final record skipped/failed by mode") {
    withFixture("malformed.sam") {
      // 3 record lines; the last is cut mid-record (9 of 11 fields)
      val ok = spark.read.format("sam").option("mode", "PERMISSIVE")
        .option("tag_scan_rows", "0").load(s"$fx/malformed.sam")
      assert(ok.select("qname").collect().map(_.getString(0)).sorted.toSeq ==
        Seq("r003", "r004"))
      val strict = spark.read.format("sam").option("tag_scan_rows", "0")
        .load(s"$fx/malformed.sam")
      intercept[Exception] { strict.count() }
    }
  }

  test("malformed.bed: 5-field line among bed9 rows") {
    withFixture("malformed.bed") {
      val ok = spark.read.format("bed").option("bed_schema", "bed9")
        .option("mode", "PERMISSIVE").load(s"$fx/malformed.bed")
      assert(ok.count() == 54) // 55 lines, one lacks the bed9 columns
      val strict = spark.read.format("bed").option("bed_schema", "bed9")
        .load(s"$fx/malformed.bed")
      intercept[Exception] { strict.count() }
    }
  }

  test("malformed.gff and malformed.gtf: short lines skipped by mode") {
    withFixture("malformed.gff", "malformed.gtf") {
      val gff = spark.read.format("gff").option("mode", "PERMISSIVE")
        .load(s"$fx/malformed.gff")
      assert(gff.count() == 12) // 13 data lines, one with 7 of 9 fields
      intercept[Exception] {
        spark.read.format("gff").load(s"$fx/malformed.gff").count()
      }
      val gtf = spark.read.format("gtf").option("mode", "PERMISSIVE")
        .load(s"$fx/malformed.gtf")
      assert(gtf.count() == 18) // 19 data lines, one malformed
      intercept[Exception] {
        spark.read.format("gtf").load(s"$fx/malformed.gtf").count()
      }
    }
  }

  test("malformed.fastq: broken 4-line framing fails loudly") {
    withFixture("malformed.fastq") {
      intercept[Exception] {
        spark.read.format("fastq").load(s"$fx/malformed.fastq").count()
      }
    }
  }

  test("malformed.fasta: glued header parses leniently (htslib behavior)") {
    withFixture("malformed.fasta") {
      // '>seCTAG...' is structurally a header, so the record count holds
      val fa = spark.read.format("fasta").load(s"$fx/malformed.fasta")
      assert(fa.count() == 20)
      assert(fa.where(col("name").startsWith("seCTAG")).count() == 1)
    }
  }

  test("malformed binary containers fail loudly, never emit garbage") {
    // (malformed.cram is excluded: it is byte-identical to sample.cram in
    // the reference corpus — verified with cmp — so a clean 3-row read is
    // the correct result there.)
    for ((fmt, name, opts) <- Seq(
        ("bam", "malformed.bam", Map("tag_scan_rows" -> "0")),
        ("bcf", "malformed.bcf", Map.empty[String, String]),
        ("bigwig", "malformed.bw", Map.empty[String, String]),
        ("bigbed", "malformed.bb", Map.empty[String, String]))) {
      withFixture(name) {
        val e = intercept[IllegalArgumentException] {
          var r = spark.read.format(fmt)
          opts.foreach { case (k, v) => r = r.option(k, v) }
          r.load(s"$fx/$name").collect()
        }
        // the error names the format-level failure, not a JVM accident
        assert(e.getMessage.toLowerCase.matches(".*(magic|bgzf|bbi).*"),
          s"$name: ${e.getMessage}")
      }
    }
  }
}
