package graft.sources

import graft.SparkSuite

class SeqSourcesSpec extends SparkSuite {

  private val fasta = Seq(
    ">chr1 test chromosome one",
    "ACGTACGTAC",
    "GGGTTTAAAC",
    ">chr2",
    "TTTT")

  test("fasta: one row per record, multi-line sequences joined") {
    val df = spark.read.format("fasta").load(tempFile("s.fa", fasta))
    assert(df.columns.toSeq == Seq("name", "description", "sequence"))
    val rows = df.orderBy("name").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "chr1" &&
      rows(0).getString(1) == "test chromosome one" &&
      rows(0).getString(2) == "ACGTACGTACGGGTTTAAAC")
    assert(rows(1).getString(0) == "chr2" && rows(1).isNullAt(1) &&
      rows(1).getString(2) == "TTTT")
  }

  test("fasta: region slicing (one row per query region)") {
    val df = spark.read.format("fasta")
      .option("regions", "chr1:3-6;chr2;chrX:1-2")
      .load(tempFile("s2.fa", fasta))
    val rows = df.orderBy("name", "start").collect()
    assert(df.columns.toSeq ==
      Seq("name", "description", "start", "end", "sequence"))
    // chr1:3-6 one-based closed = [2,6) → "GTAC"
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "chr1" && rows(0).getLong(2) == 2 &&
      rows(0).getLong(3) == 6 && rows(0).getString(4) == "GTAC")
    assert(rows(1).getString(0) == "chr2" && rows(1).getString(4) == "TTTT")
  }

  test("fastq: 4-line records with quality") {
    val fq = Seq(
      "@read1 desc here", "ACGT", "+", "IIII",
      "@read2", "GGCC", "+read2", "@@!!") // quality may start with @
    val df = spark.read.format("fastq").load(tempFile("s.fq", fq))
    val rows = df.orderBy("name").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "read1" &&
      rows(0).getString(1) == "desc here" &&
      rows(0).getString(2) == "ACGT" && rows(0).getString(3) == "IIII")
    assert(rows(1).getString(0) == "read2" && rows(1).getString(3) == "@@!!")
  }

  test("fastq: gzip input") {
    val fq = Seq("@r", "A", "+", "I")
    val df = spark.read.format("fastq").load(tempGzFile("s.fq.gz", fq))
    assert(df.count() == 1)
  }
}
