package graft.formats

import graft.SparkSuite
import graft.core.Region

/** FAI slicing, chrom metadata surface, and PERMISSIVE mode. */
class MetaAndModeSpec extends SparkSuite {

  test("fai: parse + seek-based slice with line wrapping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fai")
    // 60-base sequence wrapped at 10 bases/line (11 bytes/line with \n)
    val seq = "ACGTACGTAA" * 6
    val fa = dir.resolve("g.fa")
    val content = ">chr1 desc\n" + seq.grouped(10).mkString("\n") + "\n"
    java.nio.file.Files.write(fa, content.getBytes("UTF-8"))
    val offset = ">chr1 desc\n".length.toLong
    val fai = dir.resolve("g.fa.fai")
    java.nio.file.Files.write(fai,
      s"chr1\t60\t$offset\t10\t11\n".getBytes("UTF-8"))

    val entries = FaiIndex.readFor(
      new org.apache.hadoop.fs.Path(fa.toString),
      new org.apache.hadoop.conf.Configuration()).get
    assert(entries == Seq(FaiIndex.Entry("chr1", 60, offset, 10, 11)))

    val in = SeekableInputs.forLocal(fa.toString)
    try {
      // slice crossing a line boundary: bases [8, 22)
      assert(FaiIndex.slice(in, entries.head, Region("chr1", 8, Some(22))) ==
        seq.substring(8, 22))
      // whole sequence
      assert(FaiIndex.slice(in, entries.head, Region("chr1", 0, None)) == seq)
      // clamped past the end
      assert(FaiIndex.slice(in, entries.head, Region("chr1", 55, Some(100))) ==
        seq.substring(55))
    } finally in.close()
  }

  test("meta: chromSizes from fai / bam / bigwig") {
    // fai path
    val dir = java.nio.file.Files.createTempDirectory("graft-meta")
    val fa = dir.resolve("g.fa")
    java.nio.file.Files.write(fa, ">c\nACGT\n".getBytes)
    java.nio.file.Files.write(dir.resolve("g.fa.fai"),
      "c\t4\t3\t4\t5\n".getBytes)
    assert(GraftMeta.chromSizes(fa.toString) == Map("c" -> 4L))

    // bam path
    val bam = dir.resolve("m.bam").toString
    graft.fixtures.BamFixture.write(bam, Seq(("chr1", 1000), ("chr2", 500)),
      Seq(graft.fixtures.BamFixture.Rec("r", 0, 0, 10, 30,
        Seq((4, 'M')), "ACGT", null)))
    assert(GraftMeta.chromSizes(bam) == Map("chr1" -> 1000L, "chr2" -> 500L))

    // bigwig path (fixture writes size 1000000 per chrom)
    val bw = dir.resolve("m.bw").toString
    graft.fixtures.BbiFixture.write(bw, Seq(("chr1", 0)),
      Seq(graft.fixtures.BbiFixture.WigSection(0, 1, 0, 0, 0,
        Seq((0L, 10L, 1f)))), Nil,
      Seq(graft.fixtures.BbiFixture.Zoom(0, 0, 10, 1, 1f, 1f, 1f, 1f)))
    assert(GraftMeta.chromSizes(bw) == Map("chr1" -> 1000000L))
    assert(GraftMeta.zoomLevels(bw) == Seq(1000))
  }

  test("meta: indexStats surfaces pseudo-bin mapped/unmapped counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats")
    val bam = dir.resolve("s.bam").toString
    graft.fixtures.BamFixture.write(bam, Seq(("chr1", 1000), ("chr2", 500)),
      Seq(
        graft.fixtures.BamFixture.Rec("a", 0, 0, 10, 30, Seq((4, 'M')), "ACGT", null),
        graft.fixtures.BamFixture.Rec("b", 0, 0, 50, 30, Seq((4, 'M')), "GGTT", null),
        graft.fixtures.BamFixture.Rec("c", 0, 1, 20, 30, Seq((4, 'M')), "CCAA", null)))
    assert(GraftMeta.indexStats(bam) ==
      Map("chr1" -> ((2L, 0L)), "chr2" -> ((1L, 0L))))
  }

  test("permissive mode skips malformed records; failfast raises") {
    val lines = Seq(
      "chr1\t100\t200\tok1\t1\t+",
      "chr1\tnot_a_number\t300\tbad\t1\t+",
      "chr2\t10\t20\tok2\t2\t-")
    val path = tempFile("m.bed", lines)
    val permissive = spark.read.format("bed").option("bed_schema", "bed6")
      .option("mode", "PERMISSIVE").load(path)
    assert(permissive.collect().map(_.getString(3)).toSet == Set("ok1", "ok2"))
    val failfast = spark.read.format("bed").option("bed_schema", "bed6")
      .load(path)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }
}
