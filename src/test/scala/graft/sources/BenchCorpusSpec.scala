package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.fixtures.BenchCorpus

/** The bench corpus writer must produce files the REAL readers parse
  * correctly — block-packed BGZF, merged-chunk BAI/TBI, linear index —
  * at a (scaled-down) size that still spans many blocks and bins. The
  * at-scale reader bench (b01–b05) rests on exactly these paths. */
class BenchCorpusSpec extends SparkSuite {

  private lazy val corpus = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bc").toString
    BenchCorpus.ensure(dir, nBam = 30000, nVcf = 20000, nBed = 30000,
      nCram = 25000)
  }

  test("cram corpus: full scan values; slim projection skips qual decode") {
    val df = spark.read.format("cram").load(corpus.cram)
    assert(df.count() == 25000)
    val r = df.where(col("qname") === "r00000002")
      .select("rname", "pos", "end", "cigar", "mapq", "qual", "seq")
      .collect()(0)
    assert(r.getString(0) == "chr1")
    assert(r.getLong(1) == 7 && r.getLong(2) == 106) // pos = 1 + 3*i
    assert(r.getString(3) == "100M" && r.getInt(4) == 60)
    assert(r.getString(5).length == 100 && r.getString(6).length == 100)
    // seq reconstructs from the embedded reference (plain match)
    assert(r.getString(6).forall("ACGT".contains(_)))
    // slim projection returns the same coordinates (QS/RN blocks skipped)
    val slim = spark.read.format("cram").load(corpus.cram)
      .select("pos", "end").where(col("pos") === 7).collect()
    assert(slim.length == 1 && slim(0).getLong(1) == 106)
  }

  test("bam corpus: full scan count, values, multi-block layout") {
    val df = spark.read.format("bam").option("tag_scan_rows", "4")
      .load(corpus.bam)
    assert(df.count() == 30000)
    // spot-check decoded fields of a 100M record: pos is 1-based,
    // end = pos + 100 - 1 for the plain-M cigar
    val r = df.where(col("qname") === "read2").select("rname", "pos",
      "end", "cigar", "mapq", "flag").collect()(0)
    assert(r.getString(0) == "chr1")
    assert(r.getLong(2) == r.getLong(1) + 99)
    assert(r.getString(3) == "100M")
    assert(r.getInt(5) == 0)
    // packed blocks: the file must be far smaller than record-per-block
    // (30k records in << 30k blocks)
    assert(new java.io.File(corpus.bam).length() < 4L * 1024 * 1024)
  }

  test("bam corpus: indexed region query matches a full-scan filter") {
    val full = spark.read.format("bam").option("tag_scan_rows", "0")
      .load(corpus.bam)
    // region in the middle of chr1 (1-based closed option syntax)
    val expected = full
      .where(col("rname") === "chr1" &&
        col("pos") <= 68000000L && col("end") >= 60000001L)
      .count()
    assert(expected > 0, "region must be populated")
    val region = spark.read.format("bam").option("tag_scan_rows", "0")
      .option("regions", "chr1:60000001-68000000").load(corpus.bam)
    assert(region.count() == expected)
    // near-adjacent index chunks must coalesce and the scattered
    // coarse-bin stragglers must pack into shared multi-range
    // partitions — the pre-r8 shape planned one task per chunk
    assert(region.rdd.getNumPartitions <= 2,
      s"region query planned ${region.rdd.getNumPartitions} partitions")
  }

  test("bam corpus: whole-chromosome region fans out AND stays exact") {
    // the b11 bench shape as a durable spec: a region covering a whole
    // chromosome (2/3 of the file) must flow through the indexed path
    // with chunk-coalesce + packRanges FAN-OUT — not one mega-partition
    // (a small split budget forces the issue at corpus-spec size) —
    // and still return exactly the full-scan filter's rows
    val full = spark.read.format("bam").option("tag_scan_rows", "0")
      .load(corpus.bam)
    val expected = full.where(col("rname") === "chr1").count()
    assert(expected > 0, "chr1 must be populated")
    val region = spark.read.format("bam").option("tag_scan_rows", "0")
      .option("maxpartitionbytes", (128 * 1024).toString)
      .option("regions", "chr1").load(corpus.bam)
    assert(region.count() == expected)
    assert(region.rdd.getNumPartitions >= 4,
      s"whole-chromosome region planned only " +
        s"${region.rdd.getNumPartitions} partition(s)")
  }

  test("coalesceChunks: bounded gaps merge, large gaps and spans cut") {
    import graft.formats.GenomicIndex.{Chunk, coalesceChunks}
    import graft.formats.Bgzf.VirtualPosition
    def ch(a: Long, b: Long) =
      Chunk(VirtualPosition(a, 0), VirtualPosition(b, 0))
    // gaps of 10 bytes merge; the 1e6 gap cuts
    val got = coalesceChunks(
      Seq(ch(0, 100), ch(110, 200), ch(210, 300), ch(2000000, 2000100)),
      gapBytes = 1000, spanBytes = 1L << 20)
    assert(got.map(c => (c.begin.compressedOffset, c.end.compressedOffset))
      == Seq((0L, 300L), (2000000L, 2000100L)))
    // span cap: chunks merge until the range would exceed spanBytes
    val capped = coalesceChunks(
      (0 until 10).map(i => ch(i * 100L, i * 100L + 90)),
      gapBytes = 1000, spanBytes = 250)
    assert(capped.size > 1 && capped.forall(c =>
      c.end.compressedOffset - c.begin.compressedOffset <= 250))
    // order-independence: shuffled input produces the same ranges
    val shuffled = coalesceChunks(
      Seq(ch(210, 300), ch(0, 100), ch(2000000, 2000100), ch(110, 200)),
      gapBytes = 1000, spanBytes = 1L << 20)
    assert(shuffled == got)
  }

  test("bam corpus: index-derived splits fan out and preserve the scan") {
    val df = spark.read.format("bam").option("tag_scan_rows", "0")
      .option("maxpartitionbytes", (64 * 1024).toString)
      .load(corpus.bam)
    assert(df.rdd.getNumPartitions >= 8,
      s"expected >=8 splits, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 30000)
    assert(df.select(countDistinct(col("qname"))).collect()(0).getLong(0)
      == 30000)
  }

  test("vcf corpus: header-driven schema, info fields, tabix splits") {
    val df = spark.read.format("vcf").load(corpus.vcf)
    assert(df.count() == 20000)
    val r = df.select(col("chrom"), col("pos"), col("info.DP"),
      col("info.AF"), col("info.AN"), col("samples.s1.GT")).limit(5)
      .collect()
    assert(r.forall(_.getString(0) == "chr1"))
    assert(r.forall(!_.isNullAt(2)))
    assert(r.forall(_.getLong(4) == 6L)) // VCF Integer widens to LongType
    assert(r.forall(!_.isNullAt(5)))
    val split = spark.read.format("vcf")
      .option("maxpartitionbytes", (64 * 1024).toString).load(corpus.vcf)
    assert(split.rdd.getNumPartitions >= 4)
    assert(split.count() == 20000)
  }

  test("bed corpus: tabix region query matches a full-scan filter") {
    val full = spark.read.format("bed").load(corpus.bed)
    assert(full.count() == 30000)
    val expected = full.where(col("chrom") === "chr1" &&
      col("start") < 120000000L && col("end") > 100000000L).count()
    assert(expected > 0)
    val region = spark.read.format("bed")
      .option("regions", "chr1:100000001-120000000").load(corpus.bed)
    assert(region.count() == expected)
  }
}
