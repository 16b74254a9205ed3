package graft.formats

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.fixtures.{BamFixture, BbiFixture}

/** Decode edge cases surfaced by the formats-layer review: long-CIGAR
  * CG reconstruction, raw-mode range bounds, UTF-8 BigBed rest fields,
  * quote-aware AutoSql field splitting. */
class DecoderEdgeSpec extends SparkSuite {

  test("BAM long-CIGAR placeholder reconstructs from the CG:B,I tag") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cg").toString
    // real cigar 2M1I1M (query 4 = lSeq, ref 3); record carries the
    // spec placeholder 4S3N plus CG:B,I = [2M, 1I, 1M]
    def opInt(len: Int, op: Char): Int = (len << 4) | "MIDNSHP=X".indexOf(op)
    val cg = java.nio.ByteBuffer.allocate(8 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cg.put('C'.toByte).put('G'.toByte).put('B'.toByte).put('I'.toByte)
    cg.putInt(3)
    cg.putInt(opInt(2, 'M')).putInt(opInt(1, 'I')).putInt(opInt(1, 'M'))
    BamFixture.write(s"$dir/cg.bam",
      Seq(("chr1", 100000)),
      Seq(BamFixture.Rec("r1", 0, 0, 100, 60,
        Seq((4, 'S'), (3, 'N')), "ACGT", "FFFF", tags = cg.array())))
    val df = spark.read.format("bam")
      .option("tags", "CG:L,NM:i").load(s"$dir/cg.bam")
    val row = df.selectExpr("cigar", "`end`", "tags.CG").collect()(0)
    assert(row.getString(0) == "2M1I1M")
    assert(row.getLong(1) == 103L) // pos 101 (1-based) + refLen 3 - 1
    assert(row.isNullAt(2), "consumed CG must not also surface as a tag")
    // a normal record's cigar is untouched by the placeholder logic
    BamFixture.write(s"$dir/plain.bam",
      Seq(("chr1", 100000)),
      Seq(BamFixture.Rec("r2", 0, 0, 100, 60,
        Seq((4, 'M')), "ACGT", "FFFF")))
    val plain = spark.read.format("bam").option("tag_scan_rows", "0")
      .load(s"$dir/plain.bam").selectExpr("cigar").collect()(0)
    assert(plain.getString(0) == "4M")
  }

  test("raw-mode range streams stop at absolute byte bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-raw")
    val p = dir.resolve("raw.bin")
    val data = Array.tabulate[Byte](300000)(i => (i % 251).toByte)
    java.nio.file.Files.write(p, data)
    def input() = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        new org.apache.hadoop.conf.Configuration())
      SeekableInputs.forHadoop(fs,
        new org.apache.hadoop.fs.Path(p.toString))
    }
    def readAll(s: java.io.InputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = s.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = s.read(buf) }
      out.toByteArray
    }
    // a bound INSIDE a 64 KiB pseudo-chunk (not on the chunk grid):
    // the two partitions must cover [0, 300000) exactly once
    val b = 70000L
    val part1 = readAll(new BgzfRangeInputStream(input(),
      Bgzf.VirtualPosition(0, 0), Some(Bgzf.VirtualPosition(b, 0))))
    val part2 = readAll(new BgzfRangeInputStream(input(),
      Bgzf.VirtualPosition(b, 0), None))
    assert(part1.length == b.toInt, s"got ${part1.length}")
    assert(part1.length + part2.length == data.length)
    assert((part1 ++ part2).toSeq == data.toSeq)
  }

  test("BigBed rest fields decode UTF-8, not per-byte chars") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bb8")
    val p = dir.resolve("u.bb").toString
    BbiFixture.write(p, Seq(("chr1", 1000)),
      wigSections = Nil,
      bedItems = Seq(
        BbiFixture.BedItem(0, 10, 20, "géne\t0"),
        BbiFixture.BedItem(0, 30, 40, "plain\t1")),
      zooms = Nil)
    val rests = spark.read.format("bigbed").load(p)
      .selectExpr("rest").collect().map(_.getString(0)).toSet
    assert(rests == Set("géne\t0", "plain\t1"), rests.toString)
  }

  test("AutoSql: semicolons inside field comments do not split fields") {
    val t = AutoSql.parse(
      """table t "desc"
        |(
        |uint score; "score; 0-1000 scaled"
        |string name; "the name"
        |)""".stripMargin)
    assert(t.fields.map(_.name) == Seq("score", "name"))
  }
}
