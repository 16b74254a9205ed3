package graft.sources

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.formats.{Bgzf, GenomicIndex}

/** Tabix-indexed BGZF text: region-chunk partitions and index-derived
  * splits over bed.gz + .tbi (the text-format analogue of the BAM path). */
class IndexedTextSpec extends SparkSuite {

  /** Write `lines` as one BGZF block per line plus a hand-built TBI
    * (colSeq=1, colBeg=2, colEnd=3, zero-based) and return the bgz path.
    * Lines must be (chrom, start0, end0) sorted by chrom, start. */
  private def writeTabixedBed(name: String,
      rows: Seq[(String, Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tbx")
    val p = dir.resolve(name).toString
    val out = new FileOutputStream(p)
    var offset = 0L
    val chromOrder = rows.map(_._1).distinct
    val spans = rows.map { case (c, s, e) =>
      val block = Bgzf.writeBlock(s"$c\t$s\t$e\n".getBytes("UTF-8"))
      out.write(block)
      val start = offset
      offset += block.length
      ((c, s, e), start, offset)
    }
    out.write(Bgzf.EofBlock)
    out.close()

    val bb = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Array[Byte]('T', 'B', 'I', 1))
    bb.putInt(chromOrder.size)
    bb.putInt(0x10000) // generic format, zero-based
    bb.putInt(1).putInt(2).putInt(3) // seq/beg/end columns (1-based)
    bb.putInt('#'.toInt).putInt(0)
    val nameBytes = chromOrder.map(_ + "\u0000").mkString.getBytes("UTF-8")
    bb.putInt(nameBytes.length).put(nameBytes)
    chromOrder.foreach { chrom =>
      val mine = spans.filter(_._1._1 == chrom)
      val bins = mine.groupBy { case ((_, s, e), _, _) =>
        GenomicIndex.reg2bin(s, math.max(e, s + 1))
      }
      // tabix writes a metadata pseudo-bin (37450) per ref on real files;
      // include it so specs catch readers that mistake its counts for
      // virtual positions
      bb.putInt(bins.size + 1)
      bins.toSeq.sortBy(_._1).foreach { case (bin, rs) =>
        bb.putInt(bin).putInt(rs.size)
        rs.foreach { case (_, s, e) => bb.putLong(s << 16).putLong(e << 16) }
      }
      bb.putInt(37450).putInt(2)
      bb.putLong(mine.map(_._2).min << 16).putLong(mine.map(_._3).max << 16)
      bb.putLong(mine.size.toLong).putLong(0L) // raw counts, not vpos
      val maxEnd = mine.map(_._1._3).max
      val nIntv = (maxEnd >> 14).toInt + 1
      bb.putInt(nIntv)
      (0 until nIntv).foreach { w =>
        val lo = mine.collect {
          case ((_, s, e), off, _)
            if (s >> 14) <= w && ((math.max(e, s + 1) - 1) >> 14) >= w =>
            off << 16
        }
        bb.putLong(if (lo.isEmpty) 0L else lo.min)
      }
    }
    val tbi = new Array[Byte](bb.position())
    bb.rewind(); bb.get(tbi)
    val gz = new GZIPOutputStream(new FileOutputStream(p + ".tbi"))
    gz.write(tbi); gz.close()
    p
  }

  private val rows = Seq(
    ("chr1", 100L, 200L), ("chr1", 15000L, 15100L), ("chr1", 40000L, 40200L),
    ("chr2", 50L, 80L), ("chr2", 20000L, 20100L))

  test("tabix region query reads only matching chunks") {
    val p = writeTabixedBed("a.bed.gz", rows)
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("regions", "chr1:14001-16000") // 1-based closed = [14000,16000)
      .load(p)
    assert(df.rdd.getNumPartitions == 1) // single chunk
    val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("chr1", 15000L)))
  }

  test("tabix whole-chromosome region via pushed catalyst filter") {
    val p = writeTabixedBed("b.bed.gz", rows)
    val df = spark.read.format("bed").option("bed_schema", "bed3").load(p)
      .where(col("chrom") === "chr2")
    assert(df.collect().map(_.getLong(1)).toSet == Set(50L, 20000L))
  }

  test("index-derived splits partition a BGZF full scan") {
    val p = writeTabixedBed("c.bed.gz", rows)
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("maxpartitionbytes", "1").load(p)
    assert(df.rdd.getNumPartitions > 1)
    assert(df.count() == 5)
    assert(df.select(sum(col("start"))).collect()(0).getLong(0) ==
      rows.map(_._2).sum)
  }

  test("overlapping multi-region query emits each record once") {
    val p = writeTabixedBed("d.bed.gz", rows)
    // both regions hit the bin holding chr1:15000-15100; before chunk
    // merging this planned two identical partitions → duplicate rows
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("regions", "chr1:14001-16000;chr1:15001-40500")
      .load(p)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.sorted == Seq(("chr1", 15000L), ("chr1", 40000L)))
  }

  test("pseudo-bin counts are excluded from split planning") {
    val p = writeTabixedBed("e.bed.gz", rows)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val idx = GenomicIndex.findFor(fs, new org.apache.hadoop.fs.Path(p)).get
    // metadata captured, not exposed as a bin
    assert(idx.refs.forall(_.metadata.isDefined))
    assert(idx.refs.flatMap(_.bins.keys).forall(_ < 37449))
    assert(idx.refs.map(_.metadata.get.nMapped).sum == rows.size)
    // split planning must only yield real BGZF block starts
    val splits = GenomicIndex.partitionFromIndex(idx, 1L)
    assert(splits.forall(v => v.uncompressedOffset == 0))
  }

  test("bgzf without index still reads as single gzip partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tbx")
    val p = dir.resolve("plain.bed.gz").toString
    val out = new FileOutputStream(p)
    rows.foreach { case (c, s, e) =>
      out.write(Bgzf.writeBlock(s"$c\t$s\t$e\n".getBytes("UTF-8")))
    }
    out.write(Bgzf.EofBlock)
    out.close()
    val df = spark.read.format("bed").option("bed_schema", "bed3").load(p)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 5)
  }
}
