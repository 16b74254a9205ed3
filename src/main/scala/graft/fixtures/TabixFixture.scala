package graft.fixtures

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPOutputStream

import graft.formats.{Bgzf, GenomicIndex}

/** Deterministic tabix-indexed BGZF text fixture (SURVEY §2.1 S17 — the
  * text analogue of the BAM/BAI path; index layout per the htslib tabix
  * spec, reference behavior `util/index.rs:181-230`).
  *
  * Lives in main (not test) so `Verify`/`ScanGate` can materialize gate
  * fixtures at driver time, mirroring Bam/Bcf/Bbi/CramFixture.
  */
object TabixFixture {

  /** Write `rows` as one BGZF block per line plus a hand-built TBI
    * (colSeq=1, colBeg=2, colEnd=3, zero-based) and return the bgz path.
    * Rows must be (chrom, start0, end0) sorted by chrom, start.
    *
    * Includes the per-reference metadata pseudo-bin (37450) that real
    * tabix writes, so readers that mistake its counts for virtual
    * positions fail loudly in specs and the gate.
    */
  def writeBedGz(path: String, rows: Seq[(String, Long, Long)]): String = {
    val out = new FileOutputStream(path)
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
    val gz = new GZIPOutputStream(new FileOutputStream(path + ".tbi"))
    gz.write(tbi); gz.close()
    path
  }
}
