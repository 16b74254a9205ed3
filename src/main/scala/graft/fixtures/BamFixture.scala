package graft.fixtures

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.formats.{Bgzf, GenomicIndex}

/** Generates tiny spec-conformant BAM files + BAI indexes for tests
  * (fixture corpus per FIXTURES.md §1 — generated, not copied). Each
  * record goes in its own BGZF block so virtual positions are simply
  * (blockOffset, 0), which keeps the hand-built BAI exact. */
object BamFixture {

  final case class Rec(qname: String, flag: Int, refId: Int, pos0: Int,
      mapq: Int, cigar: Seq[(Int, Char)], seq: String, qual: String,
      tags: Array[Byte] = Array.empty)

  def tagInt(tag: String, v: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag(0).toByte).put(tag(1).toByte).put('i'.toByte).putInt(v)
    bb.array()
  }
  def tagStr(tag: String, v: String): Array[Byte] = {
    val bb = ByteBuffer.allocate(3 + v.length + 1).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag(0).toByte).put(tag(1).toByte).put('Z'.toByte)
    bb.put(v.getBytes("ASCII")).put(0.toByte)
    bb.array()
  }
  def tagFloat(tag: String, v: Float): Array[Byte] = {
    val bb = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag(0).toByte).put(tag(1).toByte).put('f'.toByte).putFloat(v)
    bb.array()
  }
  /** B:i (int32) array tag. */
  def tagIntArray(tag: String, vs: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 * vs.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag(0).toByte).put(tag(1).toByte).put('B'.toByte).put('i'.toByte)
    bb.putInt(vs.length)
    vs.foreach(bb.putInt)
    bb.array()
  }

  private[fixtures] def encodeHeader(refs: Seq[(String, Int)]): Array[Byte] = {
    val text = "@HD\tVN:1.6\n" +
      refs.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString
    val tb = text.getBytes("UTF-8")
    val size = 4 + 4 + tb.length + 4 +
      refs.map { case (n, _) => 4 + n.length + 1 + 4 }.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Array[Byte]('B', 'A', 'M', 1))
    bb.putInt(tb.length).put(tb)
    bb.putInt(refs.size)
    refs.foreach { case (n, l) =>
      bb.putInt(n.length + 1).put(n.getBytes("ASCII")).put(0.toByte).putInt(l)
    }
    bb.array()
  }

  private val CigarOps = "MIDNSHP=X"
  private val SeqCodes = "=ACMGRSVTWYHKDBN"

  private[fixtures] def encodeRecord(r: Rec): Array[Byte] = {
    val nameB = r.qname.getBytes("ASCII")
    val nSeq = r.seq.length
    val seqB = new Array[Byte]((nSeq + 1) / 2)
    r.seq.zipWithIndex.foreach { case (ch, i) =>
      val code = SeqCodes.indexOf(ch.toUpper)
      require(code >= 0, s"bad base $ch")
      if (i % 2 == 0) seqB(i / 2) = (code << 4).toByte
      else seqB(i / 2) = (seqB(i / 2) | code).toByte
    }
    val qualB =
      if (r.qual == null) Array.fill[Byte](nSeq)(0xff.toByte)
      else r.qual.map(c => (c - 33).toByte).toArray
    val size = 32 + nameB.length + 1 + r.cigar.size * 4 + seqB.length +
      qualB.length + r.tags.length
    val bb = ByteBuffer.allocate(4 + size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size)
    bb.putInt(r.refId)
    bb.putInt(if (r.refId < 0) -1 else r.pos0)
    bb.put((nameB.length + 1).toByte)
    bb.put(r.mapq.toByte)
    bb.putShort(0.toShort) // bin (unused by the reader)
    bb.putShort(r.cigar.size.toShort)
    bb.putShort(r.flag.toShort)
    bb.putInt(nSeq)
    bb.putInt(-1) // next_refID
    bb.putInt(-1) // next_pos
    bb.putInt(0)  // tlen
    bb.put(nameB).put(0.toByte)
    r.cigar.foreach { case (len, op) =>
      bb.putInt((len << 4) | CigarOps.indexOf(op))
    }
    bb.put(seqB).put(qualB).put(r.tags)
    bb.array()
  }

  def refLen(r: Rec): Int = r.cigar.collect {
    case (n, op) if "MDN=X".indexOf(op.toInt) >= 0 => n
  }.sum

  /** Write `records` as an UNCOMPRESSED BAM (no BGZF wrapper, htslib
    * `samtools view -u` style) — exercises the raw pass-through path. */
  def writeRaw(path: String, refs: Seq[(String, Int)],
      records: Seq[Rec]): Unit = {
    val out = new FileOutputStream(path)
    out.write(encodeHeader(refs))
    records.foreach(r => out.write(encodeRecord(r)))
    out.close()
  }

  /** Write `records` (mapped ones must be sorted by refId, pos) to
    * `path` (.bam) and a matching `.bam.bai`. Returns per-record block
    * offsets. */
  def write(path: String, refs: Seq[(String, Int)], records: Seq[Rec]): Unit = {
    val out = new FileOutputStream(path)
    val headerBlock = Bgzf.writeBlock(encodeHeader(refs))
    out.write(headerBlock)
    // accumulate offsets from the bytes written, never File.length() on a
    // still-open stream (filesystems may report attribute updates late)
    var offset = headerBlock.length.toLong
    // track (record, blockStart, blockEnd-compressed)
    val spans = records.map { r =>
      val blockBytes = Bgzf.writeBlock(encodeRecord(r))
      out.write(blockBytes)
      val start = offset
      offset += blockBytes.length
      (r, start, offset)
    }
    out.write(Bgzf.EofBlock)
    out.close()

    // ------- BAI
    val bai = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    bai.put(Array[Byte]('B', 'A', 'I', 1))
    bai.putInt(refs.size)
    (0 until refs.size).foreach { refId =>
      // htslib indexes PLACED records — a coordinate implies a bin even
      // when flag 0x4 is set (placed-unmapped mates) — so the fixture
      // must too, or indexed region queries drop records a full scan
      // returns; the 0x4 flag only routes the pseudo-bin COUNTS
      val placed = spans.filter { case (r, _, _) => r.refId == refId }
      // bin → chunks
      val bins = placed.groupBy { case (r, _, _) =>
        GenomicIndex.reg2bin(r.pos0.toLong, (r.pos0 + math.max(refLen(r), 1)).toLong)
      }
      // samtools always appends the metadata pseudo-bin 37450 (record
      // vpos span + mapped/unmapped counts); real-world indexes have it,
      // so the fixture writes it too — readers must NOT treat its
      // pseudo-chunks as virtual positions
      val unmappedHere = placed.count { case (r, _, _) => (r.flag & 0x4) != 0 }
      val mappedHere = placed.size - unmappedHere
      val writeMeta = placed.nonEmpty
      bai.putInt(bins.size + (if (writeMeta) 1 else 0))
      bins.toSeq.sortBy(_._1).foreach { case (bin, rs) =>
        bai.putInt(bin)
        bai.putInt(rs.size)
        rs.foreach { case (_, s, e) =>
          bai.putLong(s << 16)
          bai.putLong(e << 16)
        }
      }
      if (writeMeta) {
        bai.putInt(37450) // metadata pseudo-bin
        bai.putInt(2)
        bai.putLong(placed.map(_._2).min << 16) // off_beg
        bai.putLong(placed.map(_._3).max << 16) // off_end
        bai.putLong(mappedHere.toLong)          // n_mapped (raw count!)
        bai.putLong(unmappedHere.toLong)        // n_unmapped (raw count!)
      }
      // linear index: 16 KiB windows
      if (placed.isEmpty) bai.putInt(0)
      else {
        val maxEnd = placed.map { case (r, _, _) =>
          r.pos0 + math.max(refLen(r), 1)
        }.max
        val nIntv = (maxEnd >> 14) + 1
        bai.putInt(nIntv)
        (0 until nIntv).foreach { w =>
          val lo = placed.collect {
            case (r, s, _)
              if (r.pos0 >> 14) <= w &&
                ((r.pos0 + math.max(refLen(r), 1) - 1) >> 14) >= w => s << 16
          }
          bai.putLong(if (lo.isEmpty) 0L else lo.min)
        }
      }
    }
    val baiBytes = new Array[Byte](bai.position())
    bai.rewind(); bai.get(baiBytes)
    val bo = new FileOutputStream(path + ".bai")
    bo.write(baiBytes)
    bo.close()
  }
}
