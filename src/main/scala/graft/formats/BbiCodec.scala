package graft.formats

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import scala.collection.mutable

/** BBI (BigWig / BigBed) container codec, implemented from the published
  * UCSC BBI specification (Kent et al. 2010, supplementary tables 5-14):
  * fixed header, chromosome B+ tree, r-tree index, data sections
  * (bedGraph / varStep / fixedStep / bigBed items), zoom headers and
  * 32-byte zoom records. The reference reads these via bigtools
  * (`/root/reference/oxbow/src/bbi/`); this is an independent JVM
  * implementation of the on-disk format.
  *
  * Supports little-endian files (the common case; magic is checked) with
  * optionally zlib-compressed sections.
  */
object BbiCodec {

  val BigWigMagic = 0x888FFC26
  val BigBedMagic = 0x8789F2EB
  val ChromTreeMagic = 0x78CA8C91
  val RTreeMagic = 0x2468ACE0

  final case class ZoomHeader(reductionLevel: Int, dataOffset: Long,
      indexOffset: Long)

  final case class Header(
      magic: Int, version: Int, zoomLevels: Seq[ZoomHeader],
      chromTreeOffset: Long, fullDataOffset: Long, fullIndexOffset: Long,
      fieldCount: Int, definedFieldCount: Int, autoSqlOffset: Long,
      totalSummaryOffset: Long, uncompressBufSize: Int) {
    def isBigWig: Boolean = magic == BigWigMagic
    def compressed: Boolean = uncompressBufSize > 0
  }

  final case class Chrom(name: String, id: Int, size: Long)

  /** One r-tree leaf item: a data block location covering a coordinate
    * range. */
  final case class Section(startChromId: Int, startBase: Long,
      endChromId: Int, endBase: Long, dataOffset: Long, dataSize: Long)

  /** A decoded interval value (BigWig) or item (BigBed `rest`). */
  final case class Interval(chromId: Int, start: Long, end: Long,
      value: Float, rest: String)

  final case class ZoomRecord(chromId: Int, start: Long, end: Long,
      validCount: Long, minVal: Float, maxVal: Float, sumData: Float,
      sumSquares: Float)

  private def buf(in: Bgzf.SeekableInput, off: Long, len: Int): ByteBuffer = {
    val b = new Array[Byte](len)
    in.seek(off)
    val got = in.readFully(b, 0, len)
    // a short read means the offset table points past a truncated file:
    // zero-padded bytes would parse as empty-but-valid tree nodes and
    // silently return no rows
    if (got < len) throw new java.io.EOFException(
      s"truncated BBI file: wanted $len bytes at $off, got $got")
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
  }

  def readHeader(in: Bgzf.SeekableInput): Header = {
    val bb = buf(in, 0L, 64)
    val magic = bb.getInt
    require(magic == BigWigMagic || magic == BigBedMagic,
      f"not a little-endian BBI file (magic 0x$magic%08x)")
    val version = bb.getShort & 0xffff
    val nZoom = bb.getShort & 0xffff
    val chromTreeOffset = bb.getLong
    val fullDataOffset = bb.getLong
    val fullIndexOffset = bb.getLong
    val fieldCount = bb.getShort & 0xffff
    val definedFieldCount = bb.getShort & 0xffff
    val autoSqlOffset = bb.getLong
    val totalSummaryOffset = bb.getLong
    val uncompressBufSize = bb.getInt
    // zoom headers follow the fixed header: 24 bytes each
    val zb = buf(in, 64L, nZoom * 24)
    val zooms = (0 until nZoom).map { _ =>
      val level = zb.getInt
      zb.getInt // reserved
      ZoomHeader(level, zb.getLong, zb.getLong)
    }
    Header(magic, version, zooms, chromTreeOffset, fullDataOffset,
      fullIndexOffset, fieldCount, definedFieldCount, autoSqlOffset,
      totalSummaryOffset, uncompressBufSize)
  }

  /** AutoSql text (BigBed), NUL-terminated at autoSqlOffset. */
  def readAutoSql(in: Bgzf.SeekableInput, header: Header): Option[String] = {
    if (header.autoSqlOffset == 0) return None
    val end = math.min(header.autoSqlOffset + 65536, in.length)
    if (end <= header.autoSqlOffset) return None // offset at/past EOF
    val bb = buf(in, header.autoSqlOffset, (end - header.autoSqlOffset).toInt)
    val bytes = mutable.ArrayBuffer.empty[Byte]
    // hasRemaining checked BEFORE get so an unterminated window keeps
    // its final byte and cannot underflow
    var done = false
    while (!done && bb.hasRemaining) {
      val b = bb.get()
      if (b == 0) done = true else bytes += b
    }
    Some(new String(bytes.toArray, "UTF-8"))
  }

  /** Chromosome B+ tree → list of chroms (in-order traversal). */
  def readChroms(in: Bgzf.SeekableInput, header: Header): Seq[Chrom] = {
    val hb = buf(in, header.chromTreeOffset, 32)
    require(hb.getInt == ChromTreeMagic, "bad chrom B+ tree magic")
    hb.getInt // blockSize
    val keySize = hb.getInt
    val valSize = hb.getInt
    require(valSize == 8, s"chrom tree valSize $valSize != 8")
    hb.getLong // itemCount
    hb.getLong // reserved
    val out = mutable.ArrayBuffer.empty[Chrom]

    def walk(offset: Long): Unit = {
      val nh = buf(in, offset, 4)
      val isLeaf = nh.get() != 0
      nh.get() // reserved
      val count = nh.getShort & 0xffff
      if (isLeaf) {
        val body = buf(in, offset + 4, count * (keySize + 8))
        (0 until count).foreach { _ =>
          val key = new Array[Byte](keySize)
          body.get(key)
          val name = new String(key, "UTF-8").takeWhile(_ != '\u0000')
          val id = body.getInt
          val size = body.getInt.toLong & 0xffffffffL
          out += Chrom(name, id, size)
        }
      } else {
        val body = buf(in, offset + 4, count * (keySize + 8))
        val children = (0 until count).map { _ =>
          body.position(body.position() + keySize)
          body.getLong
        }
        children.foreach(walk)
      }
    }
    walk(header.chromTreeOffset + 32)
    out.toSeq
  }

  /** R-tree traversal: all leaf sections overlapping
    * [(chromId,start), (chromId,end)); pass chromId = -1 to list every
    * section (full scan / partition planning). */
  def querySections(in: Bgzf.SeekableInput, indexOffset: Long,
      chromId: Int, start: Long, end: Long): Seq[Section] = {
    val hb = buf(in, indexOffset, 48)
    require(hb.getInt == RTreeMagic, "bad r-tree magic")
    val out = mutable.ArrayBuffer.empty[Section]

    def overlaps(sc: Int, sb: Long, ec: Int, eb: Long): Boolean = {
      if (chromId < 0) return true
      // (sc,sb) <= (chromId,end) && (ec,eb) >= (chromId,start) lexicographic
      val startsBeforeEnd = sc < chromId || (sc == chromId && sb < end)
      val endsAfterStart = ec > chromId || (ec == chromId && eb > start)
      startsBeforeEnd && endsAfterStart
    }

    def walk(offset: Long): Unit = {
      val nh = buf(in, offset, 4)
      val isLeaf = nh.get() != 0
      nh.get()
      val count = nh.getShort & 0xffff
      if (isLeaf) {
        val body = buf(in, offset + 4, count * 32)
        (0 until count).foreach { _ =>
          val sc = body.getInt; val sb = body.getInt.toLong & 0xffffffffL
          val ec = body.getInt; val eb = body.getInt.toLong & 0xffffffffL
          val dataOff = body.getLong; val dataSize = body.getLong
          if (overlaps(sc, sb, ec, eb))
            out += Section(sc, sb, ec, eb, dataOff, dataSize)
        }
      } else {
        val body = buf(in, offset + 4, count * 24)
        (0 until count).foreach { _ =>
          val sc = body.getInt; val sb = body.getInt.toLong & 0xffffffffL
          val ec = body.getInt; val eb = body.getInt.toLong & 0xffffffffL
          val child = body.getLong
          if (overlaps(sc, sb, ec, eb)) walk(child)
        }
      }
    }
    walk(indexOffset + 48)
    out.sortBy(s => (s.startChromId, s.startBase, s.dataOffset)).toSeq
  }

  private def sectionBytes(in: Bgzf.SeekableInput, header: Header,
      s: Section): ByteBuffer = {
    // buf() raises EOFException on a short read; a truncated section that
    // zero-pads would otherwise decode as repeated (0,0,0) garbage rows
    val bb = buf(in, s.dataOffset, s.dataSize.toInt)
    if (!header.compressed) bb
    else {
      val raw = bb.array()
      val inf = new Inflater()
      inf.setInput(raw)
      val out = new Array[Byte](header.uncompressBufSize)
      var n = 0
      try {
        // a single inflate() call may return before the stream ends even
        // with room left; loop until finished or the spec-capped buffer
        // fills (sections larger than uncompressBufSize violate the spec)
        var step = inf.inflate(out, 0, out.length)
        n += step
        while (!inf.finished() && step > 0 && n < out.length) {
          step = inf.inflate(out, n, out.length - n)
          n += step
        }
        if (!inf.finished()) throw new java.io.IOException(
          s"BBI section at ${s.dataOffset} did not inflate to completion " +
            s"within uncompressBufSize=${header.uncompressBufSize}")
      } finally inf.end()
      ByteBuffer.wrap(out, 0, n).slice().order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  /** Decode one BigWig data section (bedGraph=1, varStep=2, fixedStep=3). */
  def readWigSection(in: Bgzf.SeekableInput, header: Header,
      s: Section): Seq[Interval] = {
    val bb = sectionBytes(in, header, s)
    val chromId = bb.getInt
    val chromStart = bb.getInt.toLong & 0xffffffffL
    bb.getInt // chromEnd
    val itemStep = bb.getInt.toLong & 0xffffffffL
    val itemSpan = bb.getInt.toLong & 0xffffffffL
    val sectionType = bb.get() & 0xff
    bb.get() // reserved
    val itemCount = bb.getShort & 0xffff
    sectionType match {
      case 1 => // bedGraph: start, end, value
        (0 until itemCount).map { _ =>
          val st = bb.getInt.toLong & 0xffffffffL
          val en = bb.getInt.toLong & 0xffffffffL
          Interval(chromId, st, en, bb.getFloat, null)
        }
      case 2 => // varStep: start, value (span-wide)
        (0 until itemCount).map { _ =>
          val st = bb.getInt.toLong & 0xffffffffL
          Interval(chromId, st, st + itemSpan, bb.getFloat, null)
        }
      case 3 => // fixedStep: values only, positions derived from the header
        (0 until itemCount).map { i =>
          val st = chromStart + i * itemStep
          Interval(chromId, st, st + itemSpan, bb.getFloat, null)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown wig section type $other")
    }
  }

  /** Decode one BigBed data section: packed (chromId, start, end,
    * NUL-terminated rest) items. */
  def readBedSection(in: Bgzf.SeekableInput, header: Header,
      s: Section): Seq[Interval] = {
    val bb = sectionBytes(in, header, s)
    val out = mutable.ArrayBuffer.empty[Interval]
    while (bb.remaining() >= 12) {
      val chromId = bb.getInt
      val st = bb.getInt.toLong & 0xffffffffL
      val en = bb.getInt.toLong & 0xffffffffL
      // collect the NUL-terminated rest as BYTES and decode as UTF-8:
      // per-byte toChar mangles multi-byte characters, and the bounds
      // check stops cleanly on a truncated/unterminated final item
      val bytes = mutable.ArrayBuffer.empty[Byte]
      var done = false
      while (!done && bb.hasRemaining) {
        val b = bb.get()
        if (b == 0) done = true else bytes += b
      }
      out += Interval(chromId, st, en, 0f,
        new String(bytes.toArray, "UTF-8"))
    }
    out.toSeq
  }

  /** Decode one zoom data section: 32-byte summary records. */
  def readZoomSection(in: Bgzf.SeekableInput, header: Header,
      s: Section): Seq[ZoomRecord] = {
    val bb = sectionBytes(in, header, s)
    val out = mutable.ArrayBuffer.empty[ZoomRecord]
    while (bb.remaining() >= 32) {
      out += ZoomRecord(bb.getInt, bb.getInt.toLong & 0xffffffffL,
        bb.getInt.toLong & 0xffffffffL, bb.getInt.toLong & 0xffffffffL,
        bb.getFloat, bb.getFloat, bb.getFloat, bb.getFloat)
    }
    out.toSeq
  }
}
