package graft.fixtures

import java.io.FileOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.formats.BbiCodec

/** Spec-conformant uncompressed BBI fixture generator: fixed header, zoom
  * headers, chrom B+ tree (single leaf), data sections, single-leaf
  * r-trees for full data and zoom level 0. */
object BbiFixture {

  final case class WigSection(chromId: Int, sectionType: Int, // 1/2/3
      chromStart: Long, itemStep: Long, itemSpan: Long,
      items: Seq[(Long, Long, Float)]) // (start, end, value); fixed uses value only

  final case class BedItem(chromId: Int, start: Long, end: Long, rest: String)

  final case class Zoom(chromId: Int, start: Long, end: Long, valid: Long,
      min: Float, max: Float, sum: Float, sumSq: Float)

  private def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Coordinate span actually covered by a wig section: varStep item end
    * fields and fixedStep start/end fields are unused by contract, so the
    * span must derive from step/span arithmetic — an r-tree entry built
    * from the unused fields is [0,0) and silently invisible to region
    * queries. */
  private[fixtures] def wigSpan(s: WigSection): (Long, Long) = s.sectionType match {
    case 1 => (s.items.map(_._1).minOption.getOrElse(s.chromStart),
      s.items.map(_._2).maxOption.getOrElse(s.chromStart))
    case 2 => (s.items.map(_._1).minOption.getOrElse(s.chromStart),
      s.items.map(_._1).maxOption.map(_ + s.itemSpan).getOrElse(s.chromStart))
    case 3 => (s.chromStart,
      if (s.items.isEmpty) s.chromStart
      else s.chromStart + (s.items.size - 1) * s.itemStep + s.itemSpan)
  }

  private def encodeWigSection(s: WigSection): Array[Byte] = {
    val itemBytes = s.sectionType match {
      case 1 => 12 * s.items.size
      case 2 => 8 * s.items.size
      case 3 => 4 * s.items.size
    }
    val bb = le(24 + itemBytes)
    val chromEnd = wigSpan(s)._2
    bb.putInt(s.chromId).putInt(s.chromStart.toInt).putInt(chromEnd.toInt)
    bb.putInt(s.itemStep.toInt).putInt(s.itemSpan.toInt)
    bb.put(s.sectionType.toByte).put(0.toByte)
    bb.putShort(s.items.size.toShort)
    s.items.foreach { case (st, en, v) =>
      s.sectionType match {
        case 1 => bb.putInt(st.toInt).putInt(en.toInt).putFloat(v)
        case 2 => bb.putInt(st.toInt).putFloat(v)
        case 3 => bb.putFloat(v)
      }
    }
    bb.array()
  }

  private def encodeBedSection(items: Seq[BedItem]): Array[Byte] = {
    val size = items.map(i => 12 + i.rest.getBytes("UTF-8").length + 1).sum
    val bb = le(size)
    items.foreach { i =>
      bb.putInt(i.chromId).putInt(i.start.toInt).putInt(i.end.toInt)
      bb.put(i.rest.getBytes("UTF-8")).put(0.toByte)
    }
    bb.array()
  }

  private def encodeZoomSection(zs: Seq[Zoom]): Array[Byte] = {
    val bb = le(32 * zs.size)
    zs.foreach { z =>
      bb.putInt(z.chromId).putInt(z.start.toInt).putInt(z.end.toInt)
      bb.putInt(z.valid.toInt)
      bb.putFloat(z.min).putFloat(z.max).putFloat(z.sum).putFloat(z.sumSq)
    }
    bb.array()
  }

  /** Single-leaf r-tree over (span, offset, size) entries. */
  private def encodeRTree(
      entries: Seq[(Int, Long, Int, Long, Long, Long)]): Array[Byte] = {
    val bb = le(48 + 4 + 32 * entries.size)
    bb.putInt(BbiCodec.RTreeMagic)
    bb.putInt(256) // blockSize
    bb.putLong(entries.size.toLong)
    // zero bounds for an empty tree (valid empty BBI) instead of empty.min
    bb.putInt(entries.map(_._1).minOption.getOrElse(0))
    bb.putInt(entries.map(_._2).minOption.getOrElse(0L).toInt)
    bb.putInt(entries.map(_._3).maxOption.getOrElse(0))
    bb.putInt(entries.map(_._4).maxOption.getOrElse(0L).toInt)
    bb.putLong(0L) // endFileOffset (informational)
    bb.putInt(64)  // itemsPerSlot
    bb.putInt(0)   // reserved
    bb.put(1.toByte).put(0.toByte).putShort(entries.size.toShort)
    entries.foreach { case (sc, sb, ec, eb, off, size) =>
      bb.putInt(sc).putInt(sb.toInt).putInt(ec).putInt(eb.toInt)
      bb.putLong(off).putLong(size)
    }
    bb.array()
  }

  private def encodeChromTree(chroms: Seq[(String, Int)]): Array[Byte] = {
    val keySize = chroms.map(_._1.length).maxOption.getOrElse(1)
    val bb = le(32 + 4 + chroms.size * (keySize + 8))
    bb.putInt(BbiCodec.ChromTreeMagic)
    bb.putInt(256).putInt(keySize).putInt(8)
    bb.putLong(chroms.size.toLong).putLong(0L)
    bb.put(1.toByte).put(0.toByte).putShort(chroms.size.toShort)
    chroms.foreach { case (name, id) =>
      val key = name.getBytes("UTF-8").padTo(keySize, 0.toByte)
      bb.put(key).putInt(id).putInt(1000000) // chrom size
    }
    bb.array()
  }

  /** Assemble a BigWig or BigBed file. `wigSections` XOR `bedItems`.
    * `autoSql` embeds a NUL-terminated AutoSql declaration (BigBed);
    * `fieldCount` overrides the header's field count when set. */
  def write(path: String, chroms: Seq[(String, Int)],
      wigSections: Seq[WigSection], bedItems: Seq[BedItem],
      zooms: Seq[Zoom], autoSql: Option[String] = None,
      fieldCount: Option[Int] = None): Unit = {
    val isWig = wigSections.nonEmpty
    val autoSqlBytes = autoSql
      .map(s => s.getBytes("UTF-8") :+ 0.toByte).getOrElse(Array.empty[Byte])
    val chromTree = encodeChromTree(chroms)
    val dataSections: Seq[(Array[Byte], (Int, Long, Int, Long))] =
      if (isWig) wigSections.map { s =>
        val (lo, hi) = wigSpan(s)
        (encodeWigSection(s), (s.chromId, lo, s.chromId, hi))
      }
      else {
        // one section per chrom for bed
        bedItems.groupBy(_.chromId).toSeq.sortBy(_._1).map { case (cid, items) =>
          (encodeBedSection(items),
            (cid, items.map(_.start).min, cid, items.map(_.end).max))
        }
      }
    val zoomSection =
      if (zooms.isEmpty) None
      else Some((encodeZoomSection(zooms),
        (zooms.map(_.chromId).min, zooms.map(_.start).min,
          zooms.map(_.chromId).max, zooms.map(_.end).max)))

    val nZoom = if (zoomSection.isDefined) 1 else 0
    val headerSize = 64 + nZoom * 24
    val autoSqlOffset = if (autoSqlBytes.isEmpty) 0L else headerSize.toLong
    val chromTreeOffset = headerSize.toLong + autoSqlBytes.length
    val fullDataOffset = chromTreeOffset + chromTree.length
    // data area: 8-byte section/item count then sections
    var cursor = fullDataOffset + 8
    val placed = dataSections.map { case (bytes, span) =>
      val off = cursor
      cursor += bytes.length
      (bytes, span, off)
    }
    val fullIndexOffset = cursor
    val rtree = encodeRTree(placed.map { case (b, (sc, sb, ec, eb), off) =>
      (sc, sb, ec, eb, off, b.length.toLong)
    })
    cursor += rtree.length
    val (zoomDataOffset, zoomBytes, zoomIndexOffset, zoomRtree) =
      zoomSection match {
        case Some((zb, (sc, sb, ec, eb))) =>
          val zdo = cursor
          cursor += zb.length
          val zio = cursor
          val zrt = encodeRTree(Seq((sc, sb, ec, eb, zdo, zb.length.toLong)))
          cursor += zrt.length
          (zdo, zb, zio, zrt)
        case None => (0L, Array.empty[Byte], 0L, Array.empty[Byte])
      }

    val head = le(headerSize)
    head.putInt(if (isWig) BbiCodec.BigWigMagic else BbiCodec.BigBedMagic)
    head.putShort(4.toShort) // version
    head.putShort(nZoom.toShort)
    head.putLong(chromTreeOffset)
    head.putLong(fullDataOffset)
    head.putLong(fullIndexOffset)
    head.putShort(fieldCount.getOrElse(if (isWig) 0 else 5).toShort)
    head.putShort((if (isWig) 0 else 3).toShort) // definedFieldCount
    head.putLong(autoSqlOffset)
    head.putLong(0L) // totalSummaryOffset
    head.putInt(0)   // uncompressBufSize (uncompressed)
    head.putInt(0).putInt(0) // 8 reserved bytes → header is exactly 64
    if (nZoom == 1) {
      head.putInt(1000) // reductionLevel
      head.putInt(0)
      head.putLong(zoomDataOffset)
      head.putLong(zoomIndexOffset)
    }

    val out = new FileOutputStream(path)
    out.write(head.array())
    out.write(autoSqlBytes)
    out.write(chromTree)
    val cnt = le(8)
    cnt.putLong(dataSections.size.toLong)
    out.write(cnt.array())
    placed.foreach { case (b, _, _) => out.write(b) }
    out.write(rtree)
    if (nZoom == 1) { out.write(zoomBytes); out.write(zoomRtree) }
    out.close()
  }
}
