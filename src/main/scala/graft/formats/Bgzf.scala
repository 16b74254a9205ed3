package graft.formats

import java.io.{EOFException, InputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

/** BGZF (blocked gzip) support: block codec, virtual positions, and a
  * stream over a virtual-position range.
  *
  * BGZF is the SAM-spec §4.1 blocked-gzip framing: a series of gzip
  * members, each ≤ 64 KiB, carrying a `BC` extra subfield with the
  * compressed block size. A *virtual position* packs
  * `(compressedBlockOffset << 16) | uncompressedOffsetInBlock` — the
  * addressing scheme the reference's chunk readers and index partitioner
  * are built on (`/root/reference/oxbow/src/util/query.rs:46-114`,
  * `util/index.rs:117-178`). Implemented from the published SAM spec.
  */
object Bgzf {

  val MaxBlockSize = 65536

  /** The 28-byte BGZF EOF sentinel block. */
  val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  final case class VirtualPosition(value: Long) extends AnyVal {
    def compressedOffset: Long = value >>> 16
    def uncompressedOffset: Int = (value & 0xffff).toInt
    override def toString: String =
      s"vpos($compressedOffset,$uncompressedOffset)"
  }
  object VirtualPosition {
    def apply(coffset: Long, uoffset: Int): VirtualPosition =
      VirtualPosition((coffset << 16) | (uoffset & 0xffffL))
  }

  /** One decoded block: its compressed extent and inflated payload. */
  final case class Block(compressedOffset: Long, compressedSize: Int,
      data: Array[Byte])

  /** Minimal seekable-input abstraction (Hadoop FSDataInputStream or a
    * local RandomAccessFile adapter). */
  trait SeekableInput extends java.io.Closeable {
    def seek(pos: Long): Unit
    def readFully(buf: Array[Byte], off: Int, len: Int): Int
    def length: Long
  }

  /** True when the input starts with a gzip magic — the BGZF (or plain
    * gzip) case. htslib also writes UNCOMPRESSED BAM/BCF (`samtools -u`),
    * whose payload starts directly with the format magic; readers fall
    * back to raw pass-through for those. */
  def hasGzipMagic(in: SeekableInput): Boolean = {
    if (in.length < 2) return false
    in.seek(0L)
    val b = new Array[Byte](2)
    if (in.readFully(b, 0, 2) < 2) return false
    (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b
  }

  private[formats] val RawChunkSize = 1 << 16

  /** Raw-mode pseudo-block: a 64 KiB slice of an uncompressed file,
    * shaped as a Block so the range-stream state machine is unchanged
    * (compressedSize == data length, so virtual positions degrade to
    * (byteOffset, offsetInChunk)). */
  private[formats] def readRawChunk(in: SeekableInput,
      offset: Long): Option[Block] = {
    if (offset >= in.length) return None
    val n = math.min(RawChunkSize.toLong, in.length - offset).toInt
    val buf = new Array[Byte](n)
    in.seek(offset)
    val got = in.readFully(buf, 0, n)
    if (got <= 0) None
    else Some(Block(offset, got,
      if (got == n) buf else java.util.Arrays.copyOf(buf, got)))
  }

  /** Read the BGZF block starting at `offset`; None at EOF/EOF-sentinel
    * position. */
  def readBlock(in: SeekableInput, offset: Long): Option[Block] = {
    if (offset >= in.length) return None
    in.seek(offset)
    val header = new Array[Byte](18)
    val got = in.readFully(header, 0, 18)
    if (got == 0) return None
    // a PARTIAL header is a truncated file, not a clean end — treating
    // it as EOF would silently drop the tail of the scan
    if (got < 18) throw new EOFException(
      s"truncated BGZF block header at offset $offset ($got of 18 bytes)")
    require((header(0) & 0xff) == 0x1f && (header(1) & 0xff) == 0x8b,
      f"not a BGZF/gzip block at offset $offset (magic ${header(0)}%02x${header(1)}%02x)")
    require((header(3) & 0x04) != 0, "BGZF requires FEXTRA flag")
    val xlen = u16(header, 10)
    require(xlen >= 6, s"gzip extra field too short for BC at offset " +
      s"$offset (xlen=$xlen)")
    // header bytes 12..17 hold the first subfield if it is BC (usual case)
    var bsize = -1
    if (header(12) == 'B' && header(13) == 'C' && u16(header, 14) == 2)
      bsize = u16(header, 16) + 1
    else {
      // uncommon layout: re-read the whole extra field
      in.seek(offset + 12)
      val full = new Array[Byte](xlen)
      in.readFully(full, 0, xlen)
      var i = 0
      while (i + 4 <= xlen && bsize < 0) {
        val slen = u16(full, i + 2)
        // reading the BC payload needs i+6 <= xlen, not just the i+4
        // subfield header — a truncated extra field must hit the
        // require below, not an ArrayIndexOutOfBounds
        if (full(i) == 'B' && full(i + 1) == 'C' && slen == 2 &&
            i + 6 <= xlen)
          bsize = u16(full, i + 4) + 1
        i += 4 + slen
      }
      require(bsize > 0, s"no BC subfield in gzip extra at offset $offset")
    }
    val cdataLen = bsize - xlen - 19 - 1
    val cdata = new Array[Byte](cdataLen)
    in.seek(offset + 12 + xlen)
    // short reads are TRUNCATION, same as a partial header: with the
    // trailer buffer zeroed, isize would read 0, the inflate loop
    // would be skipped, and the partial final block would silently
    // decode as empty — dropping the tail of the scan as a clean EOF
    val gotC = in.readFully(cdata, 0, cdataLen)
    if (gotC < cdataLen) throw new EOFException(
      s"truncated BGZF block data at offset $offset ($gotC of $cdataLen)")
    val trailer = new Array[Byte](8)
    val gotT = in.readFully(trailer, 0, 8)
    if (gotT < 8) throw new EOFException(
      s"truncated BGZF block trailer at offset $offset ($gotT of 8)")
    val isize = u32(trailer, 4).toInt
    val out = new Array[Byte](isize)
    if (isize > 0) {
      val inf = new Inflater(true)
      inf.setInput(cdata)
      var done = 0
      while (done < isize && !inf.finished()) {
        val n = inf.inflate(out, done, isize - done)
        if (n == 0 && inf.needsInput()) throw new EOFException(
          s"truncated BGZF block at offset $offset")
        done += n
      }
      inf.end()
    }
    Some(Block(offset, bsize, out))
  }

  /** Write one BGZF block wrapping `data` (test/fixture support and the
    * building block for a future writer). */
  def writeBlock(data: Array[Byte]): Array[Byte] = {
    require(data.length <= MaxBlockSize, "BGZF block payload > 64KiB")
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(data)
    deflater.finish()
    val cbuf = new Array[Byte](MaxBlockSize * 2)
    val clen = deflater.deflate(cbuf)
    deflater.end()
    val crc = new CRC32
    crc.update(data)
    val bsize = clen + 19 + 6 + 1
    // BSIZE is a u16: incompressible payloads near 64 KiB deflate LARGER
    // than the input (stored blocks + overhead) and would silently wrap
    // the size field — htslib caps payloads at 0xff00 for this reason
    require(bsize - 1 <= 0xffff,
      s"BGZF block serializes to $bsize bytes (> u16 BSIZE); " +
        "cap the payload near 0xff00 bytes")
    val out = java.nio.ByteBuffer.allocate(18 + clen + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x1f.toByte).put(0x8b.toByte).put(8.toByte).put(4.toByte)
    out.putInt(0) // mtime
    out.put(0.toByte).put(0xff.toByte)
    out.putShort(6.toShort) // xlen
    out.put('B'.toByte).put('C'.toByte).putShort(2.toShort)
    out.putShort((bsize - 1).toShort)
    out.put(cbuf, 0, clen)
    out.putInt(crc.getValue.toInt)
    out.putInt(data.length)
    out.array()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
}

/** InputStream over the BGZF payload from `start` until `end` (both
  * virtual positions; `end.compressedOffset` block is excluded once
  * reached at its uncompressed offset) — the reference's chunk-reader
  * state machine (`util/query.rs:87-109`) as a JVM stream. Tracks the
  * current virtual position for record-boundary bookkeeping. */
class BgzfRangeInputStream(in: Bgzf.SeekableInput,
    start: Bgzf.VirtualPosition,
    end: Option[Bgzf.VirtualPosition],
    ownsInput: Boolean = true,
    rawModeHint: Option[Boolean] = None) extends InputStream {

  private var blockOffset = start.compressedOffset
  private var block: Option[Bgzf.Block] = None
  private var posInBlock = 0

  // uncompressed BAM/BCF (`samtools -u` style): no gzip magic → serve the
  // raw bytes through pseudo-blocks; vpos degrades to (byteOffset, delta).
  // Callers sharing one seekable input across many ranges pass the probe
  // result once via rawModeHint instead of re-reading the magic per range
  private val rawMode = rawModeHint.getOrElse(!Bgzf.hasGzipMagic(in))

  loadBlock(skipTo = start.uncompressedOffset)

  private def loadBlock(skipTo: Int): Unit = {
    block =
      if (rawMode) Bgzf.readRawChunk(in, blockOffset)
      else Bgzf.readBlock(in, blockOffset)
    posInBlock = skipTo
    block match {
      case Some(b) if b.data.isEmpty && blockOffset + b.compressedSize < in.length =>
        // skip empty non-terminal blocks
        blockOffset += b.compressedSize
        loadBlock(0)
      case _ => ()
    }
  }

  /** Current virtual position (next byte to be read). */
  def virtualPosition: Bgzf.VirtualPosition =
    Bgzf.VirtualPosition(blockOffset, posInBlock)

  /** [[virtualPosition]] with an exhausted block normalized to the next
    * block's start, `(nextOffset, 0)`. Index-derived chunk begins always
    * take that form, so planners comparing a header-end position against
    * split candidates must use this one — the raw form
    * `(headerBlock, headerLen)` compares unequal to `(nextBlock, 0)`
    * even though both name the same stream position, which planned a
    * record-less leading partition per file. */
  def alignedVirtualPosition: Bgzf.VirtualPosition = block match {
    case Some(b) if posInBlock >= b.data.length =>
      Bgzf.VirtualPosition(blockOffset + b.compressedSize, 0)
    case _ => virtualPosition
  }

  private def atEnd: Boolean = end.exists { e =>
    if (rawMode)
      // raw vpos is (byteOffset, delta): the bound is an ABSOLUTE byte.
      // Comparing chunk offsets would only stop on this stream's own
      // 64 KiB grid — an end inside a chunk would be overshot and its
      // bytes served by two partitions.
      blockOffset + posInBlock >= e.compressedOffset + e.uncompressedOffset
    else
      blockOffset > e.compressedOffset ||
        (blockOffset == e.compressedOffset && posInBlock >= e.uncompressedOffset)
  }

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (atEnd) return -1
    block match {
      case None => -1
      case Some(b) =>
        if (posInBlock >= b.data.length) {
          blockOffset += b.compressedSize
          posInBlock = 0
          if (blockOffset >= in.length) { block = None; return -1 }
          // end-of-range check BEFORE decompressing the next block: a
          // range ending at (nextBlock, 0) — every index-derived split
          // point — must not inflate a full block just to discard it
          if (atEnd) { block = None; return -1 }
          loadBlock(0)
          if (block.isEmpty || atEnd) return -1
          return read(buf, off, len)
        }
        var avail = b.data.length - posInBlock
        end.foreach { e =>
          if (rawMode) {
            val endAbs = e.compressedOffset + e.uncompressedOffset
            avail = math.min(avail.toLong,
              endAbs - (blockOffset + posInBlock)).toInt
          } else if (blockOffset == e.compressedOffset)
            avail = math.min(avail, e.uncompressedOffset - posInBlock)
        }
        val n = math.min(len, avail)
        System.arraycopy(b.data, posInBlock, buf, off, n)
        posInBlock += n
        n
    }
  }

  // ownsInput=false when a multi-range reader shares one seekable input
  // across range streams; the sharer closes it once at partition end
  override def close(): Unit = if (ownsInput) in.close()
}

/** SeekableInput adapters. */
object SeekableInputs {
  def forHadoop(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Bgzf.SeekableInput = {
    val st = fs.getFileStatus(path)
    val stream = fs.open(path)
    new Bgzf.SeekableInput {
      def seek(pos: Long): Unit = stream.seek(pos)
      def readFully(buf: Array[Byte], off: Int, len: Int): Int = {
        var done = 0
        while (done < len) {
          val n = stream.read(buf, off + done, len - done)
          if (n < 0) return done
          done += n
        }
        done
      }
      def length: Long = st.getLen
      def close(): Unit = stream.close()
    }
  }

  def forLocal(path: String): Bgzf.SeekableInput = {
    val raf = new java.io.RandomAccessFile(path, "r")
    new Bgzf.SeekableInput {
      def seek(pos: Long): Unit = raf.seek(pos)
      def readFully(buf: Array[Byte], off: Int, len: Int): Int = {
        var done = 0
        while (done < len) {
          val n = raf.read(buf, off + done, len - done)
          if (n < 0) return done
          done += n
        }
        done
      }
      def length: Long = raf.length()
      def close(): Unit = raf.close()
    }
  }
}
