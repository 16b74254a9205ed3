package graft.formats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** bgzip .gzi index: pairs of (compressed offset, uncompressed offset),
  * one per BGZF block after the first, enabling random access into the
  * UNCOMPRESSED content of a bgzipped file. This is what backs the
  * reference's seek-based slicing of bgzipped FASTA
  * (`/root/reference/oxbow/src/sequence/scanner/fasta.rs:105-121`).
  * Format per the bgzip documentation: little-endian u64 count, then
  * count (u64, u64) pairs.
  */
object GziIndex {

  /** (compressedOffset, uncompressedOffset), ascending; the implicit
    * first block (0, 0) is NOT stored in the file but is prepended here. */
  final case class Index(entries: IndexedSeq[(Long, Long)]) {
    /** Compressed offset of the block containing uncompressed `uoff`,
      * plus the uncompressed offset that block starts at. */
    def blockFor(uoff: Long): (Long, Long) = {
      var lo = 0
      var hi = entries.size - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (entries(mid)._2 <= uoff) lo = mid else hi = mid - 1
      }
      entries(lo)
    }
  }

  def parse(bytes: Array[Byte]): Index = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong.toInt
    val entries = (0 until n).map(_ => (bb.getLong, bb.getLong))
    Index(((0L, 0L) +: entries).toIndexedSeq)
  }

  // per-JVM parsed-index cache keyed by (path, size, mtime): one FAI
  // slice query plans one partition per (sequence x region), and every
  // FaiSliceReader on an executor would otherwise re-download and
  // re-parse the same ~16-bytes-per-64KB-block index (easily more
  // index I/O than sequence I/O on thousand-slice queries). The
  // (size, mtime) key invalidates naturally when the file changes;
  // bounded so a long-lived executor touching many genomes cannot
  // grow it without limit.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Index]()
  private val CacheMax = 64

  def readFor(dataPath: Path, conf: Configuration): Option[Index] = {
    val gzi = new Path(dataPath.toString + ".gzi")
    val fs = gzi.getFileSystem(conf)
    // ONE metadata RPC: exists + getFileStatus would double the
    // namenode/object-store round-trips on every executor-side call,
    // cache hit or not
    val stOpt =
      try Some(fs.getFileStatus(gzi))
      catch { case _: java.io.FileNotFoundException => None }
    stOpt.flatMap { st =>
      val key = (gzi.toString, st.getLen, st.getModificationTime)
      Option(cache.get(key)).orElse {
        val in = fs.open(gzi)
        val idx = try {
          val bytes = new Array[Byte](st.getLen.toInt)
          in.readFully(bytes)
          parse(bytes)
        } finally in.close()
        // evict ONE arbitrary entry at capacity, never clear(): a full
        // wipe under concurrent readers near the cap thundering-herds
        // the re-download of every index the cache exists to keep
        if (cache.size >= CacheMax) {
          val it = cache.keySet.iterator
          if (it.hasNext) { it.next(); it.remove() }
        }
        cache.put(key, idx)
        Some(idx)
      }
    }
  }

  /** A [[Bgzf.SeekableInput]] view of the UNCOMPRESSED content of a
    * bgzipped file, seeking through the .gzi block map. Lets the FAI
    * byte math run unchanged over plain or bgzipped FASTA. Reads only
    * the blocks covering the requested ranges. */
  final class UncompressedView(in: Bgzf.SeekableInput, index: Index)
      extends Bgzf.SeekableInput {
    private var pos = 0L
    // one-block cache: consecutive reads within a slice hit it
    private var cached: Option[(Long, Bgzf.Block)] = None // (ustart, block)

    override def seek(p: Long): Unit = pos = p

    override def readFully(buf: Array[Byte], off: Int, len: Int): Int = {
      var done = 0
      while (done < len) {
        val block = cached match {
          case Some((ustart, b))
            if pos >= ustart && pos < ustart + b.data.length => (ustart, b)
          case _ =>
            val (coff, ustart) = index.blockFor(pos)
            var c = coff
            var u = ustart
            var blk = Bgzf.readBlock(in, c).getOrElse(return done)
            // walk forward past any blocks the index is too coarse for.
            // A mid-file EMPTY block (bgzip flush boundary) is legal and
            // must be walked THROUGH, not treated as end-of-data: the
            // loop still progresses because c advances by its
            // compressedSize (>= 28 bytes), and true EOF terminates via
            // readBlock returning None
            while (pos >= u + blk.data.length) {
              c += blk.compressedSize
              u += blk.data.length
              blk = Bgzf.readBlock(in, c).getOrElse(return done)
            }
            cached = Some((u, blk))
            (u, blk)
        }
        val (ustart, b) = block
        val inBlock = (pos - ustart).toInt
        val n = math.min(len - done, b.data.length - inBlock)
        if (n <= 0) return done
        System.arraycopy(b.data, inBlock, buf, off + done, n)
        pos += n
        done += n
        if (pos >= ustart + b.data.length) cached = None
      }
      done
    }

    override def length: Long = Long.MaxValue // uncompressed size unknown
    override def close(): Unit = in.close()
  }
}
