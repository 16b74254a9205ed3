package graft.sources.common

import java.io.InputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

/** Lazily concatenates a sequence of input streams: each opens only when
  * the read position reaches it, and `close()` closes ONLY the stream
  * currently open.
  *
  * Exists because `java.io.SequenceInputStream.close()` drains its
  * enumeration, instantiating every remaining stream just to close it —
  * for BGZF range streams that constructor cost is a file open, a seek
  * and a block inflate per unread range, so closing a partially-read
  * multi-range partition (e.g. a `limit`/`show` over a packed region
  * query) would pay hundreds of pointless opens (remote GETs on object
  * stores). */
final class LazyConcatInputStream(parts: Iterator[() => InputStream])
    extends InputStream {
  private var cur: InputStream = _
  private var closed = false
  private val one = new Array[Byte](1)

  /** Close the current stream and open the next; false at exhaustion. */
  private def advance(): Boolean = {
    if (cur != null) { cur.close(); cur = null }
    if (parts.hasNext) { cur = parts.next()(); true } else false
  }

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (closed) return -1
    if (len == 0) return 0
    var out = -1
    var looping = true
    while (looping) {
      if (cur == null && !advance()) looping = false
      else {
        val n = cur.read(b, off, len)
        if (n > 0) { out = n; looping = false }
        else if (!advance()) looping = false
      }
    }
    out
  }

  override def close(): Unit = {
    closed = true
    if (cur != null) { cur.close(); cur = null }
  }
}

/** Shared plumbing for multi-range partition readers and the columnar
  * batch path (one definition — the BAM/BCF/text readers must not
  * drift apart). */
object RangeStreams {

  /** One contiguous record stream over record-aligned (startVpos,
    * endVpos) ranges of a BGZF file, each range's stream opened lazily
    * when reached. */
  def bgzfRanges(fs: FileSystem, path: Path,
      ranges: Seq[(Long, Long)]): InputStream =
    new LazyConcatInputStream(ranges.iterator.map { case (a, b) => () =>
      new graft.formats.BgzfRangeInputStream(
        graft.formats.SeekableInputs.forHadoop(fs, path),
        graft.formats.Bgzf.VirtualPosition(a),
        Some(graft.formats.Bgzf.VirtualPosition(b))): InputStream
    })

  /** Columnar-read eligibility shared by the reader factories: opt-in
    * (`columnar=true` — off by default, see the factories' measurement
    * notes) and a flat primitive/string projection. */
  def columnarEligible(options: Map[String, String],
      required: StructType): Boolean =
    options.getOrElse("columnar", "false").toBoolean &&
      required.fields.nonEmpty &&
      required.fields.forall(_.dataType match {
        case LongType | IntegerType | DoubleType | FloatType |
             BooleanType | StringType => true
        case _ => false
      })
}
