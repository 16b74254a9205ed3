package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Region
import graft.formats.{Bgzf, FaiIndex, GziIndex, SeekableInputs}
import graft.sources.common.{GraftHadoop, LineSourceUtil}

/** Interval → sequence bridge operators — the bedtools `getfasta` /
  * `nuc` analogues, joining the interval algebra to the FAI-indexed
  * FASTA machinery ([[graft.sources.FastaFaiSource]] is the
  * literal-region scan; these take the regions from a DATAFRAME).
  * Reference analogue: the seek-based subsequence extraction of
  * `/root/reference/oxbow/src/sequence/scanner/fasta.rs:105-121`,
  * which the reference only exposes for caller-supplied region
  * strings — the frame-driven join is downstream-engine territory it
  * leaves open. */
object SequenceOps {

  /** IUPAC complement alphabet for the bedtools `-s` reverse
    * complement, both cases (W/S/N and their lowercase forms are
    * self-complementary and need no entry; unknown characters pass
    * through unchanged, bedtools' own behavior). */
  private val CompFrom = "ACGTUMRYKVHDBacgtumrykvhdb"
  private val CompTo   = "TGCAAKYRMBDHVtgcaakyrmbdhv"

  /** Codegen'd reverse complement of a sequence column — a
    * `translate` (the IUPAC complement) under a `reverse`, no UDF. */
  def reverseComplement(seq: Column): Column =
    reverse(translate(seq, CompFrom, CompTo))

  /** Per-interval sequence extraction — the bedtools `getfasta`
    * analogue: every input row gains the FASTA bases its
    * (chrom, start, end) covers, via .fai byte math (bgzipped FASTA
    * through the .gzi block map), never materializing a contig.
    *
    * Contract: coordinates clamp into [0, sequence length]; inverted
    * or fully-out-of-range rows get an EMPTY sequence (bedtools
    * errors; a clamp composes better with [[IntervalOps.slop]]-style
    * upstream arithmetic). Null chrom/coords drop (family policy);
    * rows naming a sequence ABSENT from the index DROP with the same
    * rationale as [[IntervalOps.shuffleIntervals]]'s missing-size
    * rule — bedtools warns per line, a bulk engine cannot. All other
    * columns pass through.
    *
    * Scale shape: NO shuffle — one broadcast of the O(contigs) .fai
    * entry map, then a narrow per-partition pass where each task
    * opens the file once (closed via task-completion listener) and
    * seeks per row. Callers whose intervals are randomly ordered can
    * `repartitionByRange(chrom, start)` upstream to make each task's
    * seeks near-sequential; the operator does not force that shuffle.
    * Per-slice cost is bytes-proportional ([[FaiIndex.slice]]'s 2 GiB
    * single-slice bound applies).
    *
    * Options (bedtools parity, both codegen'd projections over the
    * fetched bases — no new I/O):
    *  - `strand` (bedtools `-s`): name of a strand column; rows whose
    *    strand is `'-'` get the IUPAC reverse complement of the
    *    fetched bases ([[reverseComplement]]). Every other value
    *    (`'+'`, `'.'`, null, anything else) leaves the bases as-is,
    *    exactly bedtools' rule ("if the feature occupies the antisense
    *    strand"). Coordinates are untouched — only the base string
    *    flips.
    *  - `name` (bedtools `-name`) / `emitHeader`: adds a
    *    `fasta_header` string column carrying the header bedtools
    *    would write: `chrom:start-end` (plain), with `name` set
    *    `name::chrom:start-end` (bedtools ≥2.26 `-name`), and when
    *    `strand` is also set a `(+)`/`(-)`/`(.)` suffix (null strand
    *    renders `(.)`, bedtools' unknown-strand dot). `name != null`
    *    implies the header column.
    *  - `blockStarts`/`blockSizes` (bedtools `-split`, the BED12
    *    spliced-transcript rule): names of two integral-array columns
    *    — block start offsets RELATIVE to the row's `start` and block
    *    lengths, pairwise by position. The row's sequence becomes the
    *    CONCATENATION of the blocks' bases in array order, sliced in
    *    the same narrow per-partition pass (still no shuffle, one
    *    seek per block). A row whose arrays are null (a non-BED12
    *    row in a mixed frame) falls back to the whole-interval slice;
    *    index `i` pairs exhaust at the shorter array (malformed rows
    *    degrade, they do not throw mid-job). With `strand`, the
    *    reverse complement applies to the CONCATENATED sequence —
    *    bedtools' minus-strand transcript rule. */
  def getFasta(df: DataFrame, fastaPath: String,
      chrom: String = "chrom", start: String = "start",
      end: String = "end", seqCol: String = "sequence",
      strand: String = null, name: String = null,
      emitHeader: Boolean = false,
      blockStarts: String = null, blockSizes: String = null): DataFrame = {
    require((blockStarts == null) == (blockSizes == null),
      "getFasta -split needs BOTH blockStarts and blockSizes")
    val session = df.sparkSession
    require(!df.columns.exists(_.equalsIgnoreCase(seqCol)),
      s"getFasta output column '$seqCol' collides with an input column")
    val p = new Path(fastaPath)
    val conf = GraftHadoop.conf()
    val entries = FaiIndex.readFor(p, conf).getOrElse(
      throw new IllegalArgumentException(
        s"getFasta needs a .fai index next to $fastaPath"))
    val gzi = LineSourceUtil.isGzip(p)
    val bc = session.sparkContext.broadcast(
      entries.map(e => e.name -> e).toMap)
    val pruned = df.where(col(chrom).isNotNull &&
      col(start).isNotNull && col(end).isNotNull)
    val schema = pruned.schema
    val cIdx = schema.fieldIndex(chrom)
    val sIdx = schema.fieldIndex(start)
    val eIdx = schema.fieldIndex(end)
    val fieldTypes = schema.fields.map(_.dataType)
    val n = fieldTypes.length
    // INTEGRAL coordinates, the family rule (a fractional coordinate
    // has no byte offset); widened per-row below
    Seq(sIdx, eIdx).foreach { i =>
      require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(fieldTypes(i)),
        s"getFasta requires integral coordinates, got " +
          fieldTypes(i).simpleString)
    }
    def longAt(r: InternalRow, i: Int): Long = fieldTypes(i) match {
      case org.apache.spark.sql.types.LongType => r.getLong(i)
      case org.apache.spark.sql.types.IntegerType => r.getInt(i).toLong
      case org.apache.spark.sql.types.ShortType => r.getShort(i).toLong
      case _ => r.getByte(i).toLong
    }
    // -split: resolve the block-array columns once; element types are
    // validated here (an analysis-time error, not a task crash)
    val split: Option[(Int, Int,
        org.apache.spark.sql.types.DataType,
        org.apache.spark.sql.types.DataType)] =
      if (blockStarts == null) None
      else {
        val integral = Set[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType)
        val pair = Seq(blockStarts, blockSizes).map { c =>
          schema(c).dataType match {
            case org.apache.spark.sql.types.ArrayType(et, _)
              if integral.contains(et) => (schema.fieldIndex(c), et)
            case other => throw new IllegalArgumentException(
              s"getFasta -split needs integral-array columns, got " +
                s"$c: ${other.simpleString}")
          }
        }
        Some((pair(0)._1, pair(1)._1, pair(0)._2, pair(1)._2))
      }
    def elemLong(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        i: Int, et: org.apache.spark.sql.types.DataType): Long =
      et match {
        case org.apache.spark.sql.types.LongType => arr.getLong(i)
        case org.apache.spark.sql.types.IntegerType => arr.getInt(i).toLong
        case org.apache.spark.sql.types.ShortType => arr.getShort(i).toLong
        case _ => arr.getByte(i).toLong
      }
    val outSchema = schema.add(seqCol, StringType)
    val pathStr = fastaPath
    val rdd = pruned.queryExecution.toRdd.mapPartitions { it =>
      // one lazily-opened handle per task, closed with the task (not
      // on iterator exhaustion — a downstream limit() may not drain)
      var in: Bgzf.SeekableInput = null
      def input(): Bgzf.SeekableInput = {
        if (in == null) {
          val path = new Path(pathStr)
          val hconf = GraftHadoop.conf()
          val raw = SeekableInputs.forHadoop(
            path.getFileSystem(hconf), path)
          in =
            if (!gzi) raw
            else {
              val idx =
                try GziIndex.readFor(path, hconf).getOrElse(
                  throw new IllegalStateException(
                    s"missing .gzi for $pathStr"))
                catch { case e: Throwable => raw.close(); throw e }
              new GziIndex.UncompressedView(raw, idx)
            }
          Option(TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => in.close()))
        }
        in
      }
      it.flatMap { r =>
        val name = String.valueOf(r.get(cIdx, fieldTypes(cIdx)))
        bc.value.get(name) match {
          case None => None // sequence not in the index: row drops
          case Some(entry) =>
            def sliceAbs(a: Long, b: Long): String = {
              val s0 = math.max(0L, a)
              val e0 = math.max(s0, b)
              FaiIndex.slice(input(), entry, Region(name, s0, Some(e0)))
            }
            val seq = split match {
              case Some((bsI, szI, bsT, szT))
                if !r.isNullAt(bsI) && !r.isNullAt(szI) =>
                val base = longAt(r, sIdx)
                val bs = r.getArray(bsI)
                val sz = r.getArray(szI)
                val m = math.min(bs.numElements(), sz.numElements())
                val sb = new StringBuilder
                var k = 0
                while (k < m) {
                  if (!bs.isNullAt(k) && !sz.isNullAt(k)) {
                    val abs = base + elemLong(bs, k, bsT)
                    sb.append(sliceAbs(abs, abs + elemLong(sz, k, szT)))
                  }
                  k += 1
                }
                sb.toString
              case _ =>
                sliceAbs(longAt(r, sIdx), longAt(r, eIdx))
            }
            val vals = new Array[Any](n + 1)
            var i = 0
            while (i < n) {
              vals(i) = if (r.isNullAt(i)) null else r.get(i, fieldTypes(i))
              i += 1
            }
            vals(n) = UTF8String.fromString(seq)
            Some(new GenericInternalRow(vals): InternalRow)
        }
      }
    }
    val fetched = PlanShim.internalCreateDataFrame(session, rdd, outSchema)
    val stranded =
      if (strand == null) fetched
      else fetched.withColumn(seqCol,
        when(col(strand) === "-", reverseComplement(col(seqCol)))
          .otherwise(col(seqCol)))
    if (name == null && !emitHeader) stranded
    else {
      require(!df.columns.exists(_.equalsIgnoreCase("fasta_header")),
        "getFasta header output column 'fasta_header' collides with " +
          "an input column")
      val coords = concat(col(chrom).cast("string"), lit(":"),
        col(start).cast("string"), lit("-"), col(end).cast("string"))
      val base =
        if (name == null) coords
        else concat(col(name).cast("string"), lit("::"), coords)
      val header =
        if (strand == null) base
        else concat(base, lit("("),
          coalesce(col(strand).cast("string"), lit(".")), lit(")"))
      stranded.withColumn("fasta_header", header)
    }
  }

  /** Per-interval nucleotide composition — the bedtools `nuc`
    * analogue over [[getFasta]]'s output: AT/GC fractions and the
    * A/C/G/T/N counts (case-insensitive; `n_other` covers IUPAC
    * ambiguity codes). `pct_at`/`pct_gc` are null for empty
    * sequences (bedtools prints 0 there; null marks "no bases" more
    * honestly and is what the gate pins).
    *
    * Scale shape: [[getFasta]]'s narrow pass plus codegen'd string
    * projections — counting by length-difference of single-character
    * removals, no UDF, no regex.
    *
    * `strand` (bedtools `nuc -s`): counts report the reverse
    * complement for `'-'`-strand rows — A and T swap, C and G swap,
    * `seq_len`/`pct_at`/`pct_gc` are invariant (the complement is a
    * base-class bijection), matching bedtools' "profile the sequence
    * as transcribed" semantics. The engine never MATERIALIZES the
    * reverse-complement string: counts run over the plus-strand
    * bases and the complementary COLUMNS swap for `'-'` rows (exact
    * under the full [[reverseComplement]] IUPAC map — a lone `U`
    * complements to `A`, hence the extra U count folded into `n_a`;
    * every other ambiguity code complements within the `n_other`
    * class, and `n_other` is derived from the emitted columns). */
  def nucContent(df: DataFrame, fastaPath: String,
      chrom: String = "chrom", start: String = "start",
      end: String = "end", strand: String = null): DataFrame = {
    val withSeq = getFasta(df, fastaPath, chrom, start, end,
      seqCol = "__nuc_seq")
    val up = upper(col("__nuc_seq"))
    val total = length(up).cast("long")
    def cnt(ch: String) =
      (length(up) - length(translate(up, ch, ""))).cast("long")
    val (a, c, g, t, nn) = (cnt("A"), cnt("C"), cnt("G"), cnt("T"),
      cnt("N"))
    val (na, nc, ng, nt) =
      if (strand == null) (a, c, g, t)
      else {
        val minus = col(strand) === "-"
        (when(minus, t + cnt("U")).otherwise(a),
          when(minus, g).otherwise(c),
          when(minus, c).otherwise(g),
          when(minus, a).otherwise(t))
      }
    withSeq
      .withColumn("seq_len", total)
      .withColumn("n_a", na).withColumn("n_c", nc)
      .withColumn("n_g", ng).withColumn("n_t", nt)
      .withColumn("n_n", nn)
      .withColumn("n_other",
        total - col("n_a") - col("n_c") - col("n_g") - col("n_t") -
          col("n_n"))
      .withColumn("pct_at",
        when(total > 0L, (col("n_a") + col("n_t")).cast("double") /
          total.cast("double")))
      .withColumn("pct_gc",
        when(total > 0L, (col("n_c") + col("n_g")).cast("double") /
          total.cast("double")))
      .drop("__nuc_seq")
  }
}
