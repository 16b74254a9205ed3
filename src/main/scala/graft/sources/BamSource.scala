package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{CoordSystem, Region}
import graft.formats.{BamCodec, Bgzf, BgzfRangeInputStream, GenomicIndex, SeekableInputs}
import graft.formats.Bgzf.VirtualPosition
import graft.sources.common.LineSourceUtil

/** DSv2 binary BAM reader (SURVEY §2.1 S2-S6).
  *
  * Capabilities mirrored from the reference scanner
  * (`/root/reference/oxbow/src/alignment/scanner/bam.rs`):
  *  - full scan with BGZF-chunk partitioning planned from the BAI/CSI
  *    index (`partition_from_index`, `util/index.rs:117-178`) — each
  *    partition is a virtual-position range, the Spark-native form of
  *    `scan_virtual_ranges` (S6)
  *  - indexed region queries: `regions` option or pushed `rname`
  *    equality → index chunk lookup + per-record overlap re-check (S3)
  *  - `unmapped=true`: scan from the index's last mapped offset (S4)
  *  - column pruning skips decode of unneeded fields, limit pushdown,
  *    tag schema via `tags` option or sampling discovery
  *
  * Options: `tags` ("NM:i,MD:Z"), `tag_scan_rows` (default 64, 0=none),
  * `regions`, `unmapped`, `coords` ("11" default), `maxpartitionbytes`.
  */
class BamDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "bam"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = LineSourceUtil.resolvePaths(options)
    BamSource.schema(LineSourceUtil.optionsMap(options), paths)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // supportsExternalMetadata lets callers SKIP inference (e.g. a
    // catalog-supplied schema), not reorder or subset columns: the
    // decoder emits rows in FixedFields order, so a reordered user
    // schema would silently misalign every value ('rname' reading
    // qname bytes). Reject loudly; projection belongs in select().
    val fixed = BamSource.FixedFields
    val core =
      if (schema.fieldNames.lastOption.contains("tags"))
        schema.fields.dropRight(1).toSeq
      else schema.fields.toSeq
    require(core.map(f => (f.name, f.dataType)) ==
        fixed.map(f => (f.name, f.dataType)),
      "user-supplied BAM schema must match the source layout " +
        s"(${fixed.map(_.name).mkString(",")}[, tags]); got " +
        s"${schema.fieldNames.mkString(",")} — project with select() " +
        "instead of a reordered/subset schema")
    new BamTable(schema, LineSourceUtil.resolvePaths(opts),
      LineSourceUtil.optionsMap(opts))
  }
}

object BamSource {
  val FixedFields: Seq[StructField] = Seq(
    StructField("qname", StringType), StructField("flag", IntegerType),
    StructField("rname", StringType), StructField("pos", LongType),
    StructField("mapq", IntegerType), StructField("cigar", StringType),
    StructField("rnext", StringType), StructField("pnext", LongType),
    StructField("tlen", IntegerType), StructField("seq", StringType),
    StructField("qual", StringType), StructField("end", LongType))

  def schema(options: Map[String, String], paths: Seq[Path]): StructType = {
    val tagDefs: Seq[(String, Char)] = options.get("tags") match {
      case Some(spec) => SamTags.parseTagSpec(spec)
      case None =>
        val n = options.get("tag_scan_rows").map(_.toInt).getOrElse(64)
        if (n == 0) Nil else discoverTags(paths.head, n)
    }
    if (tagDefs.isEmpty) StructType(FixedFields.toIndexedSeq)
    else StructType((FixedFields :+ StructField("tags",
      StructType(tagDefs.map { case (name, c) =>
        StructField(name, SamTags.sparkType(c))
      }.toIndexedSeq))).toIndexedSeq)
  }

  /** Sample the first `scanRows` records for (tag, type) pairs. */
  private def discoverTags(path: Path, scanRows: Int): Seq[(String, Char)] = {
    val conf = graft.sources.common.GraftHadoop.conf()
    val fs = path.getFileSystem(conf)
    val in = new BgzfRangeInputStream(SeekableInputs.forHadoop(fs, path),
      VirtualPosition(0L), None)
    val seen = mutable.LinkedHashMap.empty[String, Char]
    try {
      val le = new BamCodec.LEInput(in)
      val header = BamCodec.readHeader(le)
      val _ = header
      var n = 0
      var done = false
      while (n < scanRows && !done) {
        le.tryReadInt() match {
          case None => done = true
          case Some(blockSize) =>
            val block = le.readBytes(blockSize)
            val bb = java.nio.ByteBuffer.wrap(block)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.position(8)
            val lReadName = bb.get() & 0xff
            bb.position(12)
            val nCigar = bb.getShort & 0xffff
            bb.position(16)
            val lSeq = bb.getInt
            bb.position(32 + lReadName + nCigar * 4 + (lSeq + 1) / 2 + lSeq)
            while (bb.remaining() >= 3) {
              val tag = new String(Array(bb.get(), bb.get()), "ASCII")
              val tpe = bb.get().toChar
              val code: Char = tpe match {
                case 'B' =>
                  val sub = bb.get().toChar
                  val cnt = bb.getInt
                  skipTagArray(bb, sub, cnt)
                  if (sub == 'f') 'G' else 'L'
                case other => skipTagScalar(bb, other); normalize(other)
              }
              seen.get(tag) match {
                case Some(prev) if SamTags.sparkType(prev) !=
                  SamTags.sparkType(code) => seen(tag) = 'Z'
                case Some(_) => ()
                case None => seen(tag) = code
              }
            }
            n += 1
        }
      }
    } finally in.close()
    seen.toSeq
  }

  private def normalize(c: Char): Char = c match {
    case 'c' | 'C' | 's' | 'S' | 'i' | 'I' => 'i'
    case 'A' | 'H' => 'Z'
    case other => other
  }

  private def skipTagScalar(bb: java.nio.ByteBuffer, t: Char): Unit = t match {
    case 'A' | 'c' | 'C' => bb.get()
    case 's' | 'S' => bb.getShort
    case 'i' | 'I' | 'f' => bb.getInt
    case 'Z' | 'H' => while (bb.get() != 0) ()
    case other => throw new IllegalArgumentException(s"tag type '$other'")
  }
  private def skipTagArray(bb: java.nio.ByteBuffer, t: Char, n: Int): Unit = {
    val w = t match {
      case 'c' | 'C' => 1
      case 's' | 'S' => 2
      case 'i' | 'I' | 'f' => 4
      case other => throw new IllegalArgumentException(s"B subtype '$other'")
    }
    bb.position(bb.position() + w * n)
  }
}

class BamTable(tableSchema: StructType, paths: Seq[Path],
    options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"bam:${paths.mkString(",")}"
  override def schema(): StructType = tableSchema
  // M5 catalog surface: chrom names/sizes from the header dictionary,
  // record counts from the index pseudo-bins (bam.rs:74-89).
  private lazy val tableProps =
    graft.sources.common.GraftTableProps.forPaths(paths, indexStats = true)
  override def properties(): java.util.Map[String, String] = tableProps
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new BamScanBuilder(tableSchema, paths,
      options ++ LineSourceUtil.optionsMap(o))
}

class BamScanBuilder(fullSchema: StructType, paths: Seq[Path],
    options: Map[String, String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  // verbatim Catalyst pruning, incl. nested tag pruning (parse hint only)
  private var requiredNested: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep(f.name)))
    requiredNested = requiredSchema
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("rname", _) => true
      case In("rname", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def build(): Scan =
    new BamScan(fullSchema, required, requiredNested, paths, options,
      pushed, limit)
}

/** A BAM partition: one or more record-aligned virtual-position ranges
  * of one file (region queries pack scattered index chunks into shared
  * partitions — `GenomicIndex.packRanges`), with optional residual
  * region list (0-based half-open) to re-check per record.
  * `unmappedOnly` keeps only flag-0x4 records — the tail scan starts at
  * the last indexed offset, but an index-less file scans everything and
  * sorted BAMs can interleave mate-placed unmapped reads with mapped
  * ones, so the flag is the authoritative filter (mirrors CramSource). */
case class BamInputPartition(pathStr: String, ranges: Seq[(Long, Long)],
    regions: Seq[(String, Long, Long)],
    unmappedOnly: Boolean = false) extends InputPartition

class BamScan(fullSchema: StructType, required: StructType,
    requiredNested: StructType, paths: Seq[Path],
    options: Map[String, String], pushed: Array[Filter], limit: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-bam ${paths.mkString(",")}" +
    (if (pushed.nonEmpty) s" pushed=[${pushed.mkString(",")}]" else "")

  private def parseRegions: Seq[Region] = {
    val fromOption =
      graft.sources.common.LineSourceUtil.parseRegionsOption(options)
    // null comparands never match — drop them instead of NPE-ing the
    // planner (isin("chr1", null) pushes an In containing null)
    val fromFilters: Seq[Region] = pushed.toSeq.flatMap {
      case EqualTo("rname", v) if v != null =>
        Seq(Region(v.toString, 0L, None))
      case In("rname", vs) =>
        vs.toSeq.filter(_ != null).map(v => Region(v.toString, 0L, None))
      case _ => Nil
    }
    // regions option takes precedence (more specific)
    if (fromOption.nonEmpty) fromOption else fromFilters
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = graft.sources.common.GraftHadoop.conf()
    val unmappedOnly = options.get("unmapped").exists(_.toBoolean)
    val regions = parseRegions

    // caller-precomputed virtual-position ranges (scan_virtual_ranges,
    // `alignment/scanner/bam.rs:263-279`): bounds must be record starts.
    // Handled before any file-status lookup — this path needs no
    // lengths, so it stays RPC-free at planning time.
    val explicit = options.get("virtual_ranges").toSeq
      .flatMap(_.split(";").toSeq.map(_.trim).filter(_.nonEmpty))
      .map { s =>
        val Array(a, b) = s.split("-")
        (a.trim.toLong, b.trim.toLong)
      }
    if (explicit.nonEmpty) {
      // explicit vpos ranges address one file's offsets; replaying them
      // per path would scan other files mid-record
      require(paths.lengthCompare(1) == 0,
        s"virtual_ranges address a single file's offsets; " +
          s"got ${paths.length} resolved paths")
      // the expert ranges pick the BYTES to scan, but regions/unmapped
      // remain row predicates — silently dropping them returned mapped
      // (or out-of-region) records against the caller's explicit ask
      val residual = regions.map(r =>
        (r.name, r.start, r.end.getOrElse(Long.MaxValue)))
      return paths.flatMap(p => explicit.map { case (a, b) =>
        BamInputPartition(p.toString, Seq((a, b)), residual,
          unmappedOnly = unmappedOnly)
      }).toArray
    }

    val (pathLens, maxSplit) = graft.sources.common.LineSourceUtil
      .pathLensAndBudget(paths, conf, options, 64L * 1024 * 1024)
    pathLens.flatMap { case (p, fileLen) =>
      val fs = p.getFileSystem(conf)
      val index = GenomicIndex.findFor(fs, p)
      // ONE header read per file serves every branch: the parsed
      // header (region refId resolution) and the header-end vpos =
      // first record boundary. The indexed-region branch used to open
      // a second stream for the same header — two opens + seeks +
      // inflates per file at planning time, a remote GET each on
      // object stores.
      val si = SeekableInputs.forHadoop(fs, p)
      val (header, headEnd) = try {
        val s = new BgzfRangeInputStream(si, VirtualPosition(0L), None)
        val h = BamCodec.readHeader(new BamCodec.LEInput(s))
        // aligned: an exhausted header block reports the NEXT block start,
        // matching index-derived split points so no empty leading
        // partition is planned
        (h, s.alignedVirtualPosition)
      } finally si.close()
      val eof = VirtualPosition(fileLen, 0)

      if (unmappedOnly) {
        // start after the last indexed (mapped) chunk; prefer the metadata
        // pseudo-bin's record-span end (what samtools writes it for), fall
        // back to the max real chunk end for minimal indexes
        val lastMapped = index.flatMap { ix =>
          ix.refs.iterator.flatMap(_.metadata.map(_.offEnd.value)).maxOption
            .orElse(ix.refs.iterator
              .flatMap(_.bins.valuesIterator.flatMap(_.chunks.map(_.end.value)))
              .maxOption)
        }.map(VirtualPosition(_)).getOrElse(headEnd)
        Seq(BamInputPartition(p.toString, Seq((lastMapped.value, eof.value)),
          Nil, unmappedOnly = true))
      } else if (regions.nonEmpty && index.isDefined) {
        // S3: indexed region query — resolve chrom → refId via the
        // already-read header
        val refIds = header.refNames.zipWithIndex.toMap
        // resolve every region, union + merge the chunk lists, and attach
        // the FULL region list as each partition's residual — per-region
        // partitions double-emit records when regions share a bin or a
        // record overlaps two query regions
        val resolved = regions.flatMap { r =>
          refIds.get(r.name).map { refId =>
            val endPos = r.end.getOrElse(
              header.refLengths(refId).toLong.max(r.start + 1))
            (refId, r.name, r.start, endPos)
          }
        }
        // coalesce near-adjacent chunks into few bounded ranges (the
        // residual predicate drops gap records — µs of decode for
        // hundreds fewer tasks), then pack the survivors into
        // multi-range partitions so the task count follows data volume,
        // not BAI chunk scatter
        val chunks = GenomicIndex.coalesceChunks(resolved.flatMap {
          case (refId, _, s, e) => index.get.query(refId, s, e)
        }, gapBytes = 1L << 20, spanBytes = maxSplit)
        val residual = resolved.map { case (_, n, s, e) => (n, s, e) }
        GenomicIndex.packRanges(chunks, maxSplit).map { group =>
          BamInputPartition(p.toString,
            group.map(ch => (ch.begin.value, ch.end.value)), residual)
        }
      } else {
        // full scan: split at index-derived record boundaries (R1)
        val splits = index.map(GenomicIndex.partitionFromIndex(_, maxSplit))
          .getOrElse(Nil)
          .filter(v => v.value > headEnd.value && v.compressedOffset < fileLen)
        val bounds = (headEnd +: splits) :+ eof
        bounds.sliding(2).collect {
          case Seq(a, b) if a.value < b.value =>
            BamInputPartition(p.toString, Seq((a.value, b.value)),
              regions.map(r => (r.name, r.start,
                r.end.getOrElse(Long.MaxValue))))
        }.toSeq
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BamReaderFactory(fullSchema, required, requiredNested, options, limit)
}

class BamReaderFactory(fullSchema: StructType, required: StructType,
    requiredNested: StructType,
    options: Map[String, String], limit: Int) extends PartitionReaderFactory {

  /** Columnar reads (SURVEY §4.2), opt-in via `columnar=true`: every
    * fixed BAM column is a primitive or string, so any projection
    * excluding the `tags` struct can batch into `OnHeapColumnVector`s.
    * Off by default on measurement: record decode dominates and stock
    * Spark re-materializes rows at ColumnarToRow, so the batch copy is
    * pure overhead. Round-10 A/B at bench scale (345 MB BAM,
    * qname..cigar projection, min of interleaved passes, local[32],
    * x01-x04 in BENCH_r10/bench_out): columnar NEVER wins — +8-21% on
    * an idle heap, and up to 3× on the 32-way split scan inside the
    * full 73-row bench run, where 32 concurrent tasks' per-batch
    * OnHeapColumnVector allocation meets an already-busy heap; the
    * columnar plan also pays a much larger first-use codegen warmup
    * (4-7 s vs <1 s cold). Row stays the default; the path is the
    * integration surface for vector-consuming engines that elide
    * ColumnarToRow — the in-tree consumer is
    * `ArrowShim.toIpcBytesColumnar` (round 11), which serializes the
    * batches to Arrow IPC executor-side with no row round-trip and
    * beats the row-path sink ~5.6× at bench scale. */
  private val columnarOk: Boolean =
    graft.sources.common.RangeStreams.columnarEligible(options, required)

  override def supportColumnarReads(p: InputPartition): Boolean = columnarOk

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BamPartitionReader(fullSchema, required, requiredNested, options, limit,
      p.asInstanceOf[BamInputPartition])

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new graft.sources.common.ColumnarRowBatcher(
      new BamPartitionReader(fullSchema, required, requiredNested, options, limit,
        p.asInstanceOf[BamInputPartition]), required)
}

class BamPartitionReader(fullSchema: StructType, required: StructType,
    requiredNested: StructType,
    options: Map[String, String], limit: Int, part: BamInputPartition)
    extends PartitionReader[InternalRow] {

  private val conf = graft.sources.common.GraftHadoop.conf()
  private val path = new Path(part.pathStr)
  private val fs = path.getFileSystem(conf)

  // read the header through a separate stream (ref name dictionary)
  private val header = {
    val si = SeekableInputs.forHadoop(fs, path)
    try {
      val s = new BgzfRangeInputStream(si, VirtualPosition(0L), None)
      BamCodec.readHeader(new BamCodec.LEInput(s))
    } finally si.close()
  }

  // ranges are record-aligned, so lazily concatenating one BGZF range
  // stream per range yields a single contiguous record stream
  // (graft.sources.common.RangeStreams — opens each range when reached,
  // closes only the open one)
  private val stream: java.io.InputStream =
    graft.sources.common.RangeStreams.bgzfRanges(fs, path, part.ranges)
  private val le = new BamCodec.LEInput(stream)

  private val tagSchema: Option[StructType] =
    if (fullSchema.fieldNames.contains("tags"))
      Some(fullSchema("tags").dataType.asInstanceOf[StructType])
    else None
  private val need: Array[Boolean] = {
    val req = required.fieldNames.toSet
    // region re-check needs rname/pos/end regardless of projection
    // NOTE: the region residual reads RawRecord.refId/pos0/refLen,
    // which the decoder extracts unconditionally — region checks need
    // no column materialization, so `req` is used as-is
    BamSource.FixedFields.map(f => req(f.name)).toArray
  }
  private val coords =
    CoordSystem.fromCode(options.getOrElse("coords", "11"))
  private val decoder = new BamCodec.RecordDecoder(header, tagSchema, need,
    posShift = coords match {
      case CoordSystem.OneBasedClosed => 0L
      case CoordSystem.ZeroBasedHalfOpen => -1L
    },
    parseTags = required.fieldNames.contains("tags"),
    neededTags = graft.sources.common.LineSourceUtil
      .nestedStruct(requiredNested, "tags").map(_.fieldNames.toSet))

  private val refIdByName = header.refNames.zipWithIndex.toMap
  private val regionsById: Seq[(Int, Long, Long)] = part.regions.flatMap {
    case (name, s, e) => refIdByName.get(name).map(id => (id, s, e))
  }
  // flat arrays for the per-record residual check: Seq.exists allocated
  // an iterator + closure per record (r14 JIT-stability audit)
  private val regionIds: Array[Int] = regionsById.map(_._1).toArray
  private val regionStarts: Array[Long] = regionsById.map(_._2).toArray
  private val regionEnds: Array[Long] = regionsById.map(_._3).toArray

  private val projIdx: Array[Int] =
    required.fieldNames.map(fullSchema.fieldIndex)
  private val identityProj = projIdx.sameElements(fullSchema.indices)

  private var current: InternalRow = _
  private var emitted = 0

  // htslib bam_endpos convention: zero-reference-length records (no
  // CIGAR, all-clip/insert) span length 1
  private def overlapsAnyRegion(rec: BamCodec.RawRecord): Boolean = {
    var i = 0
    while (i < regionIds.length) {
      if (rec.refId == regionIds(i) && rec.pos0 < regionEnds(i) &&
          (rec.pos0 + math.max(rec.refLen, 1L)) > regionStarts(i))
        return true
      i += 1
    }
    false
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (true) {
      val rec = decoder.read(le)
      if (rec == null) return false
      val keep = (!part.unmappedOnly || (rec.flag & 0x4) != 0) &&
        (regionIds.length == 0 || overlapsAnyRegion(rec))
      if (keep) {
        current =
          if (identityProj) rec.row
          else {
            val out = new Array[Any](projIdx.length)
            var i = 0
            while (i < projIdx.length) {
              val idx = projIdx(i)
              out(i) = if (rec.row.isNullAt(idx)) null
                else rec.row.get(idx, fullSchema(idx).dataType)
              i += 1
            }
            new GenericInternalRow(out)
          }
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
