package graft.formats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.core.Region

/** FASTA .fai index: per-sequence (length, byte offset, bases per line,
  * bytes per line), enabling O(1) seek-based subsequence slicing — the
  * fast path behind the reference's FASTA region queries
  * (`/root/reference/oxbow/src/sequence/scanner/fasta.rs:105-121`).
  * Format per the samtools faidx documentation.
  */
object FaiIndex {

  final case class Entry(name: String, length: Long, offset: Long,
      lineBases: Long, lineWidth: Long)

  def parse(text: String): Seq[Entry] =
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val c = line.split("\t")
      require(c.length >= 5, s"malformed .fai line: '$line'")
      Entry(c(0), c(1).toLong, c(2).toLong, c(3).toLong, c(4).toLong)
    }.toSeq

  // per-JVM parsed-index cache keyed by (path, size, mtime) — same
  // scheme as GziIndex: getTable probes every .fai to pick the fast
  // path and planInputPartitions re-reads it moments later; on object
  // stores those are redundant GETs for a file that cannot have
  // changed between the two calls. Single-entry eviction at capacity.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Seq[Entry]]()
  private val CacheMax = 64

  def readFor(fastaPath: Path, conf: Configuration): Option[Seq[Entry]] = {
    val fai = new Path(fastaPath.toString + ".fai")
    val fs = fai.getFileSystem(conf)
    // ONE metadata RPC: exists + getFileStatus would double the
    // round-trips on every call
    val stOpt =
      try Some(fs.getFileStatus(fai))
      catch { case _: java.io.FileNotFoundException => None }
    stOpt.flatMap { st =>
      val key = (fai.toString, st.getLen, st.getModificationTime)
      Option(cache.get(key)).orElse {
        val in = fs.open(fai)
        val entries = try {
          val bytes = new Array[Byte](st.getLen.toInt)
          in.readFully(bytes)
          parse(new String(bytes, "UTF-8"))
        } finally in.close()
        if (cache.size >= CacheMax) {
          val it = cache.keySet.iterator
          if (it.hasNext) { it.next(); it.remove() }
        }
        cache.put(key, entries)
        Some(entries)
      }
    }
  }

  /** Byte offset of 0-based base `pos` within the entry's sequence. */
  def byteOffset(e: Entry, pos: Long): Long =
    e.offset + (pos / e.lineBases) * e.lineWidth + (pos % e.lineBases)

  /** Seek-based slice of [region.start, region.end) — reads only the
    * bytes covering the requested bases, never the whole record. */
  def slice(in: Bgzf.SeekableInput, e: Entry, region: Region): String = {
    val start = math.min(region.start, e.length)
    val end = math.min(region.end.getOrElse(e.length), e.length)
    if (end <= start) return ""
    val byteStart = byteOffset(e, start)
    val byteEnd = byteOffset(e, end - 1) + 1
    val span = byteEnd - byteStart
    // one slice materializes in one array: the JVM caps that near
    // Int.MaxValue, so fail loudly instead of letting .toInt wrap into
    // a small positive size (silent truncation) or a negative one
    require(span > 0 && span <= Int.MaxValue - 8,
      s"FASTA slice ${e.name}:$start-$end spans $span bytes — " +
        "split the region below 2 GiB per slice")
    val buf = new Array[Byte](span.toInt)
    in.seek(byteStart)
    val got = in.readFully(buf, 0, buf.length)
    // readFully returns SHORT at EOF by contract: a stale .fai over a
    // truncated FASTA (or a short BGZF view) would otherwise pad the
    // sequence with NULs delivered as a successful row
    require(got == buf.length,
      s"short read slicing ${e.name}:$start-$end — wanted ${buf.length} " +
        s"bytes at offset $byteStart, got $got (truncated FASTA or " +
        "stale .fai?)")
    val sb = new java.lang.StringBuilder((end - start).toInt)
    var i = 0
    while (i < buf.length) { // hand-rolled: foreach boxes every byte
      val b = buf(i)
      if (b != '\n' && b != '\r') sb.append(b.toChar)
      i += 1
    }
    sb.toString
  }
}

/** Catalog-style metadata surface (SURVEY §2.5 M5): sequence dictionaries
  * from whichever companion metadata a file carries. */
object GraftMeta {

  /** chrom → size for a FASTA (.fai), BAM/CRAM (header dictionary),
    * VCF/BCF (##contig header lines), or BigWig/BigBed (chrom B+ tree). */
  def chromSizes(path: String): Map[String, Long] = {
    val p = new Path(path)
    val conf = graft.sources.common.GraftHadoop.conf()
    val lower = p.getName.toLowerCase
    if (lower.endsWith(".bam")) {
      val fs = p.getFileSystem(conf)
      val si = SeekableInputs.forHadoop(fs, p)
      try {
        val s = new BgzfRangeInputStream(si, Bgzf.VirtualPosition(0L), None)
        val h = BamCodec.readHeader(new BamCodec.LEInput(s))
        h.refNames.zip(h.refLengths.map(_.toLong)).toMap
      } finally si.close()
    } else if (lower.endsWith(".cram")) {
      samDictionary(cramHeaderText(p, conf))
    } else if (lower.endsWith(".bcf")) {
      vcfContigs(bcfHeaderText(p, conf))
    } else if (lower.endsWith(".vcf") || lower.endsWith(".vcf.gz") ||
        lower.endsWith(".vcf.bgz")) {
      vcfContigs(leadingLines(p, conf, "#"))
    } else if (lower.endsWith(".sam")) {
      samDictionary(leadingLines(p, conf, "@"))
    } else if (lower.endsWith(".bw") || lower.endsWith(".bigwig") ||
        lower.endsWith(".bb") || lower.endsWith(".bigbed")) {
      val fs = p.getFileSystem(conf)
      val in = SeekableInputs.forHadoop(fs, p)
      try {
        val h = BbiCodec.readHeader(in)
        BbiCodec.readChroms(in, h).map(c => c.name -> c.size).toMap
      } finally in.close()
    } else {
      FaiIndex.readFor(p, conf)
        .map(_.map(e => e.name -> e.length).toMap)
        .getOrElse(throw new IllegalArgumentException(
          s"no chrom metadata source for $path (need bam/cram/vcf/bcf/" +
            "bw/bb or a .fai)"))
    }
  }

  /** SAM header text of a CRAM: file definition, first container header,
    * header block — no data container is touched. */
  private def cramHeaderText(p: Path, conf: Configuration): String = {
    val fs = p.getFileSystem(conf)
    val in = SeekableInputs.forHadoop(fs, p)
    try {
      in.seek(0L)
      val fileLen = in.length
      val s = new java.io.InputStream {
        private var pos = 0L
        override def read(): Int = {
          val b = new Array[Byte](1)
          if (read(b, 0, 1) < 0) -1 else b(0) & 0xff
        }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          val n = math.min(len.toLong, fileLen - pos).toInt
          if (n <= 0) return -1
          in.readFully(b, off, n)
          pos += n
          n
        }
      }
      CramCodec.readFileDefinition(s)
      CramCodec.readContainerHeader(s)
      val block = CramCodec.readBlock(s)
      val d = block.data
      val len = (d(0) & 0xff) | ((d(1) & 0xff) << 8) |
        ((d(2) & 0xff) << 16) | ((d(3) & 0xff) << 24)
      new String(d, 4, math.min(len, d.length - 4), "UTF-8")
    } finally in.close()
  }

  /** `@SQ SN:/LN:` pairs of a SAM header text. */
  private def samDictionary(text: String): Map[String, Long] =
    text.split("\n").iterator.filter(_.startsWith("@SQ")).flatMap { line =>
      val fields = line.split("\t")
      for {
        sn <- fields.collectFirst { case f if f.startsWith("SN:") =>
          f.substring(3) }
        ln <- fields.collectFirst { case f if f.startsWith("LN:") =>
          f.substring(3).toLong }
      } yield sn -> ln
    }.toMap

  private def bcfHeaderText(p: Path, conf: Configuration): String = {
    val fs = p.getFileSystem(conf)
    val si = SeekableInputs.forHadoop(fs, p)
    try {
      val s = new BgzfRangeInputStream(si, Bgzf.VirtualPosition(0L), None)
      val le = new BamCodec.LEInput(s)
      le.readBytes(5) // "BCF" + version
      val lText = le.readInt()
      new String(le.readBytes(lText), "UTF-8")
    } finally si.close()
  }

  /** Leading header lines (those starting with `prefix`) of a plain or
    * gzip/bgzf text file. */
  private def leadingLines(p: Path, conf: Configuration,
      prefix: String): String = {
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val lower = p.getName.toLowerCase
    // the GZIP constructor reads the header and can throw (truncated /
    // empty file) BEFORE any try/finally below owns the stream — close
    // the underlying handle on that path instead of leaking it
    val in =
      try {
        if (lower.endsWith(".gz") || lower.endsWith(".bgz"))
          new java.util.zip.GZIPInputStream(raw)
        else raw
      } catch { case e: Throwable => raw.close(); throw e }
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"))
    val sb = new StringBuilder
    try {
      var line = r.readLine()
      while (line != null && line.startsWith(prefix)) {
        sb.append(line).append('\n')
        line = r.readLine()
      }
    } finally r.close()
    sb.toString
  }

  /** `##contig=<ID=...,length=...>` pairs; contigs without a length are
    * omitted (the surface reports sizes, not bare names). */
  private def vcfContigs(header: String): Map[String, Long] = {
    val Re = """##contig=<(.+)>""".r
    header.linesIterator.collect { case Re(body) =>
      val attrs = body.split(",").flatMap { part =>
        val eq = part.indexOf('=')
        if (eq > 0) Some(part.substring(0, eq) ->
          part.substring(eq + 1).stripSuffix(">"))
        else None
      }.toMap
      (attrs.get("ID"), attrs.get("length").flatMap(_.toLongOption))
    }.collect { case (Some(id), Some(len)) => id -> len }.toMap
  }

  /** Per-reference record statistics from the companion BAI/CSI/TBI
    * index's metadata pseudo-bin, the surface the reference exposes from
    * index metadata: ref name → (n_mapped, n_unmapped). References whose
    * index carries no pseudo-bin are omitted (minimal/hand-built indexes).
    * Ref ids resolve through the tabix name list or, for BAM, the header
    * dictionary. */
  def indexStats(path: String): Map[String, (Long, Long)] = {
    val p = new Path(path)
    val conf = graft.sources.common.GraftHadoop.conf()
    val fs = p.getFileSystem(conf)
    val index = GenomicIndex.findFor(fs, p).getOrElse(
      throw new IllegalArgumentException(s"no .bai/.csi/.tbi index for $path"))
    val names: Int => String =
      if (index.names.nonEmpty) {
        val byId = index.names.map(_.swap)
        id => byId.getOrElse(id, id.toString)
      } else if (p.getName.toLowerCase.endsWith(".bam")) {
        val si = SeekableInputs.forHadoop(fs, p)
        val refNames = try {
          val s = new BgzfRangeInputStream(si, Bgzf.VirtualPosition(0L), None)
          BamCodec.readHeader(new BamCodec.LEInput(s)).refNames
        } finally si.close()
        id => if (id < refNames.length) refNames(id) else id.toString
      } else { id => id.toString }
    index.refs.zipWithIndex.flatMap { case (r, id) =>
      r.metadata.map(m => names(id) -> (m.nMapped, m.nUnmapped))
    }.toMap
  }

  /** Zoom levels (reduction factors) of a BBI file. */
  def zoomLevels(path: String): Seq[Int] = {
    val p = new Path(path)
    val fs = p.getFileSystem(graft.sources.common.GraftHadoop.conf())
    val in = SeekableInputs.forHadoop(fs, p)
    try BbiCodec.readHeader(in).zoomLevels.map(_.reductionLevel)
    finally in.close()
  }
}
