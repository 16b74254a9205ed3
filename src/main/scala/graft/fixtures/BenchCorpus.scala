package graft.fixtures

import java.io.{BufferedOutputStream, File, FileOutputStream, OutputStream}

import scala.collection.mutable

import graft.formats.{Bgzf, GenomicIndex}

/** Deterministic multi-hundred-MB genomic bench corpus: a coordinate-sorted
  * BGZF BAM (+BAI), a bgzipped VCF (+TBI) and a bgzipped BED (+TBI),
  * streamed to disk with records packed ~56 KiB per BGZF block (the real
  * htslib layout, unlike the record-per-block unit fixtures).
  *
  * Exists because the format scanners — the heart of the reference parity
  * (`/root/reference/oxbow/src/alignment/scanner/bam.rs:155-279`) — were
  * only ever benched on KB-size gate fixtures; the reference's one
  * published benchmark IS a BAM region query over an ~8 Mbp slice
  * (`py-oxbow/notebooks/bench.ipynb`). Generation is one-time (marker file
  * keyed by the size parameters) and everything is derived from splitmix64
  * streams, so the corpus is bit-reproducible.
  *
  * Index layout mirrors BamFixture/TabixFixture (14/5 binning, metadata
  * pseudo-bin 37450 with raw counts, 16 KiB linear windows) but is built
  * incrementally: per-bin chunk lists merge adjacent records in place, so
  * the index stays ~1 MB for millions of records instead of one chunk per
  * record.
  */
object BenchCorpus {

  final case class Paths(bam: String, vcf: String, bed: String,
      cram: String)

  // --------------------------------------------------------------- writers

  /** Streaming BGZF writer: records accumulate in a ~56 KiB payload
    * buffer (compressed worst case stays under the u16 BSIZE cap) and
    * each `append` returns the record's (vstart, vend) virtual span. */
  private final class BgzfWriter(path: String) {
    private val out =
      new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    private val buf = new java.io.ByteArrayOutputStream(1 << 16)
    private var fileOffset = 0L
    private val cap = 56 * 1024
    private def vpos: Long = (fileOffset << 16) | buf.size
    def append(rec: Array[Byte]): (Long, Long) = {
      if (buf.size > 0 && buf.size + rec.length > cap) flush()
      val start = vpos
      buf.write(rec)
      (start, vpos)
    }
    def flush(): Unit = if (buf.size > 0) {
      val block = Bgzf.writeBlock(buf.toByteArray)
      out.write(block)
      fileOffset += block.length
      buf.reset()
    }
    def close(): Unit = { flush(); out.write(Bgzf.EofBlock); out.close() }
  }

  /** One reference's incremental bin/linear index state. Chunks whose
    * vstart equals the previous record's vend (contiguous in one block)
    * merge in place — coordinate-sorted input keeps each bin at a few
    * chunks regardless of record count. */
  private final class RefBins {
    val bins = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Array[Long]]]
    val linear = mutable.ArrayBuffer.empty[Long] // Long.MaxValue = unset
    var minV = Long.MaxValue
    var maxV = 0L
    var n = 0L
    def add(beg: Long, end: Long, vstart: Long, vend: Long): Unit = {
      val bin = GenomicIndex.reg2bin(beg, end)
      val chunks = bins.getOrElseUpdate(bin, mutable.ArrayBuffer.empty)
      if (chunks.nonEmpty && chunks.last(1) == vstart) chunks.last(1) = vend
      else chunks += Array(vstart, vend)
      val wEnd = ((end - 1) >> 14).toInt
      while (linear.size <= wEnd) linear += Long.MaxValue
      var w = (beg >> 14).toInt
      while (w <= wEnd) {
        if (vstart < linear(w)) linear(w) = vstart
        w += 1
      }
      if (vstart < minV) minV = vstart
      if (vend > maxV) maxV = vend
      n += 1
    }
  }

  /** Little-endian sink (optionally gzip-wrapped, for TBI). */
  private final class LEOut(path: String, gzip: Boolean) {
    private val out: OutputStream = {
      val f = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
      if (gzip) new java.util.zip.GZIPOutputStream(f) else f
    }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >>> 32).toInt) }
    def close(): Unit = out.close()
  }

  /** Shared BAI/TBI per-reference body: real bins, the 37450 metadata
    * pseudo-bin (vpos span + raw counts) and the 16 KiB linear index. */
  private def writeRefs(le: LEOut, refs: Seq[RefBins]): Unit =
    refs.foreach { r =>
      val hasMeta = r.n > 0
      le.i32(r.bins.size + (if (hasMeta) 1 else 0))
      r.bins.toSeq.sortBy(_._1).foreach { case (id, chunks) =>
        le.i32(id)
        le.i32(chunks.size)
        chunks.foreach { c => le.i64(c(0)); le.i64(c(1)) }
      }
      if (hasMeta) {
        le.i32(37450); le.i32(2)
        le.i64(r.minV); le.i64(r.maxV)
        le.i64(r.n); le.i64(0L)
      }
      le.i32(r.linear.size)
      r.linear.foreach(v => le.i64(if (v == Long.MaxValue) 0L else v))
    }

  private def writeBai(path: String, refs: Seq[RefBins]): Unit = {
    val le = new LEOut(path, gzip = false)
    le.bytes(Array[Byte]('B', 'A', 'I', 1))
    le.i32(refs.size)
    writeRefs(le, refs)
    le.close()
  }

  /** TBI header then shared body. `format` 2 = VCF preset; 0x10000 =
    * generic zero-based. Names are written as explicit NUL-terminated
    * byte runs. */
  private def writeTbi(path: String, names: Seq[String], format: Int,
      colSeq: Int, colBeg: Int, colEnd: Int, refs: Seq[RefBins]): Unit = {
    val le = new LEOut(path, gzip = true)
    le.bytes(Array[Byte]('T', 'B', 'I', 1))
    le.i32(refs.size)
    le.i32(format)
    le.i32(colSeq); le.i32(colBeg); le.i32(colEnd)
    le.i32('#'.toInt); le.i32(0)
    val nameBytes = names.flatMap(n => n.getBytes("ASCII").toSeq :+ 0.toByte)
    le.i32(nameBytes.length)
    le.bytes(nameBytes.toArray)
    writeRefs(le, refs)
    le.close()
  }

  // ------------------------------------------------------------ generators

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val Bases = "ACGT"

  /** 100 bp read from a rotating 997-base motif with ~12 scattered
    * mutations: repeats + noise, so BGZF compresses it like real reads
    * (~2:1) instead of collapsing a pure motif ~10:1. Fully determined
    * by (refId, index). */
  private def readSeq(motif: Array[Char], refId: Int, i: Long): String = {
    val arr = new Array[Char](100)
    val off = ((i * 31 + refId * 7) % motif.length).toInt
    var j = 0
    while (j < 100) {
      arr(j) = motif((off + j) % motif.length)
      j += 1
    }
    var h = splitmix64(i * 2 + refId)
    var m = 0
    while (m < 12) {
      h = splitmix64(h)
      arr((h & 0x7f).toInt % 100) = Bases(((h >>> 8) & 3).toInt)
      m += 1
    }
    new String(arr)
  }

  /** Per-read quality string: 8 phred levels drawn per position from a
    * splitmix stream — ~3 bits/char of entropy, the incompressible share
    * a real instrument's quals carry. */
  private def readQual(i: Long): String = {
    val arr = new Array[Char](100)
    var h = splitmix64(i ^ 0x9a11)
    var j = 0
    while (j < 100) {
      if ((j & 15) == 0) h = splitmix64(h)
      arr(j) = (33 + 28 + ((h >>> ((j & 15) * 3)) & 7)).toChar
      j += 1
    }
    new String(arr)
  }

  private def genBam(path: String, nRecs: Int): Unit = {
    val refs = Seq(("chr1", 200000000), ("chr2", 100000000))
    val motif = {
      val a = new Array[Char](997)
      var i = 0
      while (i < a.length) { a(i) = Bases((splitmix64(i) & 3).toInt); i += 1 }
      a
    }
    val w = new BgzfWriter(path)
    w.append(BamFixture.encodeHeader(refs))
    w.flush() // records start on a block boundary
    val bai = Array.fill(refs.size)(new RefBins)
    val perRef = Array((nRecs * 2L) / 3, nRecs - (nRecs * 2L) / 3)
    var recNo = 0L
    for (refId <- refs.indices) {
      val n = perRef(refId)
      val span = refs(refId)._2.toLong - 200
      val step = math.max(1L, span / math.max(n, 1L))
      var i = 0L
      while (i < n) {
        val pos0 = (i * step).toInt
        val h = splitmix64(recNo)
        val cigar: Seq[(Int, Char)] = ((recNo % 13).toInt) match {
          case 0 => Seq((40, 'M'), (2, 'I'), (58, 'M'))
          // query-consuming ops must sum to the 100-base seq (SAM §1.4)
          case 7 => Seq((50, 'M'), (3, 'D'), (50, 'M'))
          case _ => Seq((100, 'M'))
        }
        val rec = BamFixture.Rec(
          qname = s"read${recNo}",
          flag = if ((recNo & 1) == 0) 0 else 16,
          refId = refId, pos0 = pos0,
          mapq = 20 + (h & 0x1f).toInt,
          cigar = cigar,
          seq = readSeq(motif, refId, i),
          qual = readQual(recNo),
          tags = BamFixture.tagInt("NM", (h >>> 16 & 0x3).toInt) ++
            BamFixture.tagInt("AS", 90 + (h >>> 20 & 0x7).toInt) ++
            BamFixture.tagStr("RG", "rg" + (recNo % 4)))
        val (vs, ve) = w.append(BamFixture.encodeRecord(rec))
        bai(refId).add(pos0.toLong, pos0.toLong + BamFixture.refLen(rec),
          vs, ve)
        recNo += 1
        i += 1
      }
    }
    w.close()
    writeBai(path + ".bai", bai.toSeq)
  }

  private def genVcf(path: String, nRecs: Int): Unit = {
    val contigLen = 200000000L
    val samples = Seq("s1", "s2", "s3")
    val header =
      "##fileformat=VCFv4.3\n" +
        s"##contig=<ID=chr1,length=$contigLen>\n" +
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">\n" +
        "##INFO=<ID=AF,Number=A,Type=Float,Description=\"Allele freq\">\n" +
        "##INFO=<ID=MQ,Number=1,Type=Float,Description=\"Mapping qual\">\n" +
        "##INFO=<ID=QD,Number=1,Type=Float,Description=\"Qual by depth\">\n" +
        "##INFO=<ID=FS,Number=1,Type=Float,Description=\"Fisher strand\">\n" +
        "##INFO=<ID=SOR,Number=1,Type=Float,Description=\"Odds ratio\">\n" +
        "##INFO=<ID=AN,Number=1,Type=Integer,Description=\"Alleles\">\n" +
        "##INFO=<ID=AC,Number=A,Type=Integer,Description=\"Allele count\">\n" +
        "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">\n" +
        "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">\n" +
        "##FORMAT=<ID=GQ,Number=1,Type=Integer,Description=\"GQ\">\n" +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
        samples.mkString("\t") + "\n"
    val w = new BgzfWriter(path)
    w.append(header.getBytes("UTF-8"))
    w.flush()
    val tbi = new RefBins
    val step = math.max(1L, (contigLen - 100) / math.max(nRecs, 1))
    val gts = Array("0/0", "0/1", "1/1")
    var i = 0L
    while (i < nRecs) {
      val pos1 = 1L + i * step
      val h = splitmix64(i + 0x5eed)
      val refIdx = ((h >>> 2) & 3).toInt
      val ref = Bases(refIdx)
      // ALT derived as a nonzero offset from REF — independent bit fields
      // made ALT == REF in ~25% of records, which VCF 4.3 forbids
      val alt = Bases((refIdx + 1 + ((h >>> 4) & 1).toInt) % 4)
      val dp = 10 + (h & 0x7f).toInt
      val sb = new java.lang.StringBuilder(192)
      sb.append("chr1\t").append(pos1).append("\trs").append(i)
        .append('\t').append(ref).append('\t').append(alt)
        .append('\t').append((h >>> 8 & 0x3ff).toInt / 10.0).append("\tPASS\t")
        .append("DP=").append(dp)
        .append(";AF=0.").append((h >>> 12 & 0x7).toInt + 1)
        .append(";MQ=").append(40 + (h >>> 16 & 0x1f).toInt)
        .append(";QD=").append((h >>> 20 & 0xff).toInt / 10.0)
        .append(";FS=").append((h >>> 24 & 0x3f).toInt / 10.0)
        .append(";SOR=").append((h >>> 28 & 0xf).toInt / 10.0)
        .append(";AN=6;AC=").append((h >>> 32 & 0x3).toInt + 1)
        .append("\tGT:DP:GQ")
      for (s <- samples.indices) {
        sb.append('\t').append(gts(((h >>> (36 + 2 * s)) & 0x3).toInt % 3))
          .append(':').append(dp + s).append(':').append(99 - s)
      }
      sb.append('\n')
      val (vs, ve) = w.append(sb.toString.getBytes("UTF-8"))
      // VCF preset: beg = POS-1 zero-based, end = beg + len(REF)
      tbi.add(pos1 - 1, pos1, vs, ve)
      i += 1
    }
    w.close()
    writeTbi(path + ".tbi", Seq("chr1"), format = 2,
      colSeq = 1, colBeg = 2, colEnd = 0, refs = Seq(tbi))
  }

  private def genBed(path: String, nRecs: Int): Unit = {
    val refs = Seq(("chr1", 200000000L), ("chr2", 100000000L))
    val w = new BgzfWriter(path)
    val bins = Array.fill(refs.size)(new RefBins)
    val perRef = Array((nRecs * 2L) / 3, nRecs - (nRecs * 2L) / 3)
    var recNo = 0L
    for (refId <- refs.indices) {
      val (chrom, len) = refs(refId)
      val n = perRef(refId)
      val step = math.max(1L, (len - 2000) / math.max(n, 1L))
      var i = 0L
      while (i < n) {
        val start = i * step
        val end = start + 100 + (splitmix64(recNo) & 0x3ff)
        val line = s"$chrom\t$start\t$end\tfeat$recNo\t" +
          s"${(splitmix64(recNo + 1) & 0x7fffffffL) % 1001}\t" + // BED caps score at 1000
          (if ((recNo & 1) == 0) "+" else "-") + "\n"
        val (vs, ve) = w.append(line.getBytes("UTF-8"))
        bins(refId).add(start, end, vs, ve)
        recNo += 1
        i += 1
      }
    }
    w.close()
    writeTbi(path + ".tbi", refs.map(_._1), format = 0x10000,
      colSeq = 1, colBeg = 2, colEnd = 3, refs = bins.toSeq)
  }

  // ----------------------------------------------------------------- ensure

  /** Generate the corpus under `dir` unless a marker written with the
    * same size parameters already exists alongside the files. */
  def ensure(dir: String, nBam: Int = 4000000, nVcf: Int = 2500000,
      nBed: Int = 6000000, nCram: Int = 1500000): Paths = {
    val d = new File(dir)
    d.mkdirs()
    val paths = Paths(new File(d, "bench.bam").getPath,
      new File(d, "bench.vcf.gz").getPath,
      new File(d, "bench.bed.gz").getPath,
      new File(d, "bench.cram").getPath)
    val marker = new File(d, "corpus.marker")
    // v5: CRAM blocks/containers carry computed CRCs (reader validates)
    val tag = s"v5:$nBam:$nVcf:$nBed:$nCram"
    val fresh = marker.exists() && {
      val src = scala.io.Source.fromFile(marker)
      try src.mkString.trim == tag finally src.close()
    } && Seq(paths.bam, paths.bam + ".bai", paths.vcf, paths.vcf + ".tbi",
      paths.bed, paths.bed + ".tbi", paths.cram, paths.cram + ".crai")
      .forall(new File(_).exists())
    if (!fresh) {
      def timed(what: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        System.err.println(
          f"[bench-corpus] $what in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      timed(s"generated $nBam-record BAM")(genBam(paths.bam, nBam))
      timed(s"generated $nVcf-record VCF")(genVcf(paths.vcf, nVcf))
      timed(s"generated $nBed-record BED")(genBed(paths.bed, nBed))
      timed(s"generated $nCram-record CRAM")(genCram(paths.cram, nCram))
      val fw = new java.io.FileWriter(marker)
      try fw.write(tag) finally fw.close()
    }
    paths
  }

  /** Mapped-read CRAM with rANS-compressed quality scores and gzipped
    * read names (the htslib method mix for these series), an embedded
    * per-slice reference and 10k-record slices. Random phred values make
    * the QS blocks near-incompressible — worst-case rANS decode cost, the
    * honest upper bound for the b06/b07 skip-decode comparison. */
  private def genCram(path: String, nRecs: Int): Unit = {
    val per = 10000
    val readLen = 100
    val contigLen = 3 * nRecs + readLen + 100
    val contig = {
      val Bases = "ACGT"
      val a = new Array[Char](contigLen)
      var i = 0
      while (i < a.length) { a(i) = Bases((splitmix64(i ^ 0xc4a) & 3).toInt); i += 1 }
      new String(a)
    }
    val header = s"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:$contigLen\n"
    val nCont = (nRecs + per - 1) / per
    // a non-memoizing view keeps residency at one 10k-record container
    // instead of all nCram records at once
    val containers: Iterable[Seq[CramFixture.CRec]] =
      (0 until nCont).view.map { ci =>
        val lo = ci * per
        val hi = math.min(lo + per, nRecs)
        (lo until hi).map { i =>
          val quals = Array.tabulate[Byte](readLen) { j =>
            (splitmix64(i.toLong * readLen + j) & 0x3f).toByte
          }
          CramFixture.CRec(f"r$i%08d", 0, 0, 1 + 3 * i, 60, readLen,
            quals = quals)
        }
      }
    CramFixture.write(path, header, containers,
      embeddedRefs = Map(0 -> contig),
      seriesMethods = Map("QS" -> 4, "RN" -> 1))
  }
}
