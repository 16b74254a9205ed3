package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.{BamFixture, BbiFixture, BcfFixture, CramFixture, TabixFixture}

/** Scanner-correctness gate (VERDICT r2 task 6).
  *
  * The DuckDB oracle cannot read genomic formats, so scanner rows were
  * previously spec-only. These gate queries close that hole: each one
  * (a) deterministically generates a genomic fixture, (b) writes the
  * EXPECTED rows — hand-derived from the fixture definition, not from
  * the reader — as parquet, and (c) returns the actual reader scan,
  * canonicalized (scalar columns, full ORDER BY). The oracle SQL simply
  * `read_parquet`s the expected dump, so the driver's DuckDB compare
  * now covers S1/S2/S7/S8/S9/S10/S11/S13-14/S15/S16/S17 end-to-end.
  *
  * Named `s*` (not `q*`) so the Bench harness can exclude them: they
  * scan constant-size fixtures and say nothing about data-scale cost.
  */
object ScanGate {

  /** Per-PROCESS fixture root. The expected dumps must outlive this JVM
    * (the driver's DuckDB pass reads the paths embedded in
    * oracle_sql.json after Verify exits), so they cannot be temp-scoped
    * — but a fixed shared path would let a concurrent JVM (an sbt test
    * suite running alongside a Verify/Bench run) observe half-written
    * fixtures: the object-level `synchronized` only serializes threads
    * within one process. Each process writes its own dir; stale sibling
    * dirs from dead runs are swept on first use. */
  private[graft] val Root: String = {
    val base = Paths.get("/tmp/graft_gate_runs")
    try {
      if (Files.isDirectory(base)) {
        val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
        val s = Files.list(base)
        try {
          import scala.jdk.CollectionConverters.IteratorHasAsScala
          // the dir name encodes the owner pid: never sweep a LIVE
          // owner's dumps (a >24h bench/verify run, or a deferred
          // DuckDB compare whose JVM is still up) — age alone cannot
          // distinguish a dead run from a slow one
          def ownerDead(p: java.nio.file.Path): Boolean =
            p.getFileName.toString.stripPrefix("pid").toLongOption
              .forall(pid => !ProcessHandle.of(pid)
                .map[Boolean](_.isAlive).orElse(false))
          s.iterator.asScala
            .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff &&
              ownerDead(p))
            .toVector.foreach { p =>
              val w = Files.walk(p)
              try w.iterator.asScala.toVector.reverse
                .foreach(Files.deleteIfExists(_))
              finally w.close()
            }
        } finally s.close()
      }
    } catch { case _: Exception => () } // sweep is best-effort
    base.resolve(s"pid${ProcessHandle.current().pid()}").toString
  }

  def expectedDir(name: String): String = s"$Root/expected/$name"

  private def oracleFor(name: String, orderBy: String): String =
    s"SELECT * FROM read_parquet('${expectedDir(name)}/*.parquet') " +
      s"ORDER BY $orderBy"

  // ------------------------------------------------------------- fixtures

  private lazy val fixtures: String = synchronized {
    Files.createDirectories(Paths.get(Root))
    writeBam()
    writeSam()
    writeVcf()
    writeBcf()
    writeBed()
    writeGff()
    writeBbi()
    writeFasta()
    writeCram()
    writeGtf()
    writeFastq()
    writeMultiRefCram()
    writeTabixBed()
    writeTagBam()
    writeSplitBed()
    writeGenotypeVcf()
    writeGenotypeBcf()
    writeRawBam()
    writeCram31()
    Root
  }

  /** Uncompressed BAM (no BGZF wrapper): the raw pass-through path that
    * htslib's `samtools view -u` produces. */
  private def writeRawBam(): Unit =
    BamFixture.writeRaw(s"$Root/u.bam", Seq(("chr1", 100000)), Seq(
      BamFixture.Rec("u1", 0, 0, 10, 60, Seq((4, 'M')), "ACGT", "FFFF"),
      BamFixture.Rec("u2", 16, 0, 50, 30, Seq((2, 'M'), (1, 'D'), (2, 'M')),
        "GGCC", null),
      BamFixture.Rec("u3", 4, -1, -1, 0, Nil, "TTAA", null)))

  private def writeBam(): Unit = {
    BamFixture.write(s"$Root/g.bam",
      Seq(("chr1", 100000), ("chr2", 50000)),
      Seq(
        BamFixture.Rec("r001", 99, 0, 6, 30,
          Seq((8, 'M'), (2, 'I'), (4, 'M'), (1, 'D'), (3, 'M')),
          "TTAGATAAAGGATACTG", null),
        BamFixture.Rec("r002", 0, 0, 100, 20, Seq((6, 'M')), "ATAGCT", "FFFFFF"),
        BamFixture.Rec("r003", 16, 0, 20000, 45, Seq((4, 'M')), "GGCC", "IIII"),
        BamFixture.Rec("r004", 0, 1, 15, 23, Seq((6, 'M')), "ATAGCT", "FFFFFF"),
        BamFixture.Rec("r005", 4, -1, -1, 0, Nil, "ACGT", null)))
  }

  private def writeSam(): Unit =
    Files.writeString(Paths.get(s"$Root/g.sam"),
      "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000\n" +
        "s1\t0\tchr1\t10\t60\t4M\t*\t0\t0\tACGT\tFFFF\n" +
        "s2\t16\tchr1\t40\t30\t2M1D2M\t*\t0\t0\tGGCC\t*\n")

  private def writeVcf(): Unit =
    Files.writeString(Paths.get(s"$Root/g.vcf"),
      Seq(
        "##fileformat=VCFv4.1",
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t100\trs1\tA\tG,T\t29.5\tPASS\tDP=10",
        "chr2\t200\t.\tC\t.\t.\tq10\tDP=3").mkString("\n") + "\n")

  private val bcfHeader = Seq(
    "##fileformat=VCFv4.2",
    "##FILTER=<ID=PASS,Description=\"ok\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
    "##contig=<ID=chr1,length=100000>",
    "##contig=<ID=chr2,length=50000>",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO").mkString("\n")

  private def writeBcf(): Unit =
    BcfFixture.write(s"$Root/g.bcf", bcfHeader, Seq(
      BcfFixture.BcfRec(0, 99, 1, Some(29.5f), Seq("rs1"), Seq("A", "G"),
        Seq(0), info = Seq(1 -> BcfFixture.typedInt(10)), fmt = Nil,
        nSample = 0),
      BcfFixture.BcfRec(1, 199, 1, None, Nil, Seq("C"), Seq(0),
        info = Nil, fmt = Nil, nSample = 0)))

  private def writeBed(): Unit =
    Files.writeString(Paths.get(s"$Root/g.bed"),
      "chr1\t100\t200\tfeatA\t960\t+\n" +
        "chr2\t50\t80\tfeatB\t3\t-\n")

  private def writeGff(): Unit =
    Files.writeString(Paths.get(s"$Root/g.gff"),
      "##gff-version 3\n" +
        "chr1\ttest\tgene\t100\t200\t.\t+\t.\tID=g1\n" +
        "chr1\ttest\texon\t120\t180\t0.5\t+\t0\tID=e1;Parent=g1\n")

  private def writeBbi(): Unit = {
    // zoom summaries exercised by s15 (the full-resolution s07 scan
    // ignores them); values are the exact per-bin stats of the wig rows
    BbiFixture.write(s"$Root/g.bw", Seq(("chr1", 0)),
      wigSections = Seq(BbiFixture.WigSection(0, 1, 0, 0, 0,
        Seq((100L, 200L, 1.5f), (300L, 400L, 2.5f)))),
      bedItems = Nil,
      zooms = Seq(
        BbiFixture.Zoom(0, 0, 256, 100, 1.5f, 1.5f, 150f, 225f),
        BbiFixture.Zoom(0, 256, 512, 100, 2.5f, 2.5f, 250f, 625f)))
    // typed columns come from the embedded AutoSql declaration (M4)
    BbiFixture.write(s"$Root/g.bb", Seq(("chr1", 0)),
      wigSections = Nil,
      bedItems = Seq(
        BbiFixture.BedItem(0, 10, 50, "feat1\t960"),
        BbiFixture.BedItem(0, 60, 90, "feat2\t3")),
      zooms = Nil,
      autoSql = Some(
        """table gateBed
          |"gate fixture"
          |(
          |string chrom;      "Reference sequence"
          |uint   chromStart; "Start"
          |uint   chromEnd;   "End"
          |string name;       "Feature name"
          |int    score;      "Score"
          |)""".stripMargin),
      fieldCount = Some(5))
  }

  private val fastaChr1 = "ACGTACGTAC" * 3 // 30 bp

  private def writeFasta(): Unit = {
    Files.writeString(Paths.get(s"$Root/g.fa"), s">chr1 demo\n$fastaChr1\n")
    Files.writeString(Paths.get(s"$Root/g.fa.fai"),
      s"chr1\t30\t${">chr1 demo\n".length}\t30\t31\n")
  }

  private val cramChr1 = "ACGTACGTAC" * 10
  private val cramChr2 = "GGCC" * 15

  private def writeCram(): Unit = {
    Files.writeString(Paths.get(s"$Root/ref.fa"),
      s">chr1\n$cramChr1\n>chr2\n$cramChr2\n")
    Files.writeString(Paths.get(s"$Root/ref.fa.fai"),
      s"chr1\t100\t6\t100\t101\nchr2\t60\t${6 + 101 + 6}\t60\t61\n")
    val xCode = graft.formats.CramCodec.substitutionCode(
      CramFixture.SubstitutionMatrix, 'C', 'G')
    CramFixture.write(s"$Root/g.cram",
      "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100\n@SQ\tSN:chr2\tLN:60\n",
      Seq(
        Seq(
          CramFixture.CRec("c1", 0, 0, 5, 60, 8),
          CramFixture.CRec("c2", 0, 0, 10, 30, 10, feats = Seq(
            CramFixture.Feat('S', 1, bytes = "TT".getBytes),
            CramFixture.Feat('X', 5, intVal = xCode),
            CramFixture.Feat('D', 7, intVal = 3)))),
        Seq(CramFixture.CRec("c4", 0, 1, 50, 50, 5)),
        Seq(CramFixture.CRec("c3", 4, -1, 0, -1, 4, bases = "ACGT"))))
  }

  private def writeGtf(): Unit =
    Files.writeString(Paths.get(s"$Root/g.gtf"),
      "#!genome-build test\n" +
        "chr1\ttest\tgene\t100\t200\t.\t+\t.\t" +
        "gene_id \"g1\"; gene_name \"alpha\";\n" +
        "chr1\ttest\texon\t120\t180\t0.5\t+\t0\t" +
        "gene_id \"g1\"; transcript_id \"t1\";\n")

  private def writeFastq(): Unit =
    Files.writeString(Paths.get(s"$Root/g.fq"),
      "@read1 lane=1\nACGTACGT\n+\nFFFFIIII\n" +
        "@read2\nGGCCTTAA\n+\n!!!!BBBB\n")

  /** One container with two slices on different refs (container refSeqId
    * -2, the multi-ref case) holding an unmapped-placed record, plus a
    * -1 unmapped-tail container — the S4 analogue CRAM path. */
  private def writeMultiRefCram(): Unit =
    CramFixture.writeSliced(s"$Root/gm.cram",
      "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100\n@SQ\tSN:chr2\tLN:60\n",
      Seq(
        Seq(
          Seq(
            CramFixture.CRec("m1", 0, 0, 5, 60, 8),
            CramFixture.CRec("m2", 4, 0, 0, -1, 4, bases = "ACGT")),
          Seq(CramFixture.CRec("m3", 0, 1, 50, 50, 5))),
        Seq(Seq(CramFixture.CRec("m4", 4, -1, 0, -1, 4, bases = "GGTT")))))

  /** BAM with typed tags (M1): NM:i, MD:Z, XF:f, XB:B,i — plus XW seen
    * as int then string, exercising the sampling pass's type widening
    * (reference `alignment/model/tag.rs:124-165`, scan_rows sampling
    * `alignment/scanner/bam.rs:122-149`). */
  private def writeTagBam(): Unit = {
    import BamFixture._
    BamFixture.write(s"$Root/gt.bam", Seq(("chr1", 100000)), Seq(
      Rec("t1", 0, 0, 10, 60, Seq((4, 'M')), "ACGT", "FFFF",
        tags = tagInt("NM", 2) ++ tagStr("MD", "2A1") ++
          tagFloat("XF", 1.5f) ++ tagIntArray("XB", Seq(1, -2, 3))),
      Rec("t2", 0, 0, 50, 60, Seq((4, 'M')), "GGCC", "IIII",
        tags = tagInt("NM", 0) ++ tagInt("XW", 7)),
      Rec("t3", 0, 0, 90, 60, Seq((4, 'M')), "TTAA", "FFFF",
        tags = tagStr("XW", "abc"))))
  }

  /** Plain-text multi-line BED sized so a tiny maxpartitionbytes forces
    * newline-aligned byte-range splits (S5). */
  private val splitBedRows: Seq[(String, Long, Long)] =
    (0 until 8).map(i => ("chr1", 1000L * i + 100, 1000L * i + 200)) :+
      (("chr2", 40L, 90L))

  private def writeSplitBed(): Unit =
    Files.writeString(Paths.get(s"$Root/split.bed"),
      splitBedRows.map { case (c, s, e) => s"$c\t$s\t$e\n" }.mkString)

  /** Multi-sample VCF: GT + DP FORMAT fields over 2 samples, covering
    * phased/unphased/missing alleles and a missing DP (P2/M3; reference
    * `variant/model.rs:230-270`, `variant/model/genotype.rs:169-180`). */
  private def writeGenotypeVcf(): Unit =
    Files.writeString(Paths.get(s"$Root/gv.vcf"),
      Seq(
        "##fileformat=VCFv4.2",
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
        "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"genotype\">",
        "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"read depth\">",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2",
        "chr1\t100\t.\tA\tG\t50\tPASS\tDP=30\tGT:DP\t0/1:10\t1|1:20",
        "chr1\t200\t.\tC\tT\t.\tPASS\t.\tGT:DP\t0|0:7\t./1:.")
        .mkString("\n") + "\n")

  /** The same two sites as gv.vcf in BCF2 binary form: GT encoded as
    * (allele+1)<<1|phased int8 vectors, DP with a 0x80 missing. */
  private val genotypeBcfHeader = Seq(
    "##fileformat=VCFv4.2",
    "##FILTER=<ID=PASS,Description=\"ok\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"genotype\">",
    "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"read depth\">",
    "##contig=<ID=chr1,length=100000>",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2")
    .mkString("\n")

  private def writeGenotypeBcf(): Unit =
    // string dict: PASS=0, DP=1 (INFO, shared with FORMAT DP), GT=2
    BcfFixture.write(s"$Root/gv.bcf", genotypeBcfHeader, Seq(
      BcfFixture.BcfRec(0, 99, 1, Some(50f), Nil, Seq("A", "G"), Seq(0),
        info = Seq(1 -> BcfFixture.typedInt(30)),
        fmt = Seq(
          2 -> Seq(Seq(2, 4), Seq(4, 5)),     // GT 0/1 | 1|1
          1 -> Seq(Seq(10), Seq(20))),        // DP
        nSample = 2),
      BcfFixture.BcfRec(0, 199, 1, None, Nil, Seq("C", "T"), Seq(0),
        info = Nil,
        fmt = Seq(
          2 -> Seq(Seq(2, 3), Seq(0, 4)),     // GT 0|0 | ./1
          1 -> Seq(Seq(7),
            Seq(graft.formats.BcfCodec.MissingInt8))), // DP 7 | .
        nSample = 2)))

  private val tabixRows = Seq(
    ("chr1", 100L, 200L), ("chr1", 15000L, 15100L),
    ("chr1", 40000L, 40200L), ("chr2", 50L, 80L))

  private def writeTabixBed(): Unit =
    TabixFixture.writeBedGz(s"$Root/g.bed.gz", tabixRows)

  /** CRAM 3.1 file whose blocks use the 3.1-only codecs end-to-end:
    * read names through the name tokeniser (method 8, incl. a DUP name
    * pair), qualities through fqzcomp (method 7), unmapped bases
    * through adaptive arithmetic (method 6), everything else through
    * rANS Nx16 (method 5) — the htslib archive-profile shape
    * (reference decodes these via noodles/htscodecs,
    * `alignment/scanner/cram.rs:42-120`). */
  private def writeCram31(): Unit =
    CramFixture.write(s"$Root/g31.cram",
      "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100\n@SQ\tSN:chr2\tLN:60\n",
      Seq(
        Seq(
          CramFixture.CRec("M9:1:1101:1000:2000", 99, 0, 5, 60, 8,
            quals = Array[Byte](5, 10, 15, 20, 25, 30, 35, 40)),
          CramFixture.CRec("M9:1:1101:1000:2000", 147, 0, 11, 60, 6,
            quals = Array.fill[Byte](6)(40)),
          CramFixture.CRec("M9:1:1101:1003:2001", 0, 0, 21, 55, 10,
            quals = Array[Byte](2, 3, 4, 5, 6, 7, 8, 9, 10, 11))),
        Seq(
          CramFixture.CRec("M9:1:1101:1007:2003", 4, -1, 0, -1, 4,
            bases = "ACGT", quals = Array[Byte](30, 30, 31, 31)))),
      blockMethod = 5,
      seriesMethods = Map("RN" -> 8, "QS" -> 7, "BA" -> 6),
      minorVersion = 1)

  // ---------------------------------------------------------------- truth

  private def dumpExpected(s: SparkSession, name: String,
      schema: StructType, rows: Seq[Row]): Unit =
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .coalesce(1).write.mode("overwrite").parquet(expectedDir(name))

  private val alnSchema = StructType(Seq(
    StructField("qname", StringType), StructField("flag", IntegerType),
    StructField("rname", StringType), StructField("pos", LongType),
    StructField("cigar", StringType), StructField("seq", StringType),
    StructField("end", LongType)))

  // -------------------------------------------------------------- queries

  /** name → (query, oracle SQL). All fixture generation is idempotent. */
  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("s01_scan_bam", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s01_scan_bam", alnSchema, Seq(
        Row("r001", 99, "chr1", 7L, "8M2I4M1D3M", "TTAGATAAAGGATACTG", 22L),
        Row("r002", 0, "chr1", 101L, "6M", "ATAGCT", 106L),
        Row("r003", 16, "chr1", 20001L, "4M", "GGCC", 20004L),
        Row("r004", 0, "chr2", 16L, "6M", "ATAGCT", 21L),
        Row("r005", 4, null, null, null, "ACGT", null)))
      s.read.format("bam").option("tag_scan_rows", "0").load(s"$Root/g.bam")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s01_scan_bam", "qname")),

    ("s02_scan_sam", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s02_scan_sam", alnSchema, Seq(
        Row("s1", 0, "chr1", 10L, "4M", "ACGT", 13L),
        Row("s2", 16, "chr1", 40L, "2M1D2M", "GGCC", 44L)))
      s.read.format("sam").option("tag_scan_rows", "0").load(s"$Root/g.sam")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s02_scan_sam", "qname")),

    ("s03_scan_vcf", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s03_scan_vcf", StructType(Seq(
        StructField("chrom", StringType), StructField("pos", LongType),
        StructField("ref", StringType), StructField("alt_str", StringType),
        StructField("qual", FloatType), StructField("dp", LongType))), Seq(
        Row("chr1", 100L, "A", "G,T", 29.5f, 10L),
        Row("chr2", 200L, "C", null, null, 3L)))
      s.read.format("vcf").load(s"$Root/g.vcf")
        .select(col("chrom"), col("pos"), col("ref"),
          array_join(col("alt"), ",").as("alt_str"), col("qual"),
          col("info.DP").as("dp"))
        .orderBy("chrom", "pos")
    }, oracleFor("s03_scan_vcf", "chrom, pos")),

    ("s04_scan_bcf", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s04_scan_bcf", StructType(Seq(
        StructField("chrom", StringType), StructField("pos", LongType),
        StructField("ref", StringType), StructField("qual", FloatType),
        StructField("dp", LongType))), Seq(
        Row("chr1", 100L, "A", 29.5f, 10L),
        Row("chr2", 200L, "C", null, null)))
      s.read.format("bcf").load(s"$Root/g.bcf")
        .select(col("chrom"), col("pos"), col("ref"), col("qual"),
          col("info.DP").as("dp"))
        .orderBy("chrom", "pos")
    }, oracleFor("s04_scan_bcf", "chrom, pos")),

    ("s05_scan_bed", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s05_scan_bed", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("name", StringType),
        StructField("score", IntegerType), StructField("strand", StringType))),
        Seq(
          Row("chr1", 100L, 200L, "featA", 960, "+"),
          Row("chr2", 50L, 80L, "featB", 3, "-")))
      s.read.format("bed").option("bed_schema", "bed6").load(s"$Root/g.bed")
        .orderBy("chrom", "start")
    }, oracleFor("s05_scan_bed", "chrom, start")),

    ("s06_scan_gff", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s06_scan_gff", StructType(Seq(
        StructField("seqid", StringType), StructField("source", StringType),
        StructField("type", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("score", FloatType),
        StructField("strand", StringType))), Seq(
        Row("chr1", "test", "exon", 120L, 180L, 0.5f, "+"),
        Row("chr1", "test", "gene", 100L, 200L, null, "+")))
      s.read.format("gff").load(s"$Root/g.gff")
        .select("seqid", "source", "type", "start", "end", "score", "strand")
        .orderBy("type")
    }, oracleFor("s06_scan_gff", "type")),

    ("s07_scan_bigwig", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s07_scan_bigwig", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("value", FloatType))), Seq(
        Row("chr1", 100L, 200L, 1.5f),
        Row("chr1", 300L, 400L, 2.5f)))
      s.read.format("bigwig").load(s"$Root/g.bw").orderBy("start")
    }, oracleFor("s07_scan_bigwig", "start")),

    ("s08_scan_bigbed", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s08_scan_bigbed", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("name", StringType),
        StructField("score", IntegerType))), Seq(
        Row("chr1", 10L, 50L, "feat1", 960),
        Row("chr1", 60L, 90L, "feat2", 3)))
      // no fields option: name/score derive from the embedded AutoSql
      s.read.format("bigbed").load(s"$Root/g.bb").orderBy("start")
    }, oracleFor("s08_scan_bigbed", "start")),

    ("s09_scan_fasta_slice", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s09_scan_fasta_slice", StructType(Seq(
        StructField("name", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("sequence", StringType))),
        Seq(
          Row("chr1", 2L, 6L, "GTAC"),
          Row("chr1", 10L, 15L, "ACGTA")))
      s.read.format("fasta").option("regions", "chr1:3-6;chr1:11-15")
        .load(s"$Root/g.fa")
        .select("name", "start", "end", "sequence")
        .orderBy("start")
    }, oracleFor("s09_scan_fasta_slice", "start")),

    ("s10_scan_cram", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s10_scan_cram", alnSchema, Seq(
        Row("c1", 0, "chr1", 5L, "8M", "ACGTACAC", 12L),
        Row("c2", 0, "chr1", 10L, "2S4M3D4M", "TTCAGGGTAC", 20L),
        Row("c3", 4, null, null, null, "ACGT", null),
        Row("c4", 0, "chr2", 50L, "5M", "GCCGG", 54L)))
      s.read.format("cram").option("reference", s"$Root/ref.fa")
        .load(s"$Root/g.cram")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s10_scan_cram", "qname")),

    // indexed region-query paths (S3 via BAI, CRAI for CRAM): chunk
    // selection + residual overlap re-check, not just full scans
    ("s11_region_bam", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s11_region_bam", alnSchema, Seq(
        Row("r001", 99, "chr1", 7L, "8M2I4M1D3M", "TTAGATAAAGGATACTG", 22L),
        Row("r002", 0, "chr1", 101L, "6M", "ATAGCT", 106L)))
      // chr1:1-200 overlaps r001 (7-22) and r002 (101-106), not r003/r004
      s.read.format("bam").option("tag_scan_rows", "0")
        .option("regions", "chr1:1-200").load(s"$Root/g.bam")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s11_region_bam", "qname")),

    ("s12_region_cram", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s12_region_cram", alnSchema, Seq(
        Row("c2", 0, "chr1", 10L, "2S4M3D4M", "TTCAGGGTAC", 20L)))
      // chr1:15-20 reaches only into c2's deletion-extended span
      s.read.format("cram").option("reference", s"$Root/ref.fa")
        .option("regions", "chr1:15-20").load(s"$Root/g.cram")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s12_region_cram", "qname")),

    // GTF attribute discovery (S12, gtfStyle branch): key "value"; pairs,
    // keys sampled from the file head in first-seen order
    ("s13_scan_gtf", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s13_scan_gtf", StructType(Seq(
        StructField("seqid", StringType), StructField("type", StringType),
        StructField("start", LongType), StructField("end", LongType),
        StructField("gene_id", StringType),
        StructField("gene_name", StringType),
        StructField("transcript_id", StringType))), Seq(
        Row("chr1", "exon", 120L, 180L, "g1", null, "t1"),
        Row("chr1", "gene", 100L, 200L, "g1", "alpha", null)))
      s.read.format("gtf").load(s"$Root/g.gtf")
        .select(col("seqid"), col("type"), col("start"), col("end"),
          col("attributes.gene_id").as("gene_id"),
          col("attributes.gene_name").as("gene_name"),
          col("attributes.transcript_id").as("transcript_id"))
        .orderBy("type")
    }, oracleFor("s13_scan_gtf", "type")),

    // FASTQ 4-line records (S15)
    ("s14_scan_fastq", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s14_scan_fastq", StructType(Seq(
        StructField("name", StringType),
        StructField("description", StringType),
        StructField("sequence", StringType),
        StructField("quality", StringType))), Seq(
        Row("read1", "lane=1", "ACGTACGT", "FFFFIIII"),
        Row("read2", null, "GGCCTTAA", "!!!!BBBB")))
      s.read.format("fastq").load(s"$Root/g.fq").orderBy("name")
    }, oracleFor("s14_scan_fastq", "name")),

    // BBI zoom-level read (S18): stored multi-resolution summaries, not
    // the full-resolution intervals
    ("s15_zoom_bigwig", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s15_zoom_bigwig", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType),
        StructField("bases_covered", LongType),
        StructField("min_val", DoubleType),
        StructField("max_val", DoubleType),
        StructField("sum_val", DoubleType),
        StructField("sum_squares", DoubleType))), Seq(
        Row("chr1", 0L, 256L, 100L, 1.5, 1.5, 150.0, 225.0),
        Row("chr1", 256L, 512L, 100L, 2.5, 2.5, 250.0, 625.0)))
      s.read.format("bigwig").option("zoom_level", "0").load(s"$Root/g.bw")
        .orderBy("start")
    }, oracleFor("s15_zoom_bigwig", "start")),

    // unmapped-only scans (S4): BAM via the index's last mapped offset;
    // CRAM via multi-ref (-2) containers (flag 0x4 residual) + -1 tail
    ("s16_scan_unmapped", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s16_scan_unmapped", StructType(Seq(
        StructField("fmt", StringType), StructField("qname", StringType),
        StructField("flag", IntegerType), StructField("seq", StringType))),
        Seq(
          Row("bam", "r005", 4, "ACGT"),
          Row("cram", "m2", 4, "ACGT"),
          Row("cram", "m4", 4, "GGTT")))
      val bam = s.read.format("bam").option("tag_scan_rows", "0")
        .option("unmapped", "true").load(s"$Root/g.bam")
        .select(lit("bam").as("fmt"), col("qname"), col("flag"), col("seq"))
      val cram = s.read.format("cram").option("unmapped", "true")
        .load(s"$Root/gm.cram")
        .select(lit("cram").as("fmt"), col("qname"), col("flag"), col("seq"))
      bam.unionAll(cram).orderBy("fmt", "qname")
    }, oracleFor("s16_scan_unmapped", "fmt, qname")),

    // tabix'd text region query (P3 over BGZF text): chunk selection from
    // the TBI + residual overlap re-check
    ("s17_region_tabix", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s17_region_tabix", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType))), Seq(
        Row("chr1", 15000L, 15100L)))
      s.read.format("bed").option("bed_schema", "bed3")
        .option("regions", "chr1:14001-16000").load(s"$Root/g.bed.gz")
        .orderBy("chrom", "start")
    }, oracleFor("s17_region_tabix", "chrom, start")),

    // two regions hitting the same index bin must not duplicate records
    // (P7 chunk-merge dedup on the text path)
    ("s18_region_dedup", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s18_region_dedup", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType))), Seq(
        Row("chr1", 15000L, 15100L),
        Row("chr1", 40000L, 40200L)))
      s.read.format("bed").option("bed_schema", "bed3")
        .option("regions", "chr1:14001-16000;chr1:15001-40500")
        .load(s"$Root/g.bed.gz")
        .orderBy("chrom", "start")
    }, oracleFor("s18_region_dedup", "chrom, start")),

    // SAM/BAM tags struct via the sampling discovery pass (M1): typed
    // NM:i/MD:Z/XF:f/XB:B,i plus XW widened int→string across records
    ("s19_bam_tags", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s19_bam_tags", StructType(Seq(
        StructField("qname", StringType), StructField("nm", LongType),
        StructField("md", StringType), StructField("xf", FloatType),
        StructField("xb", StringType),
        StructField("xw", StringType))), Seq(
        Row("t1", 2L, "2A1", 1.5f, "1,-2,3", null),
        Row("t2", 0L, null, null, null, "7"),
        Row("t3", null, null, null, null, "abc")))
      // no tags/tag_scan_rows options: schema comes from discovery; the
      // B:i array is flattened to a joined string (gate results stay
      // scalar so the driver's column hash is well-defined)
      s.read.format("bam").load(s"$Root/gt.bam")
        .select(col("qname"), col("tags.NM").as("nm"),
          col("tags.MD").as("md"), col("tags.XF").as("xf"),
          array_join(col("tags.XB").cast("array<string>"), ",").as("xb"),
          col("tags.XW").as("xw"))
        .orderBy("qname")
    }, oracleFor("s19_bam_tags", "qname")),

    // split planning (S5/S6/R1): the same logical rows scanned across
    // multiple partitions — BGZF virtual-position splits planned from the
    // tabix index (partition_from_index, chunksize=1 byte → one partition
    // per block) and plain-text newline-aligned byte-range splits. Any
    // duplicate or dropped record at a split boundary fails the row hash;
    // SplitPlanningSpec asserts the plans really are ≥3 partitions.
    ("s20_split_scan", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s20_split_scan", StructType(Seq(
        StructField("src", StringType), StructField("chrom", StringType),
        StructField("start", LongType), StructField("end", LongType))),
        tabixRows.map { case (c, st, e) => Row("bgzf", c, st, e) } ++
          splitBedRows.map { case (c, st, e) => Row("text", c, st, e) })
      val bgzf = s.read.format("bed").option("bed_schema", "bed3")
        .option("maxpartitionbytes", "1").load(s"$Root/g.bed.gz")
        .select(lit("bgzf").as("src"), col("chrom"), col("start"), col("end"))
      val text = s.read.format("bed").option("bed_schema", "bed3")
        .option("maxpartitionbytes", "32").load(s"$Root/split.bed")
        .select(lit("text").as("src"), col("chrom"), col("start"), col("end"))
      bgzf.unionAll(text).orderBy("src", "chrom", "start")
    }, oracleFor("s20_split_scan", "src, chrom, start")),

    // genotype layouts (P2): the same sites through genotype_by=sample,
    // genotype_by=field, and the binary BCF path must flatten to
    // identical per-sample GT alleles/phasing and DP values
    ("s21_genotypes", (s: SparkSession, _: String) => {
      val _ = fixtures
      val schema = StructType(Seq(
        StructField("src", StringType), StructField("pos", LongType),
        StructField("a11", IntegerType), StructField("a12", IntegerType),
        StructField("p12", BooleanType), StructField("dp1", LongType),
        StructField("a21", IntegerType), StructField("a22", IntegerType),
        StructField("p22", BooleanType), StructField("dp2", LongType)))
      def rowsFor(src: String) = Seq(
        Row(src, 100L, 0, 1, false, 10L, 1, 1, true, 20L),
        Row(src, 200L, 0, 0, true, 7L, null, 1, false, null))
      dumpExpected(s, "s21_genotypes", schema,
        Seq("bcf", "vcf_field", "vcf_sample").flatMap(rowsFor))
      def flatten(df: DataFrame, src: String, byField: Boolean): DataFrame = {
        def gt(sample: String) =
          if (byField) col(s"samples.GT.$sample") else col(s"samples.$sample.GT")
        def dp(sample: String) =
          if (byField) col(s"samples.DP.$sample") else col(s"samples.$sample.DP")
        df.select(lit(src).as("src"), col("pos"),
          gt("NA1")(0)("allele").as("a11"), gt("NA1")(1)("allele").as("a12"),
          gt("NA1")(1)("phased").as("p12"), dp("NA1").as("dp1"),
          gt("NA2")(0)("allele").as("a21"), gt("NA2")(1)("allele").as("a22"),
          gt("NA2")(1)("phased").as("p22"), dp("NA2").as("dp2"))
      }
      val bySample = flatten(s.read.format("vcf").load(s"$Root/gv.vcf"),
        "vcf_sample", byField = false)
      val byField = flatten(s.read.format("vcf")
        .option("genotype_by", "field").load(s"$Root/gv.vcf"),
        "vcf_field", byField = true)
      val bcf = flatten(s.read.format("bcf").load(s"$Root/gv.bcf"),
        "bcf", byField = false)
      bcf.unionAll(byField).unionAll(bySample).orderBy("src", "pos")
    }, oracleFor("s21_genotypes", "src, pos")),

    // uncompressed BAM (raw pass-through, no BGZF): same decode pipeline,
    // pseudo-block stream; cigar-extended end and unmapped row included
    ("s22_scan_ubam", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s22_scan_ubam", alnSchema, Seq(
        Row("u1", 0, "chr1", 11L, "4M", "ACGT", 14L),
        Row("u2", 16, "chr1", 51L, "2M1D2M", "GGCC", 55L),
        Row("u3", 4, null, null, null, "TTAA", null)))
      s.read.format("bam").option("tag_scan_rows", "0").load(s"$Root/u.bam")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end")
        .orderBy("qname")
    }, oracleFor("s22_scan_ubam", "qname")),

    // CRAM 3.1 codec stack end-to-end (S7): names via the tokeniser
    // (method 8), qualities via fqzcomp (7), unmapped bases via
    // adaptive arithmetic (6), the rest via rANS Nx16 (5)
    ("s23_scan_cram31", (s: SparkSession, _: String) => {
      val _ = fixtures
      dumpExpected(s, "s23_scan_cram31", StructType(
        alnSchema.fields.toSeq :+ StructField("qual", StringType)), Seq(
        Row("M9:1:1101:1000:2000", 99, "chr1", 5L, "8M", "ACGTACAC", 12L,
          "&+05:?DI"),
        Row("M9:1:1101:1000:2000", 147, "chr1", 11L, "6M", "ACGTAC", 16L,
          "IIIIII"),
        Row("M9:1:1101:1003:2001", 0, "chr1", 21L, "10M", "ACGTACGTAC",
          30L, "#$%&'()*+,"),
        Row("M9:1:1101:1007:2003", 4, null, null, null, "ACGT", null,
          "??@@")))
      s.read.format("cram").option("reference", s"$Root/ref.fa")
        .load(s"$Root/g31.cram")
        .select("qname", "flag", "rname", "pos", "cigar", "seq", "end",
          "qual")
        .orderBy("qname", "flag")
    }, oracleFor("s23_scan_cram31", "qname, flag")))
}
