package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.formats.GraftMeta

/** Validation against real, tool-produced files shipped with the reference
  * (`/root/reference/fixtures/`, public test data — read-only). Unlike the
  * self-authored fixture writers (graft.fixtures.*), these files were
  * produced by samtools/bcftools/UCSC tools, so they exercise BAI/TBI/CSI
  * index layouts and header conventions our own writers can't get wrong in
  * the same way.
  *
  * Every expected value below is hand-derived from the *text* twin of the
  * binary file (e.g. sample.sam for sample.bam, sample.vcf for sample.bcf)
  * or from shell-level inspection (`zcat | wc -l`, awk overlap filters) —
  * never from our own readers, so the checks are not circular.
  */
class RealFixtureSpec extends SparkSuite {

  private val fx = "/root/reference/fixtures"
  private def have(name: String): Boolean =
    java.nio.file.Files.isReadable(java.nio.file.Paths.get(s"$fx/$name"))

  private def withFixture(names: String*)(body: => Unit): Unit =
    if (names.forall(have)) body else cancel(s"fixtures missing: $names")

  // sample.bam: real 10-read Illumina BAM (24 hg contigs, samtools-written).
  // Ground truth derived by walking the BGZF-decompressed BAM records with
  // python struct (not our reader): 10 records, 4 on chr1 at 1-based pos
  // 10542, 10546, 946457, 1014060; 3 on chr3; 1 chrX; 2 chrY.
  test("real: sample.bam 10-read Illumina file (samtools-written)") {
    withFixture("sample.bam") {
      val bam = spark.read.format("bam").load(s"$fx/sample.bam")
        .select("qname", "flag", "rname", "pos", "mapq", "cigar", "seq")
        .collect()
      assert(bam.length == 10)
      assert(bam.count(_.getString(2) == "chr1") == 4)
      assert(bam.count(_.getString(2) == "chrY") == 2)
      val r = bam.find(_.getString(0) ==
        "HWI-BRUNOP16X_0001:3:48:4861:11838#0").get
      assert(r.getInt(1) == 163 && r.getString(2) == "chr1" &&
        r.getLong(3) == 10542L && r.getInt(4) == 0 &&
        r.getString(5) == "50M" &&
        r.getString(6).startsWith("CGAAATCTGTGCAGAGGAGA"))
      val r2 = bam.find(_.getString(0) ==
        "HWI-BRUNOP16X_0001:3:27:10302:58768#0").get
      assert(r2.getInt(1) == 16 && r2.getLong(3) == 1014060L &&
        r2.getInt(4) == 37 && r2.getString(5) == "75M")
    }
  }

  test("real: sample.bam.bai region query (index written by samtools)") {
    withFixture("sample.bam", "sample.bam.bai") {
      val chr1 = spark.read.format("bam").option("regions", "chr1:1-100000")
        .load(s"$fx/sample.bam")
      assert(chr1.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(10542L, 10546L))
      val y = spark.read.format("bam").option("regions", "chrY")
        .load(s"$fx/sample.bam")
      assert(y.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(586185L, 587561L))
    }
  }

  // sample.sam IS a hand-written 3-record file (text inspected directly):
  //   r004 0  chr1 16 30 6M14N1I5M * 0 0   ATAGCTCTCAGC *
  //   r003 16 chr1 29 30 6H5M      * 0 0   TAGGC        *
  //   r001 83 chr2 37 30 9M        = 7 -39 CAGCGCCAT    *
  test("real: sample.sam text scan") {
    withFixture("sample.sam") {
      val sam = spark.read.format("sam").load(s"$fx/sample.sam")
        .select("qname", "flag", "rname", "pos", "mapq", "cigar", "seq")
        .orderBy("qname").collect()
      assert(sam.map(_.getString(0)).toSeq == Seq("r001", "r003", "r004"))
      assert(sam(2).getString(5) == "6M14N1I5M" &&
        sam(2).getString(6) == "ATAGCTCTCAGC")
      assert(sam(0).getInt(1) == 83 && sam(0).getString(2) == "chr2" &&
        sam(0).getLong(3) == 37)
    }
  }

  // sample.cram is the samtools CRAM of sample.sam's three records (same
  // @SQ dictionary as sample-ref.fa), CRAM 3.0.
  test("real: sample.cram (CRAM 3.0) matches the SAM twin") {
    withFixture("sample.cram", "sample-ref.fa") {
      val df = spark.read.format("cram").option("reference", s"$fx/sample-ref.fa")
        .load(s"$fx/sample.cram")
        .select("qname", "flag", "rname", "pos", "mapq", "cigar", "seq")
        .orderBy("qname").collect()
      assert(df.length == 3)
      assert(df.map(_.getString(0)).toSeq == Seq("r001", "r003", "r004"))
      assert(df(2).getString(5) == "6M14N1I5M")
      assert(df(2).getString(6) == "ATAGCTCTCAGC")
      assert(df(0).getLong(3) == 37 && df(0).getString(6) == "CAGCGCCAT")
    }
  }

  test("real: sample.cram.crai region query") {
    withFixture("sample.cram", "sample.cram.crai", "sample-ref.fa") {
      val chr2 = spark.read.format("cram")
        .option("reference", s"$fx/sample-ref.fa")
        .option("regions", "chr2").load(s"$fx/sample.cram")
      assert(chr2.select("qname").collect().map(_.getString(0)).toSet ==
        Set("r001"))
    }
  }

  // sample.ubam: htslib's UNCOMPRESSED BAM (no BGZF wrapper) — the SAM
  // spec's example trio. Ground truth from a python-struct walk of the
  // raw bytes: r001 flag163 chr1 pos7 mapq30, r002 pos9 9-op cigar,
  // r003 pos9.
  test("real: sample.ubam uncompressed BAM raw pass-through") {
    withFixture("sample.ubam") {
      val df = spark.read.format("bam").option("tag_scan_rows", "0")
        .load(s"$fx/sample.ubam")
        .select("qname", "flag", "rname", "pos", "mapq")
        .orderBy("qname").collect()
      assert(df.length == 3)
      assert(df.map(_.getString(0)).toSeq == Seq("r001", "r002", "r003"))
      assert(df(0).getInt(1) == 163 && df(0).getString(2) == "chr1" &&
        df(0).getLong(3) == 7L && df(0).getInt(4) == 30)
      assert(df(1).getLong(3) == 9L && df(2).getLong(3) == 9L)
    }
  }

  // sample.ubcf: uncompressed BCF2.2 twin of sample.bcf (same 100 chrY
  // records — first positions confirmed by a python-struct frame walk).
  test("real: sample.ubcf uncompressed BCF raw pass-through") {
    withFixture("sample.ubcf") {
      val u = spark.read.format("bcf").load(s"$fx/sample.ubcf")
      assert(u.count() == 100)
      assert(u.orderBy("pos").select("pos").collect().map(_.getLong(0))
        .take(3).toSeq == Seq(2761189L, 6932688L, 7225794L))
    }
  }

  // sample-ref.cram: CRAM *3.1* twin of sample-ref.sam (5 reads over the
  // 2-contig sample-ref.fa) — rANS Nx16 block codecs end-to-end, not just
  // the byte-level codec test in RansNx16CodecSpec.
  test("real: sample-ref.cram (CRAM 3.1) matches its SAM twin") {
    withFixture("sample-ref.cram", "sample-ref.fa") {
      val df = spark.read.format("cram")
        .option("reference", s"$fx/sample-ref.fa")
        .load(s"$fx/sample-ref.cram")
        .select("qname", "flag", "rname", "pos", "mapq", "cigar", "seq")
        .orderBy("pos", "qname").collect()
      assert(df.length == 5)
      assert(df.map(_.getString(0)).sorted.toSeq ==
        Seq("read1", "read1", "read2", "read3", "read4"))
      val r1 = df.find(r => r.getString(0) == "read1" && r.getInt(1) == 99).get
      assert(r1.getString(2) == "chr1" && r1.getLong(3) == 1L &&
        r1.getInt(4) == 30 && r1.getString(5) == "10M" &&
        r1.getString(6) == "ACGTACGTAC")
      val r4 = df.find(_.getString(0) == "read4").get
      assert(r4.getString(2) == "chr2" && r4.getLong(3) == 1L &&
        r4.getString(5) == "5M2I5M" && r4.getString(6) == "TGCATATGCATG")
    }
  }

  test("real: sample-ref.cram.crai region query on the 3.1 file") {
    withFixture("sample-ref.cram", "sample-ref.cram.crai", "sample-ref.fa") {
      val chr2 = spark.read.format("cram")
        .option("reference", s"$fx/sample-ref.fa")
        .option("regions", "chr2").load(s"$fx/sample-ref.cram")
      assert(chr2.select("qname").collect().map(_.getString(0)).sorted
        .toSeq == Seq("read3", "read4"))
    }
  }

  // sample.sam.gz + .tbi: tabix'd SAM text (the bgzf text path with the
  // SAM preset) — r004 chr1:16 cigar 6M14N1I5M (ref span 25 → covers
  // 16..40), r003 chr1:29 (6H5M → 29..33), r001 chr2:37.
  test("real: tabix'd SAM region query") {
    withFixture("sample.sam.gz", "sample.sam.gz.tbi") {
      val q = spark.read.format("sam").option("tag_scan_rows", "0")
        .option("regions", "chr1:25-35").load(s"$fx/sample.sam.gz")
      // both chr1 reads overlap 25-35 once the cigar span is applied
      assert(q.select("qname").collect().map(_.getString(0)).sorted.toSeq ==
        Seq("r003", "r004"))
      val all = spark.read.format("sam").option("tag_scan_rows", "0")
        .option("regions", "chr1;chr2").load(s"$fx/sample.sam.gz")
      assert(all.count() == 3)
    }
  }

  // sample.vcf.gz ships BOTH a .tbi and a .csi: staging copies with only
  // one index each must agree (index auto-detection R2 across layouts).
  test("real: CSI and TBI indexes give identical VCF region results") {
    withFixture("sample.vcf.gz", "sample.vcf.gz.tbi", "sample.vcf.gz.csi") {
      val dir = java.nio.file.Files.createTempDirectory("graft-idx")
      def stage(idx: String): String = {
        val d = java.nio.file.Files.createDirectory(dir.resolve(idx))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$fx/sample.vcf.gz"),
          d.resolve("sample.vcf.gz"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$fx/sample.vcf.gz.$idx"),
          d.resolve(s"sample.vcf.gz.$idx"))
        d.resolve("sample.vcf.gz").toString
      }
      def posAt(path: String): Seq[Long] =
        spark.read.format("vcf").option("regions", "1:60000-800000")
          .load(path).select("pos").collect().map(_.getLong(0)).sorted.toSeq
      val viaTbi = posAt(stage("tbi"))
      val viaCsi = posAt(stage("csi"))
      assert(viaTbi == Seq(65872L, 69511L, 762273L))
      assert(viaCsi == viaTbi)
    }
  }

  // sample.vcf: 25 records, samples NA12878i NA12891 NA12892; chrom "1" has
  // 5 records at pos 65872, 69511, 762273, ... (derived via grep/awk).
  test("real: sample.vcf and sample.vcf.gz full scans") {
    withFixture("sample.vcf", "sample.vcf.gz") {
      val vcf = spark.read.format("vcf").load(s"$fx/sample.vcf")
      assert(vcf.count() == 25)
      val chr1 = vcf.where(col("chrom") === "1")
      assert(chr1.count() == 5)
      assert(chr1.orderBy("pos").select("pos").collect().take(3)
        .map(_.getLong(0)).toSeq == Seq(65872L, 69511L, 762273L))
      // samples column structure from the header line
      val sampleField = vcf.schema("samples").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(sampleField.fieldNames.toSeq ==
        Seq("NA12878i", "NA12891", "NA12892"))
      // bgzipped twin decodes identically
      val gz = spark.read.format("vcf").load(s"$fx/sample.vcf.gz")
      assert(gz.count() == 25)
    }
  }

  test("real: sample.vcf.gz region query via real tabix index") {
    withFixture("sample.vcf.gz", "sample.vcf.gz.tbi") {
      val q = spark.read.format("vcf").option("regions", "1:60000-800000")
        .load(s"$fx/sample.vcf.gz")
      assert(q.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(65872L, 69511L, 762273L))
    }
  }

  // sample.bcf: bcftools-written 1000 Genomes chrY excerpt — 100 records on
  // contig "Y", 1233 samples. Ground truth derived by walking the BCF2.2
  // record framing (l_shared/l_indiv) with python struct, not our reader:
  // first three 1-based positions 2761189, 6932688, 7225794; eleven records
  // in Y:2000000-8000000.
  test("real: sample.bcf (bcftools, 1233 samples) record framing") {
    withFixture("sample.bcf") {
      val bcf = spark.read.format("bcf").load(s"$fx/sample.bcf")
      assert(bcf.count() == 100)
      assert(bcf.select("chrom").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("Y"))
      assert(bcf.orderBy("pos").select("pos").collect().map(_.getLong(0))
        .take(3).toSeq == Seq(2761189L, 6932688L, 7225794L))
      val samples = bcf.schema("samples").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(samples.fields.length == 1233)
    }
  }

  test("real: sample.bcf.csi region query") {
    withFixture("sample.bcf", "sample.bcf.csi") {
      val q = spark.read.format("bcf").option("regions", "Y:2000000-8000000")
        .load(s"$fx/sample.bcf")
      val pos = q.select("pos").collect().map(_.getLong(0)).sorted.toSeq
      assert(pos.length == 11)
      assert(pos.head == 2761189L && pos.last == 7990969L)
    }
  }

  // sample.bed: 66 rows, 22 chroms; chr10 rows overlapping [200000,700000):
  // (50000,250000,AB) (250000,650000,A2) (650000,800000,AB)
  test("real: sample.bed and tabix'd bed.gz region query") {
    withFixture("sample.bed", "sample.bed.gz", "sample.bed.gz.tbi") {
      val bed = spark.read.format("bed").option("bed_schema", "bed9")
        .load(s"$fx/sample.bed")
      assert(bed.count() == 66)
      assert(bed.select("chrom").distinct().count() == 22)
      val q = spark.read.format("bed").option("bed_schema", "bed9")
        .option("regions", "chr10:200001-700000") // 1-based closed region
        .load(s"$fx/sample.bed.gz")
      val rows = q.select("start", "end", "name").orderBy("start").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
        Seq((50000L, 250000L, "AB"), (250000L, 650000L, "A2"),
          (650000L, 800000L, "AB")))
    }
  }

  // ENCFF758CQW.100.bed.gz: real ENCODE narrowPeak excerpt (plain gzip),
  // 100 rows, 8 of them on chr1 (zcat | cut -f1 | sort | uniq -c).
  test("real: ENCODE narrowPeak bed6+4 over plain gzip") {
    withFixture("ENCFF758CQW.100.bed.gz") {
      val np = spark.read.format("bed").option("bed_schema", "bed6+4")
        .load(s"$fx/ENCFF758CQW.100.bed.gz")
      assert(np.count() == 100)
      assert(np.where(col("chrom") === "chr1").count() == 8)
      // first line: chr1 86499906 86500478 . 1000 . 269.56463 -1.0 4.53508 306
      val r = np.where(col("start") === 86499906L).collect()(0)
      assert(r.getString(0) == "chr1" && r.getLong(2) == 86500478L)
      assert(r.getInt(4) == 1000)
    }
  }

  // sample.gff / sample.gtf: 20 records each (GENCODE excerpts);
  // sorted twins carry real tabix indexes.
  test("real: GENCODE gff/gtf scans and tabix'd region query") {
    withFixture("sample.gff", "sample.gtf", "sample.sorted.gff.gz",
        "sample.sorted.gff.gz.tbi") {
      val gff = spark.read.format("gff").load(s"$fx/sample.gff")
      assert(gff.count() == 20)
      val attrs = gff.schema("attributes").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(attrs.fieldNames.contains("gene_name"))
      assert(gff.where(col("seqid") === "chr1").count() == 2)
      val gtf = spark.read.format("gtf").load(s"$fx/sample.gtf")
      assert(gtf.count() == 20)
      val gattrs = gtf.schema("attributes").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(gattrs.fieldNames.contains("gene_id"))
      assert(gtf.where(col("seqid") === "chr6").count() == 4)
      // chr1 exon at 497210..497299 (1-based) via the real tabix index
      val q = spark.read.format("gff").option("regions", "chr1:497000-498000")
        .load(s"$fx/sample.sorted.gff.gz")
      val rows = q.select("start", "end").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 497210L &&
        rows(0).getLong(1) == 497299L)
    }
  }

  // sample.fasta: 20 seqs (seq1..seq20), each 40 bp; .fai is tool-written.
  test("real: FASTA with real .fai, gzi'd twin, and FASTQ") {
    withFixture("sample.fasta", "sample.fasta.fai", "sample.fastq") {
      val fa = spark.read.format("fasta").load(s"$fx/sample.fasta")
      assert(fa.count() == 20)
      val s1 = fa.where(col("name") === "seq1").collect()(0)
      assert(s1.getString(s1.fieldIndex("sequence")) ==
        "ATGCATGCATGCATGCATGCATGCATGCATGCATGCATGC")
      // region slice through the real FAI (FastaFaiSource path)
      val sliced = spark.read.format("fasta")
        .option("regions", "seq2:5-12").load(s"$fx/sample.fasta")
      val s2 = sliced.collect()
      assert(s2.length == 1 &&
        s2(0).getString(s2(0).fieldIndex("sequence")).length == 8)
      val fq = spark.read.format("fastq").load(s"$fx/sample.fastq")
      assert(fq.count() == 20)
      val q1 = fq.where(col("name") === "seq1").collect()(0)
      assert(q1.getString(q1.fieldIndex("sequence")) ==
        "ATGCATGCATGCATGCATGCATGCATGCATGCATGCATGC")
      assert(q1.getString(q1.fieldIndex("quality")).startsWith("IIIII"))
    }
  }

  test("real: bgzf'd FASTQ twin") {
    withFixture("sample.fastq.bgz") {
      val fq = spark.read.format("fastq").load(s"$fx/sample.fastq.bgz")
      assert(fq.count() == 20)
    }
  }

  // sample.bw / sample.bb are UCSC-tool-written chr21 files with no text
  // twin. Correctness is checked by *internal conformance*: the tool wrote
  // both the full-resolution data blocks and the zoom summaries, so our
  // decode of the two independent sections must reconcile — covered bases
  // at raw resolution == sum of zoom validCount at the coarsest level that
  // still covers every interval, and the value-weighted sums must agree.
  test("real: sample.bw raw scan reconciles with its own zoom summaries") {
    withFixture("sample.bw") {
      val raw = spark.read.format("bigwig").load(s"$fx/sample.bw")
      val rawAgg = raw.agg(
        count(lit(1)), sum(col("end") - col("start")),
        sum((col("end") - col("start")) * col("value"))).collect()(0)
      assert(rawAgg.getLong(0) == 100)
      val chroms = raw.select("chrom").distinct().collect().map(_.getString(0))
      assert(chroms.toSeq == Seq("chr21"))
      // chrom dictionary from the B+ tree header (separate code path)
      assert(GraftMeta.chromSizes(s"$fx/sample.bw").keySet == Set("chr21"))
      val zooms = GraftMeta.zoomLevels(s"$fx/sample.bw")
      assert(zooms.nonEmpty)
      val zoom = spark.read.format("bigwig").option("zoom_level", "0")
        .load(s"$fx/sample.bw")
      val zAgg = zoom.agg(sum("bases_covered"),
        sum(col("sum_val"))).collect()(0)
      // covered bases and value mass must match between the two sections
      assert(zAgg.getLong(0) == rawAgg.getLong(1))
      assert(math.abs(zAgg.getDouble(1) - rawAgg.getDouble(2)) < 1e-3)
    }
  }

  test("real: sample.bb BigBed scan (UCSC-tool-written)") {
    withFixture("sample.bb") {
      val bb = spark.read.format("bigbed").load(s"$fx/sample.bb")
      val rows = bb.collect()
      assert(rows.length == 100)
      assert(rows.forall(r => r.getString(0) == "chr21"))
      assert(rows.forall(r => r.getLong(2) > r.getLong(1)))
      assert(GraftMeta.chromSizes(s"$fx/sample.bb").keySet == Set("chr21"))
      // indexed region query against the tool-written R-tree: count rows
      // in a window via the full scan, then query the same window
      val lo = 14797911L; val hi = 17878829L
      val expect = rows.count(r => r.getLong(1) < hi && r.getLong(2) > lo)
      val q = spark.read.format("bigbed")
        .option("regions", s"chr21:${lo + 1}-$hi")
        .load(s"$fx/sample.bb")
      assert(q.count() == expect && expect >= 2)
    }
  }
}
