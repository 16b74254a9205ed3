package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

class SequenceOpsSpec extends SparkSuite {

  /** Plain-text test FASTA: two contigs, 60-char wrapping, plus the
    * matching .fai written by hand. Returns (path, chr1seq, chr2seq). */
  private def writeFasta(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-seqops")
    val rnd = new scala.util.Random(91)
    val chr1 = Array.fill(5000)("ACGTN".charAt(rnd.nextInt(5))).mkString
    val chr2 = Array.fill(123)("acgt".charAt(rnd.nextInt(4))).mkString
    val w1 = chr1.grouped(60).mkString("\n")
    val w2 = chr2.grouped(60).mkString("\n")
    val h1 = ">chr1 first\n"
    val h2 = ">chr2\n"
    val content = h1 + w1 + "\n" + h2 + w2 + "\n"
    val fa = dir.resolve("t.fa")
    java.nio.file.Files.write(fa, content.getBytes("UTF-8"))
    val off1 = h1.length.toLong
    val off2 = off1 + w1.length + 1 + h2.length
    java.nio.file.Files.write(dir.resolve("t.fa.fai"),
      (s"chr1\t${chr1.length}\t$off1\t60\t61\n" +
        s"chr2\t${chr2.length}\t$off2\t60\t61\n").getBytes("UTF-8"))
    (fa.toString, chr1, chr2)
  }

  test("getFasta: extraction matches the streamed sequences exactly") {
    val s = spark
    import s.implicits._
    val (fa, chr1, chr2) = writeFasta()
    // cross-check against an INDEPENDENT path: the streaming full-scan
    // parser (no .fai byte math), substring'd driver-side
    val rnd = new scala.util.Random(92)
    val rows = (1 to 200).map { i =>
      val (c, len) = if (i % 3 == 0) ("chr2", 123) else ("chr1", 5000)
      val st = rnd.nextInt(len).toLong
      (i.toLong, c, st, math.min(len.toLong, st + 1 + rnd.nextInt(300)))
    }
    val got = SequenceOps.getFasta(rows.toDF("id", "chrom", "start", "end"),
        fa)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(4))).toSeq
    val want = rows.sortBy(_._1).map { case (id, c, st, en) =>
      val seq = if (c == "chr1") chr1 else chr2
      (id, seq.substring(st.toInt, en.toInt))
    }
    assert(got == want)
  }

  test("getFasta: clamps, inverted rows, missing contigs, null drops") {
    val s = spark
    import s.implicits._
    val (fa, chr1, _) = writeFasta()
    val df = Seq(
      (1L, "chr1", -5L, 10L),          // start clamps to 0
      (2L, "chr1", 4990L, 6000L),      // end clamps to 5000
      (3L, "chr1", 50L, 40L),          // inverted -> empty
      (4L, "chrZ", 0L, 10L),           // absent from index -> drops
      (5L, null.asInstanceOf[String], 0L, 10L)) // null chrom -> drops
      .toDF("id", "chrom", "start", "end")
    val got = SequenceOps.getFasta(df, fa)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, chr1.substring(0, 10)),
      (2L, chr1.substring(4990, 5000)),
      (3L, "")))
    // int coordinates widen; extra columns pass through
    val intDf = Seq((7, "chr1", 3, 9, "keep"))
      .toDF("id", "chrom", "start", "end", "extra")
    val r = SequenceOps.getFasta(intDf, fa).collect().head
    assert(r.getAs[String]("extra") == "keep" &&
      r.getAs[String]("sequence") == chr1.substring(3, 9))
    // seqCol collision fails loudly
    val e = intercept[IllegalArgumentException] {
      SequenceOps.getFasta(
        Seq((1L, "chr1", 0L, 1L, "x")).toDF("id", "chrom", "start",
          "end", "sequence"), fa)
    }
    assert(e.getMessage.contains("sequence"))
  }

  test("getFasta: bgzipped FASTA through the .gzi block map") {
    import graft.formats.Bgzf
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-seqops-gz")
    val chr1 = "ACGTTGCA" * 375 // 3000 bases
    val content = ">chr1 z\n" + chr1.grouped(60).mkString("\n") + "\n"
    val bytes = content.getBytes("UTF-8")
    val fa = dir.resolve("z.fa.gz")
    val out = new java.io.FileOutputStream(fa.toString)
    val gziEntries = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long)]
    var coff = 0L
    var uoff = 0L
    bytes.grouped(1024).foreach { chunk =>
      if (uoff > 0) gziEntries += ((coff, uoff))
      val block = Bgzf.writeBlock(chunk)
      out.write(block)
      coff += block.length
      uoff += chunk.length
    }
    out.write(Bgzf.EofBlock)
    out.close()
    val gzi = java.nio.ByteBuffer
      .allocate(8 + gziEntries.size * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gzi.putLong(gziEntries.size.toLong)
    gziEntries.foreach { case (c, u) => gzi.putLong(c).putLong(u) }
    java.nio.file.Files.write(dir.resolve("z.fa.gz.gzi"), gzi.array())
    java.nio.file.Files.write(dir.resolve("z.fa.gz.fai"),
      s"chr1\t3000\t${">chr1 z\n".length}\t60\t61\n".getBytes("UTF-8"))
    val got = SequenceOps.getFasta(
        Seq((1L, "chr1", 2000L, 2100L)).toDF("id", "chrom", "start",
          "end"), fa.toString)
      .collect().head.getAs[String]("sequence")
    assert(got == chr1.substring(2000, 2100))
  }

  test("nucContent: counts, fractions, case-insensitivity, empty rows") {
    val s = spark
    import s.implicits._
    val (fa, chr1, chr2) = writeFasta()
    val df = Seq(
      (1L, "chr1", 10L, 200L),
      (2L, "chr2", 0L, 123L),  // lowercase contig
      (3L, "chr1", 7L, 7L))    // empty -> null fractions
      .toDF("id", "chrom", "start", "end")
    val rows = SequenceOps.nucContent(df, fa).orderBy("id").collect()
    def expect(seq: String) = {
      val up = seq.toUpperCase
      (up.length.toLong, up.count(_ == 'A').toLong,
        up.count(_ == 'C').toLong, up.count(_ == 'G').toLong,
        up.count(_ == 'T').toLong, up.count(_ == 'N').toLong)
    }
    val w1 = expect(chr1.substring(10, 200))
    val w2 = expect(chr2)
    for ((r, w) <- rows.take(2).zip(Seq(w1, w2))) {
      assert((r.getAs[Long]("seq_len"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_c"), r.getAs[Long]("n_g"),
        r.getAs[Long]("n_t"), r.getAs[Long]("n_n")) == w)
      assert(r.getAs[Long]("n_other") == 0L)
      val at = (w._2 + w._5).toDouble / w._1
      assert(math.abs(r.getAs[Double]("pct_at") - at) < 1e-12)
    }
    val empty = rows(2)
    assert(empty.getAs[Long]("seq_len") == 0L &&
      empty.isNullAt(empty.fieldIndex("pct_at")))
  }

  test("getFasta -s: reverse complement only on '-' rows; IUPAC + case") {
    val s = spark
    import s.implicits._
    val (fa, chr1, chr2) = writeFasta()
    def rc(seq: String): String = seq.reverseIterator.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
      case 'a' => 't'; case 'c' => 'g'; case 'g' => 'c'; case 't' => 'a'
      case 'N' => 'N'; case 'n' => 'n'; case other => other
    }.mkString
    val df = Seq(
      (1L, "chr1", 100L, 160L, "+"),
      (2L, "chr1", 100L, 160L, "-"),   // uppercase ACGTN source
      (3L, "chr2", 5L, 60L, "-"),      // lowercase acgt source
      (4L, "chr1", 100L, 160L, "."),
      (5L, "chr1", 100L, 160L, null.asInstanceOf[String]))
      .toDF("id", "chrom", "start", "end", "strand")
    val got = SequenceOps.getFasta(df, fa, strand = "strand")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("sequence"))).toSeq
    val fwd1 = chr1.substring(100, 160)
    assert(got == Seq(
      (1L, fwd1), (2L, rc(fwd1)), (3L, rc(chr2.substring(5, 60))),
      (4L, fwd1), (5L, fwd1)))
    // full IUPAC alphabet sanity on the column function itself
    val one = Seq(("MRWSYKVHDBNmrwsykvhdbn-X"))
      .toDF("x")
      .select(SequenceOps.reverseComplement(col("x")).as("y"))
      .collect().head.getString(0)
    assert(one == "X-nvhdbmrswykNVHDBMRSWYK")
  }

  test("getFasta -name / header column formats") {
    val s = spark
    import s.implicits._
    val (fa, chr1, _) = writeFasta()
    val df = Seq(
      (1L, "chr1", 10L, 20L, "-", "geneA"),
      (2L, "chr1", 30L, 40L, null.asInstanceOf[String], "geneB"))
      .toDF("id", "chrom", "start", "end", "strand", "name")
    // name + strand: bedtools name::chrom:start-end(strand), null
    // strand renders the unknown-strand dot
    val h1 = SequenceOps.getFasta(df, fa, strand = "strand",
        name = "name")
      .orderBy("id").collect()
      .map(_.getAs[String]("fasta_header")).toSeq
    assert(h1 == Seq("geneA::chr1:10-20(-)", "geneB::chr1:30-40(.)"))
    // emitHeader without name, strand-blind: bare coordinates
    val h2 = SequenceOps.getFasta(df, fa, emitHeader = true)
      .orderBy("id").collect()
      .map(_.getAs[String]("fasta_header")).toSeq
    assert(h2 == Seq("chr1:10-20", "chr1:30-40"))
    // header collision fails loudly
    val e = intercept[IllegalArgumentException] {
      SequenceOps.getFasta(
        Seq((1L, "chr1", 0L, 1L, "x")).toDF("id", "chrom", "start",
          "end", "fasta_header"), fa, emitHeader = true)
    }
    assert(e.getMessage.contains("fasta_header"))
  }

  test("getFasta -split: block concatenation, whole-sequence revcomp") {
    val s = spark
    import s.implicits._
    val (fa, chr1, _) = writeFasta()
    def rc(seq: String): String = seq.reverseIterator.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'
      case 'N' => 'N'; case other => other
    }.mkString
    val df = Seq(
      (1L, "chr1", 100L, 200L, "+", Seq(0L, 50L), Seq(10L, 20L)),
      (2L, "chr1", 100L, 200L, "-", Seq(0L, 50L), Seq(10L, 20L)),
      // null arrays: plain whole-interval fallback
      (3L, "chr1", 100L, 120L, "+", null.asInstanceOf[Seq[Long]],
        null.asInstanceOf[Seq[Long]]),
      // shorter sizes array: extra start ignored, no crash
      (4L, "chr1", 100L, 200L, "+", Seq(0L, 50L, 90L), Seq(10L, 20L)))
      .toDF("id", "chrom", "start", "end", "strand", "bs", "sz")
    val got = SequenceOps.getFasta(df, fa, strand = "strand",
        blockStarts = "bs", blockSizes = "sz")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("sequence"))).toSeq
    val spliced = chr1.substring(100, 110) + chr1.substring(150, 170)
    assert(got == Seq(
      (1L, spliced),
      (2L, rc(spliced)),   // revcomp of the CONCATENATION, not per block
      (3L, chr1.substring(100, 120)),
      (4L, spliced)))
    // both-or-neither arg contract
    val e = intercept[IllegalArgumentException] {
      SequenceOps.getFasta(df, fa, blockStarts = "bs")
    }
    assert(e.getMessage.contains("-split"))
    // non-array column fails at analysis time, not in a task
    val e2 = intercept[IllegalArgumentException] {
      SequenceOps.getFasta(df, fa, blockStarts = "strand",
        blockSizes = "sz")
    }
    assert(e2.getMessage.contains("integral-array"))
  }

  test("nucContent -s: A/T and C/G swap on '-' rows, invariants hold") {
    val s = spark
    import s.implicits._
    val (fa, chr1, _) = writeFasta()
    val df = Seq(
      (1L, "chr1", 10L, 200L, "+"),
      (2L, "chr1", 10L, 200L, "-"))
      .toDF("id", "chrom", "start", "end", "strand")
    val rows = SequenceOps.nucContent(df, fa, strand = "strand")
      .orderBy("id").collect()
    val (p, m) = (rows(0), rows(1))
    assert(p.getAs[Long]("n_a") == m.getAs[Long]("n_t") &&
      p.getAs[Long]("n_t") == m.getAs[Long]("n_a") &&
      p.getAs[Long]("n_c") == m.getAs[Long]("n_g") &&
      p.getAs[Long]("n_g") == m.getAs[Long]("n_c") &&
      p.getAs[Long]("n_n") == m.getAs[Long]("n_n") &&
      p.getAs[Long]("seq_len") == m.getAs[Long]("seq_len"))
    assert(math.abs(p.getAs[Double]("pct_gc") -
      m.getAs[Double]("pct_gc")) < 1e-15)
  }

  test("getFasta plan is narrow: no shuffle") {
    val s = spark
    import s.implicits._
    val (fa, _, _) = writeFasta()
    val df = (1 to 50).map(i => (i.toLong, "chr1", i * 10L, i * 10L + 5L))
      .toDF("id", "chrom", "start", "end")
    val out = SequenceOps.getFasta(df, fa)
    out.collect()
    // the operator is mapPartitions over the input's own partitioning:
    // partition count is preserved, nothing exchanges
    assert(out.rdd.getNumPartitions == df.rdd.getNumPartitions)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
