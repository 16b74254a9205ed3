package graft.sources

import org.apache.spark.sql.connector.expressions.Transform

import graft.SparkSuite
import graft.fixtures.{BamFixture, BbiFixture}

/** M5 catalog metadata surface: chrom_names / chrom_sizes / zoom_levels /
  * index record counts exposed as DSv2 `Table.properties()`, mirroring the
  * per-handle metadata of the reference scanners
  * (`/root/reference/oxbow/src/alignment/scanner/bam.rs:74-89`,
  * `/root/reference/oxbow/src/bbi/scanner/bigwig.rs:94-117`). */
class TablePropsSpec extends SparkSuite {

  private def props(provider: org.apache.spark.sql.connector.catalog.TableProvider,
      path: String): java.util.Map[String, String] = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    val cism = new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts)
    val schema = provider.inferSchema(cism)
    provider.getTable(schema, Array.empty[Transform], opts).properties()
  }

  test("bam table surfaces chrom sizes and index record counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-props")
    val bam = dir.resolve("p.bam").toString
    BamFixture.write(bam, Seq(("chr1", 1000), ("chr2", 500)),
      Seq(
        BamFixture.Rec("a", 0, 0, 10, 30, Seq((4, 'M')), "ACGT", null),
        BamFixture.Rec("b", 0, 0, 50, 30, Seq((4, 'M')), "GGTT", null),
        BamFixture.Rec("c", 0, 1, 20, 30, Seq((4, 'M')), "CCAA", null)))
    val p = props(new BamDataSource(), bam)
    assert(p.get("chrom_names") == "chr1,chr2")
    assert(p.get("chrom_sizes") == "chr1:1000,chr2:500")
    assert(p.get("index.n_mapped") == "3")
    assert(p.get("index.n_unmapped") == "0")
    assert(p.get("index.record_counts") == "chr1:2:0,chr2:1:0")
  }

  test("bigwig table surfaces chrom sizes and zoom levels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-props-bw")
    val bw = dir.resolve("p.bw").toString
    BbiFixture.write(bw, Seq(("chr1", 0)),
      Seq(BbiFixture.WigSection(0, 1, 0, 0, 0, Seq((0L, 10L, 1f)))), Nil,
      Seq(BbiFixture.Zoom(0, 0, 10, 1, 1f, 1f, 1f, 1f)))
    val p = props(new BigWigDataSource(), bw)
    assert(p.get("chrom_names") == "chr1")
    assert(p.get("chrom_sizes") == "chr1:1000000")
    assert(p.get("zoom_levels") == "1000")
  }

  test("vcf and sam tables surface their header dictionaries") {
    val vcf = tempFile("p.vcf", Seq(
      "##fileformat=VCFv4.2",
      "##contig=<ID=chr1,length=248956422>",
      "##contig=<ID=chrM,length=16569>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
      "chr1\t100\t.\tA\tG\t.\tPASS\t."))
    val pv = props(new VcfDataSource(), vcf)
    assert(pv.get("chrom_names") == "chr1,chrM")
    assert(pv.get("chrom_sizes") == "chr1:248956422,chrM:16569")
    val sam = tempFile("p.sam", Seq(
      "@HD\tVN:1.6",
      "@SQ\tSN:chr9\tLN:138394717",
      "s1\t0\tchr9\t10\t60\t4M\t*\t0\t0\tACGT\tFFFF"))
    val ps = props(new SamDataSource(), sam)
    assert(ps.get("chrom_sizes") == "chr9:138394717")
  }

  test("cram and bcf tables surface their header dictionaries") {
    // reuse the scan-gate fixtures (idempotent writers); running any gate
    // query materializes them
    graft.ScanGate.queries.collectFirst {
      case ("s10_scan_cram", fn, _) => fn(spark, "unused").count()
    }
    val p = props(new CramDataSource(), s"${graft.ScanGate.Root}/g.cram")
    assert(p.get("chrom_names") == "chr1,chr2")
    assert(p.get("chrom_sizes") == "chr1:100,chr2:60")
    val pb = props(new BcfDataSource(), s"${graft.ScanGate.Root}/gv.bcf")
    assert(pb.get("chrom_sizes") == "chr1:100000")
  }

  test("DESCRIBE TABLE EXTENDED surfaces the properties through SQL") {
    // the user-visible half of M5: register a graft table with the
    // session catalog and read the metadata back without any API
    val dir = java.nio.file.Files.createTempDirectory("graft-props-sql")
    val bam = dir.resolve("p.bam").toString
    BamFixture.write(bam, Seq(("chr1", 1000), ("chr2", 500)),
      Seq(
        BamFixture.Rec("a", 0, 0, 10, 30, Seq((4, 'M')), "ACGT", null),
        BamFixture.Rec("b", 0, 0, 50, 30, Seq((4, 'M')), "GGTT", null),
        BamFixture.Rec("c", 0, 1, 20, 30, Seq((4, 'M')), "CCAA", null)))
    spark.sql(s"CREATE TABLE graft_props_bam USING bam OPTIONS (path '$bam')")
    try {
      val tp = spark.sql("DESCRIBE TABLE EXTENDED graft_props_bam")
        .collect()
        .find(_.getString(0) == "Table Properties")
        .map(_.getString(1))
      assert(tp.isDefined, "no Table Properties row in DESCRIBE output")
      assert(tp.get.contains("chrom_sizes=chr1:1000,chr2:500"), tp.get)
      assert(tp.get.contains("index.n_mapped=3"), tp.get)
      // and the registered table is queryable
      assert(spark.sql("SELECT count(*) FROM graft_props_bam")
        .collect()(0).getLong(0) == 3)
    } finally spark.sql("DROP TABLE graft_props_bam")
  }

  test("multi-file tables aggregate: chrom union, index counts summed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-props-multi")
    val bam1 = dir.resolve("a.bam").toString
    val bam2 = dir.resolve("b.bam").toString
    BamFixture.write(bam1, Seq(("chr1", 1000)),
      Seq(BamFixture.Rec("a", 0, 0, 10, 30, Seq((4, 'M')), "ACGT", null),
        BamFixture.Rec("b", 0, 0, 50, 30, Seq((4, 'M')), "GGTT", null)))
    BamFixture.write(bam2, Seq(("chr1", 1000), ("chr3", 700)),
      Seq(BamFixture.Rec("c", 0, 1, 20, 30, Seq((4, 'M')), "CCAA", null)))
    val p = graft.sources.common.GraftTableProps.forPaths(
      Seq(new org.apache.hadoop.fs.Path(bam1),
        new org.apache.hadoop.fs.Path(bam2)), indexStats = true)
    // union of both dictionaries, not just the first file's
    assert(p.get("chrom_names") == "chr1,chr3", p.toString)
    // counts summed across files: 2 on chr1 (file A) + 1 on chr3 (file B)
    assert(p.get("index.n_mapped") == "3", p.toString)
    assert(p.get("index.record_counts") == "chr1:2:0,chr3:1:0", p.toString)
    assert(!p.containsKey("properties_scope"))
  }

  test("missing companion metadata omits properties, never fails the read") {
    // FASTA without a .fai: the table still loads; properties are empty.
    val fa = tempFile("nofai.fa", Seq(">c", "ACGT"))
    val p = props(new FastaDataSource(), fa)
    assert(!p.containsKey("chrom_sizes"))
    val rows = spark.read.format("fasta").load(fa).count()
    assert(rows == 1)
  }
}
