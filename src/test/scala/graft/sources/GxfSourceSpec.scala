package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

class GxfSourceSpec extends SparkSuite {

  private val gtf = Seq(
    "#!genome-build test",
    "chr1\tHAVANA\tgene\t11869\t14409\t.\t+\t.\t" +
      "gene_id \"ENSG1\"; gene_name \"DDX11L1\"; level 2;",
    "chr1\tHAVANA\ttranscript\t11869\t12227\t5.5\t+\t0\t" +
      "gene_id \"ENSG1\"; transcript_id \"ENST1\"; level 2;")

  private val gff = Seq(
    "##gff-version 3",
    "chr1\t.\tgene\t1000\t2000\t.\t+\t.\tID=gene1;Name=G1;Alias=a,b,c",
    "chr1\t.\tmRNA\t1000\t1500\t0.9\t-\t1\tID=rna1;Parent=gene1;Note=hi%2Cthere")

  test("gtf: fixed columns + discovered string attributes") {
    val df = spark.read.format("gtf").load(tempFile("s.gtf", gtf))
    assert(df.columns.toSeq == Seq("seqid", "source", "type", "start", "end",
      "score", "strand", "frame", "attributes"))
    val attrs = df.schema("attributes").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(attrs.fieldNames.toSeq ==
      Seq("gene_id", "gene_name", "level", "transcript_id"))
    val rows = df.orderBy("start", "type").collect()
    assert(rows(0).getLong(3) == 11869 && rows(0).getLong(4) == 14409)
    val a0 = rows(0).getStruct(8)
    assert(a0.getString(0) == "ENSG1" && a0.getString(1) == "DDX11L1" &&
      a0.getString(2) == "2" && a0.isNullAt(3))
    assert(rows(1).getFloat(5) == 5.5f && rows(1).getInt(7) == 0)
  }

  test("gtf: nested attribute projection returns the requested key") {
    val df = spark.read.format("gtf").load(tempFile("sn.gtf", gtf))
    val r = df.orderBy("start", "type")
      .select(col("attributes.gene_id").as("g")).collect()
    assert(r(0).getString(0) == "ENSG1")
  }

  test("gff3: multi-value attributes become arrays, percent-decoded") {
    val df = spark.read.format("gff").load(tempFile("s.gff", gff))
    val attrs = df.schema("attributes").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(attrs("Alias").dataType.typeName == "array")
    val rows = df.orderBy(col("end").desc).collect()
    val a0 = rows(0).getStruct(8)
    assert(a0.getSeq[String](attrs.fieldIndex("Alias")) == Seq("a", "b", "c"))
    val a1 = rows(1).getStruct(8)
    assert(a1.getString(attrs.fieldIndex("Note")) == "hi,there")
  }

  test("gxf: explicit attributes option skips discovery") {
    val df = spark.read.format("gtf")
      .option("attributes", "gene_id:string")
      .load(tempFile("s2.gtf", gtf))
    val attrs = df.schema("attributes").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(attrs.fieldNames.toSeq == Seq("gene_id"))
  }

  test("gxf: coords=01 shifts start to zero-based half-open") {
    val df = spark.read.format("gff").option("coords", "01")
      .load(tempFile("s3.gff", gff))
    val r = df.orderBy(col("end").desc).collect()(0)
    assert(r.getLong(3) == 999 && r.getLong(4) == 2000)
  }

  test("gxf: regions option filters (native 1-based coords)") {
    val df = spark.read.format("gff")
      .option("regions", "chr1:1600-1800")
      .load(tempFile("s4.gff", gff))
    val rows = df.collect()
    assert(rows.length == 1) // only gene1 [1000,2000] overlaps
  }

  test("gtf: quoted values keep semicolons and literal percent signs") {
    val lines = Seq(
      "chr1\tsrc\tgene\t1\t100\t.\t+\t.\t" +
        "gene_id \"g1\"; note \"50% similar; see docs\"; level 2;")
    val df = spark.read.format("gtf").load(tempFile("q.gtf", lines))
    val r = df.select(col("attributes.gene_id"), col("attributes.note"),
      col("attributes.level")).collect()(0)
    assert(r.getString(0) == "g1")
    assert(r.getString(1) == "50% similar; see docs", r.getString(1))
    assert(r.getString(2) == "2")
  }

  test("gff3: percent-decode handles stray % and keeps '+' literal") {
    val lines = Seq(
      "chr1\tsrc\tgene\t1\t100\t.\t+\t.\t" +
        "ID=g1;Note=a%2Cb+c 100%25 and 50% raw")
    val df = spark.read.format("gff").load(tempFile("p.gff", lines))
    val note = df.select(col("attributes.Note")).collect()(0).getString(0)
    // %2C → ',', %25 → '%', '+' stays, stray '% r' passes through
    assert(note == "a,b+c 100% and 50% raw", note)
  }

  test("null region columns fail only the constraints referencing them") {
    // g1 has end='.' (null): a pushed start-only filter must keep it —
    // the residual predicate used to drop every null-coordinate row
    // whenever ANY region-style filter was pushed, returning fewer rows
    // than Spark's own evaluation of the same filter
    val lines = Seq(
      "##gff-version 3",
      "chr1\t.\tgene\t100\t.\t.\t+\t.\tID=g1",
      "chr1\t.\tgene\t5000\t6000\t.\t+\t.\tID=g2",
      "chr2\t.\tgene\t150\t300\t.\t+\t.\tID=g3")
    val path = tempFile("nulls.gff", lines)
    def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("attributes.ID")).collect().map(_.getString(0)).toSet
    val df = spark.read.format("gff").load(path)
    // start-only filter: null end is irrelevant, g1 qualifies
    assert(ids(df.where(col("start") < 1000)) == Set("g1", "g3"))
    // end filter: null end fails it (SQL semantics), start doesn't help
    assert(ids(df.where(col("end") > 200)) == Set("g2", "g3"))
    // chrom-only filter: null end irrelevant again
    assert(ids(df.where(col("seqid") === "chr1")) == Set("g1", "g2"))
    // a null In-list element must narrow, not NPE the planner/reader
    assert(ids(df.where(col("seqid").isin("chr2", null))) == Set("g3"))
  }

  test("gff3: trailing ##FASTA section and track/browser headers are skipped") {
    // Prokka/Bakta-style GFF3 ends with an embedded FASTA block; UCSC
    // exports prepend track/browser lines — both must scan cleanly under
    // default FAILFAST, not crash the 8-column check
    val lines = Seq(
      "##gff-version 3",
      "track name=myTrack description=\"x\"",
      "browser position chr1:1-2000",
      "chr1\t.\tgene\t1000\t2000\t.\t+\t.\tID=gene1",
      "##FASTA",
      ">chr1 assembled",
      "ACGTACGTACGTACGT",
      "NNNNACGT")
    val df = spark.read.format("gff").load(tempFile("fa.gff", lines))
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getLong(3) == 1000)
  }

  test("gxf: malformed attributes option fails with a clear message") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("gtf").option("attributes", "gene_id")
        .load(tempFile("bad.gtf", gtf)).schema
    }
    assert(e.getMessage.contains("name:type"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("gtf").option("attributes", "a:string:x")
        .load(tempFile("bad2.gtf", gtf)).schema
    }
    assert(e2.getMessage.contains("name:type"))
  }
}
