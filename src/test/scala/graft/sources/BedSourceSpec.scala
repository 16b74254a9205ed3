package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BED reader spec — fixture shapes per FIXTURES.md §3 (sample.bed,
  * narrowPeak custom schema, bedgraph). */
class BedSourceSpec extends SparkSuite {

  private val bed6Lines = Seq(
    "# a comment",
    "track name=test",
    "chr1\t100\t200\tfeat1\t960\t+",
    "chr1\t150\t250\tfeat2\t.\t-",
    "chr2\t0\t50\tfeat3\t500\t.",
    "chr10\t5000\t6000\tfeat4\t1\t+")

  test("bed6 schema and values") {
    val df = spark.read.format("bed").option("bed_schema", "bed6")
      .load(tempFile("sample.bed", bed6Lines))
    assert(df.columns.toSeq ==
      Seq("chrom", "start", "end", "name", "score", "strand"))
    val rows = df.orderBy("chrom", "start").collect()
    assert(rows.length == 4)
    assert(rows(0).getString(0) == "chr1" && rows(0).getLong(1) == 100 &&
      rows(0).getLong(2) == 200 && rows(0).getString(3) == "feat1" &&
      rows(0).getInt(4) == 960 && rows(0).getString(5) == "+")
    // '.' score → null; '.' strand stays "." ? no: '.' = null for non-name
    assert(rows(1).isNullAt(4))
  }

  test("bed12 with itemRgb and blocks") {
    val line = "chr1\t10\t110\tgene\t0\t+\t10\t110\t255,0,0\t2\t10,20\t0,80"
    val df = spark.read.format("bed").option("bed_schema", "bed12")
      .load(tempFile("b12.bed", Seq(line)))
    val r = df.collect()(0)
    assert(r.getSeq[Int](8) == Seq(255, 0, 0))
    assert(r.getInt(9) == 2)
    assert(r.getSeq[Long](10) == Seq(10L, 20L))
    assert(r.getSeq[Long](11) == Seq(0L, 80L))
  }

  test("bed6+4 narrowPeak typed custom fields") {
    val line = "chr1\t9356548\t9356648\t.\t0\t.\t182\t5.0945\t-1\t50"
    val df = spark.read.format("bed")
      .option("bed_schema", "bed6+4")
      .option("fields",
        "signalValue:double,pValue:double,qValue:double,peak:long")
      .load(tempFile("np.bed", Seq(line)))
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "name", "score",
      "strand", "signalValue", "pValue", "qValue", "peak"))
    val r = df.collect()(0)
    assert(r.getDouble(6) == 182.0 && r.getDouble(7) == 5.0945 &&
      r.getLong(9) == 50L)
  }

  test("bedN+ rest column") {
    val df = spark.read.format("bed").option("bed_schema", "bed3+")
      .load(tempFile("rest.bed", Seq("chr1\t1\t2\tfoo\tbar")))
    val r = df.collect()(0)
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "rest"))
    assert(r.getString(3) == "foo\tbar")
  }

  test("bedgraph") {
    val df = spark.read.format("bed").option("bed_schema", "bedgraph")
      .load(tempFile("cov.bedgraph", Seq("chr1\t0\t100\t1.5")))
    assert(df.schema("value").dataType.typeName == "float")
    assert(df.collect()(0).getFloat(3) == 1.5f)
  }

  test("coords=11 shifts start by +1") {
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("coords", "11")
      .load(tempFile("c.bed", Seq("chr1\t100\t200")))
    val r = df.collect()(0)
    assert(r.getLong(1) == 101 && r.getLong(2) == 200)
  }

  test("regions option filters by overlap") {
    val df = spark.read.format("bed").option("bed_schema", "bed6")
      .option("regions", "chr1:101-160") // 1-based closed = [100,160)
      .load(tempFile("r.bed", bed6Lines))
    val names = df.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("feat1", "feat2"))
    // whole-chromosome region
    val df2 = spark.read.format("bed").option("bed_schema", "bed6")
      .option("regions", "chr2")
      .load(tempFile("r2.bed", bed6Lines))
    assert(df2.count() == 1)
  }

  test("catalyst filters prune rows in the reader and limit pushes down") {
    val path = tempFile("f.bed", bed6Lines)
    val df = spark.read.format("bed").option("bed_schema", "bed6").load(path)
    assert(df.where(col("chrom") === "chr1").count() == 2)
    assert(df.limit(2).collect().length == 2)
    val plan = df.where(col("chrom") === "chr1").queryExecution
      .executedPlan.toString
    assert(plan.contains("graft-bed") || plan.contains("BatchScan"))
  }

  test("projection pushdown returns only required columns") {
    val df = spark.read.format("bed").option("bed_schema", "bed6")
      .load(tempFile("p.bed", bed6Lines))
      .select("name", "chrom")
    val rows = df.collect()
    assert(rows.map(_.getString(1)).toSet == Set("chr1", "chr2", "chr10"))
  }

  test("byte-range splitting loses and duplicates nothing") {
    val lines = (0 until 5000).map(i => s"chr${i % 3}\t${i * 10}\t${i * 10 + 5}")
    val path = tempFile("big.bed", lines)
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("maxpartitionbytes", "1024") // force many splits
      .load(path)
    assert(df.rdd.getNumPartitions > 10)
    assert(df.count() == 5000)
    assert(df.select(sum(col("start"))).collect()(0).getLong(0) ==
      (0 until 5000).map(_ * 10L).sum)
  }

  test("CRLF endings: values stripped, split ownership stays exact") {
    val lines = (0 until 5000).map(i => s"chr${i % 3}\t${i * 10}\t${i * 10 + 5}")
    val dir = java.nio.file.Files.createTempDirectory("graft-test")
    val f = dir.resolve("crlf.bed")
    java.nio.file.Files.write(f,
      (lines.mkString("\r\n") + "\r\n").getBytes("UTF-8"))
    val df = spark.read.format("bed").option("bed_schema", "bed3")
      .option("maxpartitionbytes", "1024") // many splits over CRLF lines
      .load(f.toString)
    assert(df.rdd.getNumPartitions > 10)
    // a \r left on the end column would fail the long parse; an off-by-one
    // byte position would drop or duplicate boundary rows
    assert(df.count() == 5000)
    assert(df.select(sum(col("end"))).collect()(0).getLong(0) ==
      (0 until 5000).map(_ * 10L + 5).sum)
  }

  test("gzip input reads as a single partition") {
    val path = tempGzFile("z.bed.gz", bed6Lines)
    val df = spark.read.format("bed").option("bed_schema", "bed6").load(path)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 4)
  }

  test("short tabbed lines null-pad; names with spaces stay intact") {
    // a 4-column tabbed line under bed6 must null-pad score/strand, NOT
    // fall back to whitespace-splitting (which would split 'my name'
    // into two columns and feed 'name' to score.toInt)
    val lines = Seq("chr1\t100\t200\tmy name")
    val df = spark.read.format("bed").option("bed_schema", "bed6")
      .load(tempFile("short.bed", lines))
    val r = df.collect()(0)
    assert(r.getString(3) == "my name" && r.isNullAt(4) && r.isNullAt(5))
    // tab-less files still get the whitespace fallback
    val df2 = spark.read.format("bed").option("bed_schema", "bed3")
      .load(tempFile("ws.bed", Seq("chr1 100 200")))
    assert(df2.collect()(0).getLong(2) == 200)
  }

  test("external schema with reordered or retyped fields fails loudly") {
    val path = tempFile("g.bed", Seq("chr1\t100\t200"))
    val e = intercept[Exception] {
      spark.read.format("bed").option("bed_schema", "bed3")
        .schema("start LONG, chrom STRING, end LONG")
        .load(path).collect()
    }
    assert(e.getMessage.contains("bed_schema") ||
      Option(e.getCause).exists(_.getMessage.contains("bed_schema")))
  }
}
