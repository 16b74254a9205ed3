package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.fixtures.BbiFixture
import graft.fixtures.BbiFixture.{BedItem, WigSection, Zoom}

class BbiSourcesSpec extends SparkSuite {

  private val chroms = Seq(("chr1", 0), ("chr2", 1))

  private lazy val bigwigPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bbi")
    val p = dir.resolve("s.bw").toString
    BbiFixture.write(p, chroms,
      wigSections = Seq(
        WigSection(0, 1, 100, 0, 0, // bedGraph
          Seq((100L, 200L, 1.5f), (200L, 300L, 2.5f))),
        WigSection(1, 2, 0, 0, 50,  // varStep span 50
          Seq((0L, 50L, 5.0f), (100L, 150L, 7.0f))),
        WigSection(0, 3, 1000, 100, 100, // fixedStep
          Seq((0L, 0L, 9.0f), (0L, 0L, 10.0f)))),
      bedItems = Nil,
      zooms = Seq(
        Zoom(0, 0, 1000, 200, 1.5f, 2.5f, 400f, 850f),
        Zoom(0, 1000, 2000, 200, 9f, 10f, 1900f, 18100f)))
    p
  }

  private lazy val bigbedPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bbi")
    val p = dir.resolve("s.bb").toString
    BbiFixture.write(p, chroms,
      wigSections = Nil,
      bedItems = Seq(
        BedItem(0, 10, 50, "feat1\t960"),
        BedItem(0, 60, 90, "feat2\t3"),
        BedItem(1, 5, 25, "feat3\t77")),
      zooms = Nil)
    p
  }

  test("bigwig: bedGraph, varStep and fixedStep sections decode") {
    val df = spark.read.format("bigwig").load(bigwigPath)
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "value"))
    val rows = df.orderBy("chrom", "start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getFloat(3)))
    assert(rows.toSeq == Seq(
      ("chr1", 100L, 200L, 1.5f), ("chr1", 200L, 300L, 2.5f),
      ("chr1", 1000L, 1100L, 9.0f), ("chr1", 1100L, 1200L, 10.0f),
      ("chr2", 0L, 50L, 5.0f), ("chr2", 100L, 150L, 7.0f)))
  }

  test("bigwig: region query finds fixedStep sections (span from step math)") {
    // the fixedStep r-tree span must derive from chromStart/itemStep/
    // itemSpan — item start/end fields are unused by contract, and a
    // [0,0) span made every fixedStep section invisible to region queries
    val df = spark.read.format("bigwig")
      .option("regions", "chr1:[1050,1150)")
      .load(bigwigPath)
    val rows = df.collect().map(r => (r.getLong(1), r.getFloat(3)))
    assert(rows.toSet == Set((1000L, 9.0f), (1100L, 10.0f)), rows.toSeq)
  }

  test("bigwig: r-tree region query reads only overlapping sections") {
    val df = spark.read.format("bigwig")
      .option("regions", "chr1:[150,250)")
      .load(bigwigPath)
    // section-level prune + residual overlap check
    val rows = df.collect().map(r => (r.getLong(1), r.getFloat(3)))
    assert(rows.toSet == Set((100L, 1.5f), (200L, 2.5f)))
    assert(df.rdd.getNumPartitions == 1) // only the chr1 bedGraph section
  }

  test("bigwig: overlapping multi-region queries emit each record once") {
    // both regions hit the same section AND the same record (100,150):
    // per-region partitions would emit it twice
    val df = spark.read.format("bigwig")
      .option("regions", "chr1:[90,160);chr1:[140,260)")
      .load(bigwigPath)
    val rows = df.collect().map(r => (r.getLong(1), r.getFloat(3))).toSeq
    assert(rows.sorted == Seq((100L, 1.5f), (200L, 2.5f)),
      s"expected each interval once, got $rows")
  }

  test("bigwig: zoom_level reads stored summary records") {
    val df = spark.read.format("bigwig").option("zoom_level", "0")
      .load(bigwigPath)
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "bases_covered",
      "min_val", "max_val", "sum_val", "sum_squares"))
    val rows = df.orderBy("start").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "chr1" && rows(0).getLong(3) == 200 &&
      rows(0).getDouble(4) == 1.5 && rows(0).getDouble(5) == 2.5)
    assert(rows(1).getDouble(6) == 1900.0)
  }

  test("bigbed: rest column and typed field dissection") {
    val df = spark.read.format("bigbed").load(bigbedPath)
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "rest"))
    val r = df.orderBy("chrom", "start").collect()
    assert(r.length == 3 && r(0).getString(3) == "feat1\t960")

    val typed = spark.read.format("bigbed")
      .option("fields", "name:string,score:int")
      .load(bigbedPath)
    assert(typed.columns.toSeq == Seq("chrom", "start", "end", "name", "score"))
    val t = typed.orderBy("chrom", "start").collect()
    assert(t(0).getString(3) == "feat1" && t(0).getInt(4) == 960)
    assert(t(2).getString(3) == "feat3" && t(2).getInt(4) == 77)
  }

  test("bigbed: embedded AutoSql auto-derives typed columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bbi-as")
    val p = dir.resolve("as.bb").toString
    val autoSql =
      """table narrowPeakish
        |"Peaks with typed extras"
        |(
        |string chrom;        "Reference sequence"
        |uint   chromStart;   "Start position"
        |uint   chromEnd;     "End position"
        |string name;         "Feature name"
        |uint   score;        "Score 0-1000"
        |char[1] strand;      "+ or -"
        |float  signalValue;  "Measurement"
        |int[blockCount] blockSizes; "Comma separated sizes"
        |set(promoter,enhancer) kind; "Region classes"
        |)""".stripMargin
    BbiFixture.write(p, chroms,
      wigSections = Nil,
      bedItems = Seq(
        BedItem(0, 10, 50, "feat1\t960\t+\t1.25\t4,6,\tpromoter,enhancer"),
        BedItem(1, 5, 25, "feat3\t77\t-\t0.5\t20,\tenhancer")),
      zooms = Nil, autoSql = Some(autoSql), fieldCount = Some(9))
    val df = spark.read.format("bigbed").load(p)
    assert(df.columns.toSeq == Seq("chrom", "start", "end", "name", "score",
      "strand", "signalValue", "blockSizes", "kind"))
    import org.apache.spark.sql.types._
    assert(df.schema("score").dataType == LongType) // uint widens to long
    assert(df.schema("strand").dataType == StringType) // char[1] is a string
    assert(df.schema("blockSizes").dataType == ArrayType(IntegerType))
    assert(df.schema("kind").dataType == ArrayType(StringType))
    val r = df.orderBy("chrom", "start").collect()
    assert(r(0).getString(3) == "feat1" && r(0).getLong(4) == 960 &&
      r(0).getString(5) == "+" && r(0).getFloat(6) == 1.25f)
    assert(r(0).getSeq[Int](7) == Seq(4, 6)) // trailing comma tolerated
    assert(r(0).getSeq[String](8) == Seq("promoter", "enhancer"))
    assert(r(1).getString(3) == "feat3" && r(1).getSeq[Int](7) == Seq(20))
    // explicit fields option still wins over AutoSql
    val overridden = spark.read.format("bigbed")
      .option("fields", "name:string").load(p)
    assert(overridden.columns.toSeq == Seq("chrom", "start", "end", "name"))
  }

  test("bigbed: pushed chrom filter prunes sections") {
    val df = spark.read.format("bigbed").load(bigbedPath)
      .where(col("chrom") === "chr2")
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(5L))
  }
}
