package graft

/** Local pre-flight for the scanner-correctness gate: every `s*` entry's
  * reader scan must equal its hand-derived expected dump (the driver
  * re-checks the same parquet through DuckDB), and the s20 split-planning
  * fixture must genuinely plan multiple input partitions — the row
  * comparison alone can't prove the scan was split.
  */
class ScanGateSpec extends SparkSuite {

  test("every scanner-gate query matches its expected dump") {
    ScanGate.queries.foreach { case (name, fn, _) =>
      val actual = fn(spark, "unused")
      val expected = spark.read.parquet(ScanGate.expectedDir(name))
      assert(actual.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        expected.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$name schema mismatch")
      val a = actual.collect().map(_.toString).sorted.toSeq
      val e = expected.collect().map(_.toString).sorted.toSeq
      assert(a == e, s"$name row mismatch")
    }
  }

  test("s20 split fixtures plan >=3 partitions on both paths") {
    // force fixture materialization
    ScanGate.queries.collectFirst {
      case ("s20_split_scan", fn, _) => fn(spark, "unused").count()
    }
    val bgzf = spark.read.format("bed").option("bed_schema", "bed3")
      .option("maxpartitionbytes", "1").load(s"${ScanGate.Root}/g.bed.gz")
    assert(bgzf.rdd.getNumPartitions >= 3,
      s"bgzf split count ${bgzf.rdd.getNumPartitions}")
    val text = spark.read.format("bed").option("bed_schema", "bed3")
      .option("maxpartitionbytes", "32").load(s"${ScanGate.Root}/split.bed")
    assert(text.rdd.getNumPartitions >= 3,
      s"text split count ${text.rdd.getNumPartitions}")
  }
}
