package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal plumbing, Arrow IPC sink, and streaming window specs. */
class PipelineOpsSpec extends SparkSuite {

  test("multimodal: asset wrapping + partition-batched feature extraction") {
    val spark2 = spark
    import spark2.implicits._
    val raw = Seq(
      (1L, "image/png", "fakepngbytes".getBytes("UTF-8")),
      (2L, "audio/wav", "fakewavbytes!!".getBytes("UTF-8")),
      (3L, "image/jpeg", Array.empty[Byte]))
      .toDF("id", "mime", "payload")
    val assets = Multimodal.toAssets(raw, "id", "mime", "payload")
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "mime", "payload", "meta"))
    val metas = assets.select("asset_id", "meta.n_bytes", "meta.digest")
      .orderBy("asset_id").collect()
    assert(metas(0).getLong(1) == 12L)
    assert(metas(0).getString(2).length == 32)

    val feats = Multimodal.extractFeatures(spark, assets)
      .collect().sortBy(_.asset_id)
    assert(feats.length == 3)
    assert(feats(0).n_channels == 3 && feats(1).n_channels == 1)
    assert(feats.forall(_.embedding.length == 8))
    assert(feats(2).brightness == 0.0)
    // determinism: same payload → same features
    val feats2 = Multimodal.extractFeatures(spark, assets)
      .collect().sortBy(_.asset_id)
    assert(feats.map(_.brightness).toSeq == feats2.map(_.brightness).toSeq)
  }

  test("arrow ipc sink round-trips through an arrow reader") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 3.5))
      .toDF("id", "name", "x")
    val bytes = org.apache.spark.sql.graftshim.ArrowShim.toIpcBytes(df)
    assert(bytes.length > 0)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    val root = reader.getVectorSchemaRoot
    assert(reader.loadNextBatch())
    assert(root.getRowCount == 3)
    assert(root.getSchema.getFields.size == 3)
    val ids = root.getVector("id")
      .asInstanceOf[org.apache.arrow.vector.BigIntVector]
    assert((0 until 3).map(ids.get) == Seq(1L, 2L, 3L))
    assert(root.getVector("name").isNull(2))
    reader.close(); alloc.close()
  }

  test("streaming: watermarked tumbling windows finalize after late bound") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out")
    val ckDir = java.nio.file.Files.createTempDirectory("graft-stream-ck")

    def writeBatch(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))

    writeBatch("b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T01:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T01:40:00.000Z","user_id":2,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T01:50:00.000Z","user_id":1,"event_type":"view","value":3.0}"""))

    val q = graft.streaming.EventStream.startWindowedQuery(spark,
      inDir.toString, outDir.toString, ckDir.toString)
    try {
      q.processAllAvailable()
      // advance the watermark past 02:00 + 30min so window [01:00,02:00) emits
      writeBatch("b2.json", Seq(
        """{"event_id":9,"ts":"2024-01-01T05:00:00.000Z","user_id":9,"event_type":"click","value":0.5}"""))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir.toString)
    val rows = out.where(col("event_type") === "click")
      .orderBy("window_start").collect()
    assert(rows.nonEmpty)
    assert(rows(0).getLong(3) == 2L) // two clicks in [01:00, 02:00)
    assert(rows(0).getDouble(4) == 3.0)
  }

  test("streaming transform doubles as a batch transform") {
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L,
          java.sql.Timestamp.valueOf("2024-01-01 01:05:00"), 1L, "click", 1.0),
        org.apache.spark.sql.Row(2L,
          java.sql.Timestamp.valueOf("2024-01-01 01:40:00"), 2L, "click", 2.0))),
      graft.streaming.EventStream.EventSchema)
    val res = graft.streaming.EventStream.windowedCounts(batch).collect()
    assert(res.length == 1 && res(0).getLong(3) == 2L)
  }
}
