package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.EventStream.SessionEvent

class EventStreamSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize: custom state closes sessions on gap and on timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val ck = java.nio.file.Files.createTempDirectory("graft-sess-ck")
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      input.addData(
        SessionEvent(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
        SessionEvent(2, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
        SessionEvent(3, ts("2024-01-01 00:05:00"), 2, "view", 5.0))
      q.processAllAvailable()
      // user 1 returns 2h later → gap exceeded → first session closes
      input.addData(SessionEvent(4, ts("2024-01-01 02:00:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough that user 2's session times out
      input.addData(SessionEvent(5, ts("2024-01-01 05:00:00"), 3, "view", 0.1))
      q.processAllAvailable()
      input.addData(SessionEvent(6, ts("2024-01-01 08:00:00"), 3, "view", 0.1))
      q.processAllAvailable()

      val out = spark.table("sessions")
        .select("user_id", "session_start", "session_end", "n_events",
          "sum_value").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(3), r.getDouble(4))).toSet
      // user 1's first session: gap-closed with 2 events, sum 3.0
      assert(out.contains((1L, "2024-01-01 00:00:00.0", 2L, 3.0)), s"got $out")
      // user 2's only session: timeout-closed with 1 event, sum 5.0
      assert(out.contains((2L, "2024-01-01 00:05:00.0", 1L, 5.0)), s"got $out")
    } finally q.stop()
  }

  test("sessionize: gap decisions use microsecond precision, not ms") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def microTs(base: String, micros: Int): Timestamp = {
      val t = Timestamp.valueOf(base)
      t.setNanos(micros * 1000)
      t
    }
    val input = MemoryStream[SessionEvent]
    val ck = java.nio.file.Files.createTempDirectory("graft-sess-us")
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("us_sessions")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try {
      // events 1800.0005 s apart: > 30-min gap by 500 MICROseconds —
      // the batch oracle splits them; ms-truncated state would merge
      input.addData(
        SessionEvent(1, microTs("2024-01-01 00:00:00", 400), 1, "a", 1.0),
        SessionEvent(2, microTs("2024-01-01 00:30:00", 900), 1, "b", 1.0),
        // exactly the 30-min gap (<=) for user 2: must merge
        SessionEvent(3, microTs("2024-01-01 00:00:00", 400), 2, "a", 1.0),
        SessionEvent(4, microTs("2024-01-01 00:30:00", 400), 2, "b", 1.0))
      q.processAllAvailable()
      input.addData(SessionEvent(5, ts("2024-01-01 06:00:00"), 3, "a", 0.1))
      q.processAllAvailable()
      input.addData(SessionEvent(6, ts("2024-01-01 12:00:00"), 3, "a", 0.1))
      q.processAllAvailable()
      val out = spark.table("us_sessions")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(out(1L) == Seq(1L, 1L), s"got $out") // split: two sessions
      assert(out(2L) == Seq(2L), s"got $out")     // merged: one session
      // emitted timestamps preserve the micro fraction
      val starts = spark.table("us_sessions").where(col("user_id") === 1L)
        .select("session_start").collect()
        .map(_.getTimestamp(0).getNanos).toSet
      assert(starts == Set(400000, 900000), s"got $starts")
    } finally q.stop()
  }

  test("streaming dedupe drops duplicate event ids within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessionEvent]
    val ck = java.nio.file.Files.createTempDirectory("graft-dedup-ck")
    val q = EventStream.dedupe(input.toDS().toDF())
      .writeStream.format("memory").queryName("deduped")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
        SessionEvent(1, ts("2024-01-01 00:00:05"), 1, "view", 1.0), // dup id
        SessionEvent(2, ts("2024-01-01 00:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        SessionEvent(1, ts("2024-01-01 00:02:00"), 1, "view", 1.0)) // dup id
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").collect()
        .map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("windowed counts run identically over batch frames") {
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, ts("2024-01-01 01:05:00"), 1L, "view", 1.5),
        org.apache.spark.sql.Row(2L, ts("2024-01-01 01:55:00"), 2L, "view", 2.5),
        org.apache.spark.sql.Row(3L, ts("2024-01-01 02:05:00"), 1L, "view", 4.0))),
      EventStream.EventSchema)
    val rows = EventStream.windowedCounts(batch)
      .orderBy("window_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(3) == 2 && rows(0).getDouble(4) == 4.0)
    assert(rows(1).getLong(3) == 1 && rows(1).getDouble(4) == 4.0)
  }

  test("streaming run to completion equals the batch aggregation (q35 path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-q35")
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, ts("2024-01-01 01:05:00"), 1L, "view", 1.5),
        org.apache.spark.sql.Row(2L, ts("2024-01-01 01:55:00"), 2L, "buy", 2.5),
        org.apache.spark.sql.Row(3L, ts("2024-01-01 01:58:00"), 2L, "view", 3.0),
        org.apache.spark.sql.Row(4L, ts("2024-01-01 02:05:00"), 1L, "view", 4.0))),
      EventStream.EventSchema)
    val file = dir.resolve("ev.parquet")
    batch.coalesce(1).write.mode("overwrite").parquet(file.toString)
    val streamed = EventStream
      .windowedCountsToCompletion(spark, file.toString)
      .select(org.apache.spark.sql.functions.col("window.start").as("ws"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("n_events"),
        org.apache.spark.sql.functions.col("sum_raw"))
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val expected = batch
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("value")).as("sum_raw"))
      .select(org.apache.spark.sql.functions.col("window.start").as("ws"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("n_events"),
        org.apache.spark.sql.functions.col("sum_raw"))
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(streamed == expected)
    assert(streamed.size == 3) // (01h view), (01h buy), (02h view)
  }

  test("hive-partitioned source keeps partition-column values") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-part")
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, ts("2024-01-01 01:05:00"), 1L, "view", 1.0),
        org.apache.spark.sql.Row(2L, ts("2024-01-01 01:10:00"), 2L, "buy", 2.0),
        org.apache.spark.sql.Row(3L, ts("2024-01-01 01:20:00"), 1L, "view", 3.0))),
      EventStream.EventSchema)
    val tbl = dir.resolve("events").toString
    // event_type lives in DIRECTORY NAMES, not the leaf files — a flat
    // symlink stage would stream it back as all-null and collapse the
    // grouped result into one null group
    batch.write.partitionBy("event_type").parquet(tbl)
    val got = EventStream.windowedCountsToCompletion(spark, tbl)
      .select(c("event_type"), c("n_events"), c("sum_raw"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("buy", 1L, 2.0), ("view", 2L, 4.0)), s"got $got")
  }

  test("sessionizeToCompletion survives an int user_id source") {
    import org.apache.spark.sql.types._
    val intSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", IntegerType), // narrower than long
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-int")
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, ts("2024-01-01 01:00:00"), 1, "view", 1.0),
        org.apache.spark.sql.Row(2L, ts("2024-01-01 01:10:00"), 1, "view", 1.0),
        org.apache.spark.sql.Row(3L, ts("2024-01-01 03:00:00"), 2, "buy", 1.0))),
      intSchema)
    val file = dir.resolve("ev.parquet")
    batch.coalesce(1).write.mode("overwrite").parquet(file.toString)
    // the sentinel is written in the SOURCE's id type: casting
    // Long.MinValue into an int column would overflow (ANSI crash, or
    // a silent wrap onto a real id that breaks the reserved-id filter)
    val got = EventStream.sessionizeToCompletion(spark, file.toString)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 2L), (2L, 1L, 1L)), s"got $got")
  }

  test("sessionize: in-watermark stragglers merge into earlier sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStream.SessionEvent]
    val ck = java.nio.file.Files.createTempDirectory("graft-sess-strag")
    // wide lateness so the stragglers are in-watermark when they arrive
    val q = EventStream.sessionize(input.toDS(), lateness = "3 hours")
      .writeStream.format("memory").queryName("strag_sessions")
      .option("checkpointLocation", ck.toString)
      .outputMode("append").start()
    try {
      // batch 1: an open session at 02:00
      input.addData(
        EventStream.SessionEvent(1, ts("2024-01-01 02:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // batch 2: TWO stragglers >gap before the open session but within
      // one gap of EACH OTHER — the r7 code closed them as two
      // single-event sessions; they must merge into one 2-event session
      input.addData(
        EventStream.SessionEvent(2, ts("2024-01-01 00:10:00"), 1, "view", 2.0),
        EventStream.SessionEvent(3, ts("2024-01-01 00:30:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far past everything so all sessions emit
      input.addData(
        EventStream.SessionEvent(4, ts("2024-01-02 12:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      input.addData(
        EventStream.SessionEvent(5, ts("2024-01-03 12:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("strag_sessions")
        .where($"user_id" === 1L)
        .select("session_start", "n_events", "sum_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == Set(
        ("2024-01-01 00:10:00.0", 2L, 5.0), // merged straggler session
        ("2024-01-01 02:00:00.0", 1L, 1.0)), s"got $got")
    } finally q.stop()
  }

  test("sessionizeToCompletion equals batch sessionization (q42 path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-q42")
    val fileA = Seq(
      // user 1: two sessions (gap > 30 min between event 2 and 3)
      org.apache.spark.sql.Row(1L, ts("2024-01-01 01:00:00"), 1L, "view", 1.0),
      org.apache.spark.sql.Row(2L, ts("2024-01-01 01:20:00"), 1L, "view", 2.0),
      org.apache.spark.sql.Row(3L, ts("2024-01-01 03:00:00"), 1L, "buy", 3.0),
      // user 3's LATEST events live in the first file: a per-file-batch
      // drive would advance the watermark past file B's earlier rows
      // and silently drop them as late (the r8 review's divergence)
      org.apache.spark.sql.Row(8L, ts("2024-01-01 05:00:00"), 3L, "view", 1.0),
      org.apache.spark.sql.Row(9L, ts("2024-01-01 10:00:00"), 3L, "view", 1.0))
    val fileB = Seq(
      // user 2: one session of three events
      org.apache.spark.sql.Row(4L, ts("2024-01-01 02:00:00"), 2L, "view", 1.0),
      org.apache.spark.sql.Row(5L, ts("2024-01-01 02:29:00"), 2L, "view", 1.0),
      org.apache.spark.sql.Row(6L, ts("2024-01-01 02:58:00"), 2L, "view", 1.0),
      // user 3's earliest event — hours before file A's
      org.apache.spark.sql.Row(7L, ts("2024-01-01 00:00:00"), 3L, "view", 1.0))
    val evDir = dir.resolve("events")
    java.nio.file.Files.createDirectory(evDir)
    for ((rows, name) <- Seq((fileA, "a"), (fileB, "b"))) {
      val tmp = dir.resolve(s"tmp_$name")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows), EventStream.EventSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val s = java.nio.file.Files.list(tmp)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator)
          .asScala.filter(_.toString.endsWith(".parquet")).toSeq.head
        finally s.close()
      }
      java.nio.file.Files.copy(part, evDir.resolve(s"$name.parquet"))
    }
    val res = EventStream.sessionizeToCompletion(spark, evDir.toString)
    // the completion result must be a DISTRIBUTED parquet read — if it
    // were driver-materialized rows the plan would be a LocalRelation /
    // ExistingRDD scan and this shape would not hold at production
    // user cardinality
    val planStr = res.queryExecution.optimizedPlan.toString
    assert(planStr.toLowerCase.contains("parquet"),
      s"rollup is not a distributed parquet read:\n$planStr")
    assert(!planStr.contains("LocalRelation") &&
      !planStr.contains("ExistingRDD"),
      s"rollup passed through the driver:\n$planStr")
    val got = res.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 3L), (2L, 1L, 3L), (3L, 3L, 3L)), s"got $got")
  }

  test("sessionize runs over a BATCH dataset (backfill contract)") {
    import spark.implicits._
    // the module header promises the builders run over batch frames too;
    // batch execution strips the watermark node, so the state closure
    // must not die on GroupState's watermark accessor — with all data
    // present, every session is final
    val batch = Seq(
      SessionEvent(1, ts("2024-01-01 01:00:00"), 1L, "view", 1.0),
      SessionEvent(2, ts("2024-01-01 01:20:00"), 1L, "view", 2.0),
      SessionEvent(3, ts("2024-01-01 03:00:00"), 1L, "buy", 3.0),
      SessionEvent(4, ts("2024-01-01 02:00:00"), 2L, "view", 5.0)).toDS()
    val got = EventStream.sessionize(batch)
      .collect()
      .map(s => (s.user_id, s.session_start.toString, s.n_events, s.sum_value))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01 01:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 03:00:00.0", 1L, 3.0),
      (2L, "2024-01-01 02:00:00.0", 1L, 5.0)), s"got $got")
  }

  test("sessionizeToCompletion survives a null event_id on the latest row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-nullid")
    // the max-ts row carries a NULL event_id: the sentinel derived from
    // it must still pass the identity filter (else the watermark never
    // advances and the rollup silently truncates), while the null-id
    // real row itself is excluded per the documented contract — as is
    // the null-user row
    val rows = Seq(
      org.apache.spark.sql.Row(1L, ts("2024-01-01 01:00:00"), 1L, "view", 1.0),
      org.apache.spark.sql.Row(2L, ts("2024-01-01 01:10:00"), 1L, "view", 2.0),
      org.apache.spark.sql.Row(3L, ts("2024-01-01 03:00:00"), null, "view", 1.0),
      org.apache.spark.sql.Row(null, ts("2024-01-01 09:00:00"), 2L, "buy", 4.0))
    val file = dir.resolve("ev.parquet")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), EventStream.EventSchema)
      .coalesce(1).write.mode("overwrite").parquet(file.toString)
    val got = EventStream.sessionizeToCompletion(spark, file.toString)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 2L)), s"got $got")
  }
}
