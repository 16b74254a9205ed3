package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming pipelines over the events shape (the engine's
  * streaming surface; the reference has only batch pull-iterators, so
  * this is part of the scale extension layer).
  *
  * Transform builders take a DataFrame so the same logic runs over
  * `readStream` (incremental, watermarked) and a batch frame (tests,
  * backfill) — the recommended Structured Streaming pattern.
  */
object EventStream {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-based event stream (json lines dropped into `dir`). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).json(dir)

  /** Tumbling-window aggregation with a watermark: late events beyond
    * `lateness` are dropped, state is bounded — the streaming analogue of
    * SparkEntry.q11_time_window. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("approx_users"))

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark are dropped, state expires after it —
    * the streaming face of the batch md5-fingerprint dedup (q22). */
  def dedupe(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  /** Session run in MICROsecond event time: the batch oracle (q12)
    * compares gaps at microsecond precision, so millisecond state would
    * merge two events exactly 1800.0005 s apart that the oracle splits. */
  final case class SessionAgg(startUs: Long, endUs: Long, n: Long, sum: Double)
  /** Custom state: ALL of a user's not-yet-final sessions, sorted by
    * start. Holding the list (not just the newest session) makes
    * in-watermark stragglers exact: an event landing between two pending
    * sessions extends or even bridges them, and a session only becomes
    * immutable — and is emitted — once the watermark guarantees no
    * further event can reach it. */
  final case class SessionList(sessions: Seq[SessionAgg])
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based sessionization with CUSTOM state (`KeyValueGroupedDataset
    * .flatMapGroupsWithState`, event-time timeout): one state entry per
    * user holds the pending sessions; every incoming event is folded in
    * as a singleton run and gap-adjacent runs coalesce (the same
    * transitive gap closure q12 computes in batch), so any in-watermark
    * straggler — before, inside, between or after pending sessions —
    * lands exactly. A session emits when the watermark passes its
    * end + gap (checked on every update, and via event-time timeout for
    * quiet users); state is bounded by the watermark. The streaming
    * analogue of SparkEntry.q12_sessionize. */
  def sessionize(events: Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000,
      lateness: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L

    // Timestamp ↔ micros, preserving the sub-ms part (`getTime` alone
    // truncates to ms). Local defs: the state closures must capture
    // only serializable locals, never this module object.
    def tsToUs(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def usToTs(us: Long): Timestamp = {
      val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def close(userId: Long, s: SessionAgg): UserSession =
      UserSession(userId, usToTs(s.startUs), usToTs(s.endUs), s.n, s.sum)

    /** Coalesce a start-sorted run list: gap-adjacent runs merge. */
    def coalesce(runs: Seq[SessionAgg]): Seq[SessionAgg] =
      runs.sortBy(s => (s.startUs, s.endUs)).foldLeft(List.empty[SessionAgg]) {
        case (acc @ (last :: rest), s) if s.startUs - last.endUs <= gapUs =>
          SessionAgg(last.startUs, math.max(last.endUs, s.endUs),
            last.n + s.n, last.sum + s.sum) :: rest
        case (acc, s) => s :: acc
      }.reverse

    /** Emit sessions the watermark has made final; re-arm the timeout
      * for the earliest still-pending close. Strictly-less-than: Spark's
      * late-row filter keeps events with ts == watermark, and an event
      * at exactly endUs+gapUs must still merge (the batch oracle merges
      * at gap <= gap), so a session is final only once the watermark
      * is strictly past its end + gap. The watermark/timeout APIs are
      * millisecond-based; the timeout rounds UP one ms so re-arming can
      * never set a timestamp at/behind the current watermark (a late
      * timeout only re-invokes finalize, which re-checks in micros). */
    def finalize(userId: Long, sessions: Seq[SessionAgg],
        state: GroupState[SessionList]): Iterator[UserSession] = {
      // batch execution (tests, backfill — the module-header contract)
      // strips the watermark node, and GroupState then throws on the
      // watermark accessor; with all data present every session is
      // final, which is exactly what an unbounded watermark expresses
      val wmUs =
        try state.getCurrentWatermarkMs() * 1000L
        catch { case _: UnsupportedOperationException => Long.MaxValue }
      val (done, open) = sessions.partition(_.endUs + gapUs < wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionList(open))
        state.setTimeoutTimestamp(
          (open.map(_.endUs).min + gapUs) / 1000L + 1L)
      }
      done.sortBy(_.startUs).map(close(userId, _)).iterator
    }

    def update(userId: Long, evs: Iterator[SessionEvent],
        state: GroupState[SessionList]): Iterator[UserSession] = {
      val pending = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val incoming = evs.map { e =>
        val us = tsToUs(e.ts)
        SessionAgg(us, us, 1, e.value)
      }.toSeq
      finalize(userId, coalesce(pending ++ incoming), state)
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Run the windowed aggregation over a directory of event files and
    * collect results into `outDir` as parquet (append mode, watermarked
    * finalization). Returns the query for the caller to manage. */
  def startWindowedQuery(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(readEvents(spark, inDir))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger

  // memory-sink tables from previous driver-side invocations, paired
  // with the gate session owning them: dropped lazily at the next
  // invocation (their consumers have materialized by then), so repeated
  // gate/bench runs do not accumulate driver memory
  private val liveTables =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, String)]()
  private def recycleTables(): Unit = {
    var n = liveTables.poll()
    while (n != null) {
      try n._1.catalog.dropTempView(n._2) catch { case _: Exception => () }
      n = liveTables.poll()
    }
  }

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    try {
      import scala.jdk.CollectionConverters.IteratorHasAsScala
      val s = java.nio.file.Files.walk(dir)
      try s.iterator.asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    } catch { case _: Exception => () } // cleanup is best-effort
  }

  /** Stage a parquet file or directory-shaped table as a fresh stream
    * source directory holding `copies` links (fallback: copies) of
    * every data file. An input with no parquet files fails loudly
    * instead of streaming zero batches and returning a silently-empty
    * result. Paths are resolved absolute — a relative link target
    * would dangle from the temp dir.
    *
    * Hive-partitioned tables (date=…/part-….parquet) are REWRITTEN
    * flat through a batch read first: partition-column values live in
    * the directory names, not the leaf files, so a flat symlink stage
    * would hand the stream leaves whose partition columns read back as
    * all-null — silently wrong groups (or, for a partitioned ts,
    * every row dropped as null-event-time). */
  private def stageAsDir(ss: SparkSession, eventsPath: String,
      copies: Int): java.nio.file.Path = {
    val src = java.nio.file.Paths.get(eventsPath).toAbsolutePath
    def leaves(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(root)
      try {
        scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator)
          .asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet"))
          .toVector
      } finally s.close()
    }
    val isDir = java.nio.file.Files.isDirectory(src)
    val raw: Seq[java.nio.file.Path] =
      if (isDir) leaves(src) else Seq(src)
    require(raw.nonEmpty, s"no parquet data files under $eventsPath")
    // only a DIRECTORY input can be Hive-partitioned; a single-file
    // input trivially has getParent != src and must not pay the
    // flattening batch rewrite (one stat, reused — a repeated
    // isDirectory call could even disagree with the first)
    val partitioned = isDir && raw.exists(_.getParent != src)
    val d = java.nio.file.Files.createTempDirectory("graft-stream-in")
    val files: Seq[java.nio.file.Path] =
      if (!partitioned) raw
      else {
        // the flattened rewrite is MOVED into the stage dir itself, so
        // the caller's streamDir cleanup reclaims the full data copy in
        // its `finally` — a JVM-exit-scoped scratch dir would leak one
        // complete copy per gate run on a long-lived driver
        val flat = java.nio.file.Files.createTempDirectory("graft-stream-flat")
        try {
          ss.read.parquet(eventsPath).write.mode("overwrite")
            .parquet(flat.resolve("t").toString)
          leaves(flat).zipWithIndex.map { case (f, i) =>
            val moved = d.resolve(s"copy_0_$i.parquet")
            java.nio.file.Files.move(f, moved)
            moved
          }
        } finally deleteRecursively(flat)
      }
    files.zipWithIndex.foreach { case (f, i) =>
      val inStage = f.getParent == d // moved flat leaves ARE copy 0
      (0 until copies).foreach { c =>
        if (!(inStage && c == 0)) {
          val link = d.resolve(s"copy_${c}_$i.parquet")
          try java.nio.file.Files.createSymbolicLink(link, f)
          catch { case _: Exception =>
            java.nio.file.Files.copy(f, link)
          }
        }
      }
    }
    d
  }

  /** Normalize `ts` to TimestampType: nanosecond-long (the testdata
    * shape under `nanosAsLong`) via exact integer micros, TIMESTAMP_NTZ
    * via a cast (deterministic under the UTC session timezone the gate
    * sessions set — watermarks reject NTZ outright), true timestamps
    * pass through. */
  private[graft] def normalizeTs(raw: DataFrame, schema: StructType)
      : DataFrame =
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  /** A derived session for completion-driven gate runs: the stateful
    * shuffle (= state-store partition count) is sized to the bounded
    * input instead of inheriting the session-wide width — each
    * AvailableNow execution pays one state-store file set per partition,
    * so a 32-wide store on a gate-sized keyspace is pure fixed cost.
    * Unbounded production streams keep the caller's sizing, and the
    * derived session keeps the override out of the caller's queries.
    *
    * Memoized per caller session: every `newSession()` registers a
    * StreamingQueryManager listener on the shared context bus that can
    * never be unregistered (stopping the session would stop the shared
    * SparkContext), so repeated gate/bench runs must reuse one. The
    * caller's runtime-set SQL confs are copied at first use (newSession
    * alone only inherits builder-time options); a conf changed AFTER
    * the first gate run is not re-propagated. */
  // weak keys: an entry dies with its parent session instead of pinning
  // every session a long-lived driver ever created. @transient because
  // WeakHashMap is not serializable and this module rides into the
  // stateful closures; deserialization resolves back to the singleton.
  @transient private lazy val gateSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())
  private def gateSession(spark: SparkSession): SparkSession =
    gateSessions.computeIfAbsent(spark, parent => {
      val ss = parent.newSession()
      parent.conf.getAll.foreach { case (k, v) =>
        try ss.conf.set(k, v)
        catch { case _: Exception => () } // static/non-settable confs
      }
      ss.conf.set("spark.sql.shuffle.partitions", math.min(8,
        parent.sessionState.conf.numShufflePartitions).toString)
      ss
    })

  /** Drive a REAL streaming tumbling-window aggregation to completion over
    * the events parquet and return its final result: file stream source →
    * 1-hour windows (complete mode, so every window is in the final
    * table; streaming forbids exact distinct aggregates, hence no
    * n_users column) → AvailableNow trigger → memory sink. The result
    * must equal the batch/DuckDB aggregation over the same rows — the
    * oracle-checkable face of the streaming layer (gate row q35).
    * Nanosecond-long `ts` columns are normalized to micros exactly as the
    * batch path does. */
  def windowedCountsToCompletion(spark: SparkSession,
      eventsPath: String): DataFrame = {
    recycleTables()
    val ss = gateSession(spark)
    val batchSchema = ss.read.parquet(eventsPath).schema
    // the file stream source requires a DIRECTORY of files
    val streamDir = stageAsDir(ss, eventsPath, copies = 1)
    val events = normalizeTs(
      ss.readStream.schema(batchSchema).parquet(streamDir.toString),
      batchSchema)
    val agg = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_raw"))
    val name = s"graft_stream_win_${runCounter.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    // registered up front so even a failed drive's memory-sink view is
    // recycled; the finally keeps scratch dirs out of /tmp on failure
    liveTables.add(ss -> name)
    try {
      val q = agg.writeStream
        .outputMode(OutputMode.Complete)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      deleteRecursively(ckpt)
      deleteRecursively(streamDir)
    }
    ss.table(name)
  }

  /** Custom-state sessionization driven to completion and
    * oracle-checkable (gate row q42): file stream → [[sessionize]]
    * (30-min gap, the exact transitive gap closure q12 computes in
    * batch) → append-mode parquet sink, then a batch rollup to q12's
    * (user_id, n_sessions, n_events) shape.
    *
    * The drive is THREE sequential AvailableNow executions sharing one
    * checkpoint and sink:
    *  1. all real data in a single batch — the watermark is 0 while it
    *     processes, so cross-file event-time disorder can never be
    *     dropped as late (a per-file-batch design diverges from the
    *     batch oracle exactly there);
    *  2. a far-future sentinel event for a reserved user (the id
    *     type's own MinValue — outside any realistic id domain, so
    *     real negative ids are untouched, and representable in the
    *     source's user_id type so the write cast can never overflow)
    *     advances the persisted watermark past every real session's
    *     end + gap;
    *  3. a second, later sentinel batch runs WITH that watermark, so
    *     every pending event-time timeout fires inside a real batch
    *     (no reliance on a trailing no-data batch).
    * The parquet sink accumulates exactly-once across the executions;
    * sentinel sessions are filtered from the rollup.
    *
    * Contract: rows with a null event_id, ts, or user_id cannot
    * sessionize (no identity or event time) and are excluded before the
    * stateful stage; the q42 oracle filters identically, so the
    * streaming-vs-batch equivalence holds on null-containing inputs. */
  def sessionizeToCompletion(spark: SparkSession,
      eventsPath: String, rollupDir: Option[String] = None): DataFrame = {
    // the three drives each pay one state-store file set per shuffle
    // partition per execution; a completion-driven gate run sizes the
    // stateful shuffle to its bounded input instead of inheriting the
    // session-wide width (the unbounded production `sessionize` stream
    // keeps the caller's sizing). Cloned session: the override must not
    // leak into the caller's later queries.
    val ss = gateSession(spark)
    import ss.implicits._
    val batch = ss.read.parquet(eventsPath)
    val batchSchema = batch.schema
    val streamDir = stageAsDir(ss, eventsPath, copies = 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out")

    // one top-1 scan of the source serves both sentinels
    val latest = batch.orderBy(col("ts").desc).limit(1).cache()

    // the reserved sentinel id, chosen IN THE SOURCE's id type: casting
    // Long.MinValue into a narrower user_id column would overflow —
    // CAST_OVERFLOW under ANSI, silent wrap onto a REAL user id without
    // — breaking the reserved-id invariant the design rests on. The
    // type's own MinValue survives both the write cast and the read
    // widening back to long, so the rollup filter sees it exactly.
    val sentinelId: Long = batchSchema("user_id").dataType match {
      case ByteType => Byte.MinValue.toLong
      case ShortType => Short.MinValue.toLong
      case IntegerType => Int.MinValue.toLong
      case _ => Long.MinValue
    }

    def addSentinel(days: Long, i: Int): Unit = {
      // the latest real event pushed `days` ahead for the reserved
      // sentinel user, preserving the source schema (incl.
      // nanosecond-long ts)
      val bumped = batchSchema("ts").dataType match {
        case LongType => col("ts") + lit(days * 24 * 3600 * 1000000000L)
        case _ => col("ts") + expr(s"INTERVAL $days DAYS")
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-sess-sen")
      latest
        .withColumn("ts", bumped.cast(batchSchema("ts").dataType))
        .withColumn("user_id",
          lit(sentinelId).cast(batchSchema("user_id").dataType))
        // the latest REAL row may carry a null event_id (it only needed
        // non-null ts to win the top-1 scan); the sentinel must survive
        // runOnce's identity filter or the watermark never advances and
        // the rollup is silently truncated
        .withColumn("event_id",
          coalesce(col("event_id"), lit(0L))
            .cast(batchSchema("event_id").dataType))
        .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("s").toString)
      val part = {
        val s = java.nio.file.Files.list(tmp.resolve("s"))
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator)
          .asScala.filter(_.toString.endsWith(".parquet")).toSeq.head
        finally s.close()
      }
      java.nio.file.Files.copy(part, streamDir.resolve(s"zz_sentinel_$i.parquet"))
      deleteRecursively(tmp)
    }

    def runOnce(): Unit = {
      val events = normalizeTs(
        ss.readStream.schema(batchSchema).parquet(streamDir.toString),
        batchSchema)
        // rows missing identity/time can't sessionize, and a null in
        // any of these primitives would crash the SessionEvent decode
        // mid-stream; value is a payload aggregate, so a null there
        // contributes 0 instead of killing the drive
        .where(col("event_id").isNotNull && col("ts").isNotNull &&
          col("user_id").isNotNull)
        .select(col("event_id").cast("long").as("event_id"), col("ts"),
          col("user_id").cast("long").as("user_id"),
          col("event_type").cast("string").as("event_type"),
          coalesce(col("value").cast("double"), lit(0.0)).as("value"))
        .as[SessionEvent]
      val q = sessionize(events).writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // the finally block keeps a failed drive from leaking scratch dirs
    // into /tmp across repeated bench/gate runs; the rollup output dir
    // is NOT scratch — it backs the returned DataFrame
    val rollup = rollupDir.getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft-sess-rollup")
      deleteOnJvmExit(d) // default dir lives until JVM exit; production
      d.toString         // callers pass their own path and own its life
    }
    try {
      runOnce() // all data, single batch, watermark 0 — nothing dropped
      addSentinel(days = 30, i = 0)
      runOnce() // advances the persisted watermark past all real sessions
      addSentinel(days = 60, i = 1)
      runOnce() // pending timeouts fire with the advanced watermark

      val sessionSchema =
        org.apache.spark.sql.Encoders.product[UserSession].schema
      // per-user rollup is written executor-side and returned as a
      // distributed parquet read — no row ever passes through the
      // driver, so the shape holds at production user cardinality.
      // Only the reserved sentinel user is excluded — real negative
      // ids sessionize like any other.
      ss.read.schema(sessionSchema).parquet(outDir.toString)
        .where(col("user_id") =!= sentinelId)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"))
        .write.mode("overwrite").parquet(rollup)
    } finally {
      latest.unpersist()
      deleteRecursively(ckpt)
      deleteRecursively(streamDir)
      deleteRecursively(outDir)
    }
    spark.read.parquet(rollup)
  }

  /** Best-effort JVM-exit cleanup for default-located rollup dirs.
    * One shared hook + a registry, so a long-lived driver running many
    * gate/bench cycles doesn't accumulate a shutdown hook per call. */
  @transient private lazy val exitDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  @transient private lazy val exitHook: Thread = {
    val t = new Thread(() => exitDirs.forEach(d =>
      try deleteRecursively(d) catch { case _: Exception => () }))
    Runtime.getRuntime.addShutdownHook(t)
    t
  }
  private def deleteOnJvmExit(dir: java.nio.file.Path): Unit = {
    exitHook // force one-time registration
    exitDirs.add(dir)
  }

  /** Streaming watermarked dedup driven to completion and
    * oracle-checkable (gate row q38): the input directory is staged
    * with TWO copies of every events file, so the stream carries each
    * event twice; `withWatermark + dropDuplicatesWithinWatermark` on
    * `event_id` must reduce it back to exactly the source's distinct
    * rows (append-mode memory sink — dedup emits rows on arrival). A
    * no-op dedup would emit twice the rows and fail the oracle's row
    * count, so the gate genuinely observes the dropping. At scale the
    * same plan runs unbounded: dropDuplicatesWithinWatermark expires
    * per-event_id state as the watermark passes (plain
    * dropDuplicates without the event-time column in its key set
    * would hold state forever). */
  def dedupToCompletion(spark: SparkSession,
      eventsPath: String): DataFrame = {
    recycleTables()
    val ss = gateSession(spark)
    val batchSchema = ss.read.parquet(eventsPath).schema
    val streamDir = stageAsDir(ss, eventsPath, copies = 2)
    val events = normalizeTs(
      ss.readStream.schema(batchSchema).parquet(streamDir.toString),
      batchSchema)
    val deduped = dedupe(events, lateness = "1 hour")
    val name = s"graft_stream_dedup_${runCounter.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt")
    liveTables.add(ss -> name)
    try {
      val q = deduped.writeStream
        .outputMode(OutputMode.Append)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      deleteRecursively(ckpt)
      deleteRecursively(streamDir)
    }
    ss.table(name)
  }
}
