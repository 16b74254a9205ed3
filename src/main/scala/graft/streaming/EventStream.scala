package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
}
