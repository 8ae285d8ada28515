package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY.md §2.12): the crawl loop itself is
  * deliberately an iterative batch loop (the frontier refills while it
  * drains — see SURVEY), but the RESULT side is a genuine unbounded stream:
  * crawl outputs / event logs arrive as files and are aggregated with
  * watermarked event-time windows.
  *
  * `windowedCounts` is the canonical readStream → watermark → window →
  * writeStream pipeline over the events table schema; usable both on a
  * directory the crawl appends to and (in tests) via availableNow triggers.
  */
object EventStream {

  /** Tumbling-window per-type counts with a watermark for late data. */
  def windowedCounts(
      spark: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "2 hours"
  ): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("cnt"),
        round(col("total_value"), 4).as("total_value")
      )

  /** Streaming exact dedup: first occurrence per key WINS ACROSS
    * micro-batches (the state store carries the seen-key set between
    * triggers — the streaming analogue of the frontier's Q1 first-wins
    * contract). Projected to the key column only, so the emitted row per
    * key is deterministic regardless of which duplicate arrived first.
    * At scale the state store is RocksDB-backed and keys should carry a
    * watermark column + `dropDuplicatesWithinWatermark` to bound state;
    * unbounded here because the test corpus is bounded.
    */
  def dedupStream(
      spark: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType,
      keyCol: org.apache.spark.sql.Column
  ): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // force multi-micro-batch state carry
      .parquet(dir)
      .select(keyCol.as("key"))
      .dropDuplicates("key")

  /** Run the stream to completion over the files currently present
    * (Trigger.AvailableNow — the batch-bounded execution of the same
    * streaming plan), landing results in an in-memory table.
    */
  def runAvailableNow(df: DataFrame, queryName: String): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q
  }
}
