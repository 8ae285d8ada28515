package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming semantics: the same windowed aggregation, computed by the
  * Structured Streaming engine (watermark + append mode) and by a batch
  * query, must agree on closed windows.
  */
class EventStreamSpec extends SparkSpec {

  test("watermarked tumbling-window counts match the batch computation") {
    val dir = sf("sf0.001")
    // FileStreamSource wants a directory: stage the events table into one
    // (this is also the shape a crawl's per-batch appends produce)
    val stage = java.nio.file.Files.createTempDirectory("stream-events").toString
    spark.read.parquet(s"$dir/events.parquet").write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema

    val streamDf = EventStream.windowedCounts(spark, stage, schema)
    assert(streamDf.isStreaming)
    EventStream.runAvailableNow(streamDf, "win_counts")
    val streamed = spark.table("win_counts")

    val batch = spark.read.parquet(stage)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"),
        round(col("total_value"), 4).as("total_value"))

    // append mode emits only windows closed by the watermark: the final
    // (max-ts) windows may be withheld — every emitted row must match batch,
    // and the emitted set must cover all but the watermark tail
    val streamedRows = streamed.collect().map(_.toSeq).toSet
    val batchRows = batch.collect().map(_.toSeq).toSet
    assert(streamedRows.subsetOf(batchRows),
      s"streamed rows not found in batch: ${(streamedRows -- batchRows).take(3)}")
    assert(streamedRows.size >= batchRows.size - 40, // tail windows within the 2h watermark
      s"too few closed windows: ${streamedRows.size} of ${batchRows.size}")
    assert(streamedRows.nonEmpty)
  }
}
