package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured Streaming surface. The reference has NO streaming layer
  * (SURVEY.md §2.5: verified absent), so this is a beyond-reference
  * extension: a graft-kv streaming sink (idempotent per-batch writes keyed
  * by row key — at-least-once delivery collapses to effective exactly-once
  * because puts are idempotent upserts by (key, cf, qual, ts)), plus the
  * streaming twin of the batch windowed aggregation.
  */
object GraftStreaming {

  /** Attach a graft-kv sink to a streaming DataFrame via foreachBatch.
    * Each micro-batch appends through the same DSv2 write path as batch
    * writes; `options` must carry the catalog. */
  def kvSink(stream: DataFrame, options: Map[String, String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], _: Long) =>
      batch.write.format("graft-kv").options(options).mode("append").save()
    }

  /** Watermarked 5-minute tumbling-window count/sum per event type —
    * the streaming twin of queries.Events.ev1WindowAgg. State is bounded
    * by the watermark; partial aggregation runs before the shuffle exactly
    * as in batch. */
  def windowedEventAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Run a streaming query until all currently-available source data is
    * processed, then stop (test-harness helper). */
  def runOnce(writer: DataStreamWriter[Row]): StreamingQuery = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
