package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming semantics — SURVEY.md §2.9.
  *
  * The reference is a scheduled micro-batch pipeline (EventBridge →
  * SQS → Lambda, one source per invoke).  Structured Streaming maps it
  * directly: file source + trigger = the scheduler, watermark = the
  * late-data lookback, checkpoint = the S3 high-water-mark meta file,
  * dedup-within-watermark = the idempotent re-read overlap.
  *
  * At scale the same topology runs unchanged: the file source lists
  * incrementally (no re-scan of old partitions), state for
  * dropDuplicates is bounded by the watermark horizon, and sink commits
  * are per-micro-batch atomic via the checkpoint/WAL.
  */
object Streams {

  /** Micro-batch file ingest with per-frequency trigger
    * (`cdk/stack.ts:109-113` rate rules → `Trigger.ProcessingTime`). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Hourly tumbling aggregation with a 3-hour watermark — the
    * AirGradient lookback (`airgradient.js:137-141`) as declared late
    * tolerance. */
  def hourlyAgg(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "3 hours")
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))

  /** Idempotent overlap dedup: re-read lookbacks double-deliver rows;
    * dropDuplicates within the watermark keeps state bounded
    * (SURVEY §7.4.5: dedup key = (sensor_id, timestamp)). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, "3 hours")
      .dropDuplicates(keys :+ tsCol)

  /** Run any streaming transform to a memory sink until input drains —
    * the test/local harness (one batch == one source fetch). */
  def runToMemory(spark: SparkSession, out: DataFrame, queryName: String,
                  outputMode: String = "append"): StreamingQuery = {
    val q = out.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
