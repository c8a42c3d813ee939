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

  /** Source-config frequency class → streaming trigger
    * (`schema/v1.json:21-27` enum; EventBridge rate rules). */
  def triggerFor(frequency: String): Trigger = frequency match {
    case "minute" => Trigger.ProcessingTime("1 minute")
    case "hour"   => Trigger.ProcessingTime("1 hour")
    case "day"    => Trigger.ProcessingTime("1 day")
    case other =>
      throw new IllegalArgumentException(s"unknown frequency: $other")
  }

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

  /** Streaming station diff-upsert (K1 as custom state): one state cell
    * per station key holding the last content hash; a row is emitted
    * only when its hash differs from state — the
    * `providers.js:101-116` content-diff as
    * `flatMapGroupsWithState`.  State is per-key and O(1); the
    * watermark-less NoTimeout matches the reference (stations never
    * expire).  At scale this is the canonical bounded-state pattern:
    * keys partition across executors, the store is incremental
    * (RocksDB-backed in production configs). */
  def diffUpsertStream(spark: SparkSession, stations: DataFrame,
                       keyCol: String = "key",
                       contentCol: String = "content",
                       seqCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    // Within-batch winner = last write: ordered by `seqCol` (event
    // time / sequence number) when the stream carries one, with content
    // as a deterministic tiebreak.  Without a sequence column the
    // lexicographically-last content stands in — deterministic, but
    // only reference-faithful when batches carry at most one update
    // per key (the reference's per-source fetches).
    val seqExpr = seqCol.map { c =>
      stations.schema(c).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _ => col(c).cast("long")
      }
    }.getOrElse(lit(0L))
    val typed = stations
      .select(col(keyCol).cast("string").as("_1"),
        col(contentCol).cast("string").as("_2"),
        seqExpr.as("_3"))
      .as[(String, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[String, (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String, Long)],
         state: GroupState[String]) =>
          val content = rows.maxBy(r => (r._3, r._2))._2
          val hash = java.security.MessageDigest.getInstance("MD5")
            .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val prev = state.getOption
          if (prev.contains(hash)) Iterator.empty
          else { state.update(hash); Iterator.single((key, content)) }
      }.toDF(keyCol, contentCol)
  }

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
