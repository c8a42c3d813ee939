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

  /** Per-window heavy hitters, CMS-prefiltered and exact-verified: keys
    * with at least `minFreq` events inside their tumbling `windowDur`
    * window, with exact counts.  The composite `(window, key)` is
    * hashed into ONE Count-Min sketch, so "frequency of key k in
    * window w" is a plain sketch lookup — the windowed variant costs
    * the same fixed memory as the global one (no per-window sketch
    * table, no sketch-column join).
    *
    * Exactness: CMS over-counts only, so `estimate >= minFreq` never
    * drops a true heavy hitter; the exact group-by over the surviving
    * sliver removes false positives — output is sketch-independent
    * (the x46 pattern, windowed).
    *
    * Streaming shape (pinned stream ≡ batch in StreamingSpec): the
    * sketch is built once from accepted history and broadcast — per
    * micro-batch the probe is a stateless codegen'd filter and the
    * exact verify is an ordinary watermarked windowed count whose
    * state is CANDIDATE-sized, not key-space-sized.  That's the point
    * at scale: the state store holds only (window, key) groups that
    * might be heavy, while the sketch absorbs the long tail in
    * depth×width longs. */
  def windowedHeavyHitters(events: DataFrame, tsCol: String, keyCol: String,
                           windowDur: String, minFreq: Long,
                           depth: Int = 4, width: Int = 1 << 14,
                           probeSketch: Option[Array[Byte]] = None,
                           buildOnly: Boolean = false): DataFrame = {
    import graft.plans.{CmsEstimate, CountMinAgg}
    val keyed = events.select(
      window(col(tsCol), windowDur).getField("start").as("w"),
      col(keyCol).as("k"))
    val h = xxhash64(col("w"), col("k"))
    if (buildOnly)
      return keyed.agg(CountMinAgg.cmsAgg(h, depth, width).as("cms"))
    val cms = probeSketch.getOrElse(
      keyed.agg(CountMinAgg.cmsAgg(h, depth, width))
        .head().getAs[Array[Byte]](0))
    keyed.filter(CmsEstimate.cmsEstimate(CmsEstimate.broadcastCms(cms),
        depth, width, h) >= minFreq)
      .groupBy(col("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
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
