package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Stage events into a plain-timestamp parquet dir (stream sources
    * can't use the nanos workaround path). */
  lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg equals the batch answer") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = Streams.fileStream(spark, stagedDir, schema)
    // complete mode: emit every window (append would withhold windows
    // newer than the final watermark)
    Streams.runToMemory(spark, Streams.hourlyAgg(stream), "hourly",
      outputMode = "complete")
    val streamed = spark.table("hourly")
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss"),
        $"event_type", $"n", $"sum_v")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss"),
        $"event_type", $"n", $"sum_v")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("watermark dedup removes double-delivered rows") {
    // stage the events twice (overlap re-read, SURVEY §2.9 late data)
    val dir = java.nio.file.Files.createTempDirectory("graft_dd_").toString
    val ev = Tables.events(spark, sf0001).limit(200)
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = Streams.fileStream(spark, dir, schema)
    Streams.runToMemory(spark,
      Streams.dedupWithinWatermark(stream, Seq("event_id")), "dedup")
    assert(spark.table("dedup").count() == 200)
  }
}

class QueriesSpec extends SparkSpec {
  test("every declared query returns rows at sf0.001 (smoke)") {
    val empties = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = try fn(spark, sf0001).count()
      catch { case e: Throwable => fail(s"$name threw: ${e.getMessage}") }
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without query: $dangling")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
