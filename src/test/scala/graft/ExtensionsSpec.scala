package graft

import graft.plans.SortedIntersectSize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SortedIntersectSize agrees with array_intersect on random sets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(50)).distinct.sorted
      val b = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(50)).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diffs = df.select(
      SortedIntersectSize.sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diffs == 0)
    // null propagation
    val n = Seq((Seq(1, 2), null.asInstanceOf[Seq[Int]])).toDF("a", "b")
      .select(SortedIntersectSize.sortedIntersectSize(col("a"), col("b")))
      .first()
    assert(n.isNullAt(0))
  }

  test("SortedIntersectSize merges sorted long arrays (xxhash64 token ids)") {
    val df = Seq((Seq(-9L, 1L, 5L), Seq(-9L, 5L, 11L))).toDF("a", "b")
    val r = df.select(
      SortedIntersectSize.sortedIntersectSize(col("a"), col("b"))).first().getInt(0)
    assert(r == 2)
    // agrees with array_intersect on random long sets
    val rnd = new scala.util.Random(7)
    val rows = (1 to 100).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => rnd.nextLong() % 50).distinct.sorted
      val b = (1 to rnd.nextInt(30)).map(_ => rnd.nextLong() % 50).distinct.sorted
      (a, b)
    }
    val diffs = rows.toDF("a", "b").select(
      SortedIntersectSize.sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("token encoding is map-side: no shuffle, no window, no dictionary join") {
    val enc = graft.ext.Dedup.encodeTokenSets(
      Tables.documents(spark, sf0001), "doc_id", "text", None)
    val shuffles = enc.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "encoding must stay narrow (scan-task-local)")
    val windows = enc.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "no window (esp. no global-sort dictionary)")
    val joins = enc.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "no vocabulary join")
  }

  test("x3 LSH pipeline carries no forced broadcast hints") {
    val pairs = graft.ext.Dedup.minhashLshPairs(
      Tables.documents(spark, sf0001), "doc_id", "text",
      n = 1, k = 8, bandRows = 2, threshold = 0.8)
    val hints = pairs.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty,
      "broadcast choice belongs to AQE — a hint forces driver materialization")
  }

  test("sorted_intersect_size is SQL-registered via GraftExtensions") {
    val r = spark.sql(
      "SELECT sorted_intersect_size(array(1,2,3), array(2,3,4))")
      .first().getInt(0)
    assert(r == 2)
  }

  test("PushNanosEquivFilter restores range pushdown on nano timestamps") {
    val q = Tables.events(spark, sf0001)
      .filter(col("ts").between(lit("2024-01-03 00:00:00"),
                                lit("2024-01-25 00:00:00")))
      .select(col("event_id"))
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts,"),
      s"raw-nanos lower bound not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,"),
      s"raw-nanos upper bound not pushed: $pushed")
    // and the rewrite changes no results: micros(ns) ∈ [lo,hi] ⟺
    // ns ∈ [lo·1000, hi·1000+999], checked against the raw long column
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ns(s: String) = java.time.Instant.parse(s).getEpochSecond * 1000000000L
    val expected = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("ts") >= ns("2024-01-03T00:00:00Z") &&
        col("ts") <= ns("2024-01-25T00:00:00Z") + 999)
      .count()
    assert(q.count() == expected)
  }
}
