package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Stand-in HTTP client behind the [[graft.sources.v2.PageFetcher]]
  * boundary: proves the transport is pluggable by class name. */
class CannedFetcher extends graft.sources.v2.PageFetcher {
  override def fetch(req: graft.sources.v2.PageRequest): Seq[String] =
    Seq("""{"sensor_index": 7, "pm25": 0.7}""",
      """{"sensor_index": 8, "pm25": 0.8}""")
}

/** Captures the conf handed to [[graft.sources.v2.PageFetcher.configure]]
  * so the option-plumbing test can assert on it. */
class RecordingConfFetcher extends graft.sources.v2.FixtureFetcher {
  override def configure(conf: Map[String, String]): Unit =
    RecordingConfFetcher.seen = conf
}
object RecordingConfFetcher {
  @volatile var seen: Map[String, String] = Map.empty
}

class DsV2Spec extends SparkSpec {
  import spark.implicits._

  lazy val path: String = fixture("readings.jsonl")

  test("DSv2 source reads with inferred schema") {
    val df = spark.read.format("graft-fixture").load(path)
    assert(df.count() == 4)
    assert(df.schema("sensor_index").dataType.typeName == "long")
    assert(df.schema("pm25").dataType.typeName == "double")
  }

  test("filters and column pruning are pushed to the connector") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter($"location_type" === 0 && $"pm25" > 4.0)
      .select($"sensor_index", $"pm25")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    val desc = scan.scan.description()
    assert(desc.contains("EqualTo(location_type,0)"), desc)
    assert(desc.contains("GreaterThan(pm25,4.0)"), desc)
    assert(desc.contains("columns=[sensor_index,pm25]"), desc)
    val rows = df.orderBy("sensor_index").as[(Long, Double)].collect()
    assert(rows.toSeq == Seq((456L, 7.0), (999L, 12.5)))
  }

  test("paged payload: one InputPartition per page, pushdown applied in-task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages_").toString
    (0 until 3).foreach { p =>
      val lines = (0 until 4).map(i =>
        s"""{"sensor_index": ${p * 10 + i}, "pm25": ${i * 2.0}, "name": "pg$p-$i"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/page-00$p.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val df = spark.read.format("graft-fixture").load(dir)
    assert(df.rdd.getNumPartitions == 3,
      "each page must map to its own InputPartition (task-parallel fetch)")
    assert(df.count() == 12)
    val filtered = df.filter($"pm25" > 3.0).select($"sensor_index")
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    val desc = scan.scan.description()
    assert(desc.contains("GreaterThan(pm25,3.0)"), desc)
    assert(desc.contains("columns=[sensor_index]"), desc)
    assert(filtered.rdd.getNumPartitions == 3)
    assert(filtered.count() == 6) // pm25 ∈ {4.0, 6.0} per page
  }

  test("aggregate pushdown: COUNT/MIN/MAX collapse at the source — " +
    "no Spark-side aggregate, same answers") {
    val df = spark.read.format("graft-fixture").load(path)
    // global agg with a pushed filter underneath
    val global = df.filter($"location_type" === 0)
      .agg(count(lit(1)).as("n"), min($"pm25").as("lo"),
        max($"pm25").as("hi"))
    val plan = global.queryExecution.executedPlan
    assert(!plan.toString.contains("HashAggregate"),
      s"aggregate should be fully pushed:\n$plan")
    val desc = plan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get.scan.description()
    assert(desc.contains("aggregates=["), desc)
    assert(global.as[(Long, Double, Double)].collect().toSeq ==
      Seq((3L, 3.4, 12.5)))

    // grouped agg: the type-1 group's only pm25 is null → MAX null,
    // COUNT(*) still 1 (Spark null semantics mirrored at the source)
    val grouped = df.groupBy($"location_type")
      .agg(count(lit(1)).as("n"), max($"pm25").as("hi"))
      .orderBy($"location_type")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(grouped == Seq((0L, 3L, Some(12.5)), (1L, 1L, None)))
  }

  test("aggregate pushdown: SUM/AVG collapse at the source — AVG " +
    "answered directly, not decomposed") {
    val df = spark.read.format("graft-fixture").load(path)
    // global sum+avg with a pushed filter underneath
    val global = df.filter($"location_type" === 0)
      .agg(sum($"pm25").as("s"), avg($"pm25").as("a"),
        sum($"sensor_index").as("si"))
    val plan = global.queryExecution.executedPlan
    assert(!plan.toString.contains("HashAggregate"),
      s"sum/avg should be fully pushed:\n$plan")
    val desc = plan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get.scan.description()
    assert(desc.contains("sum(pm25)") && desc.contains("avg(pm25)"), desc)
    val row = global.as[(Double, Double, Long)].head()
    assert(math.abs(row._1 - 22.9) < 1e-9)                 // 3.4+7.0+12.5
    assert(math.abs(row._2 - 22.9 / 3) < 1e-9)
    assert(row._3 == 123L + 456L + 999L)

    // grouped avg: the type-1 group's only pm25 is null → AVG null
    val grouped = df.groupBy($"location_type")
      .agg(avg($"pm25").as("a"), sum($"pm25").as("s"))
      .orderBy($"location_type")
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(grouped.map(_._1) == Seq(0L, 1L))
    assert(grouped(1)._2.isEmpty && grouped(1)._3.isEmpty)
    assert(math.abs(grouped(0)._2.get - 22.9 / 3) < 1e-9)
  }

  test("aggregate pushdown type-gates MIN/MAX and SUM: unsupported " +
    "column types keep Spark's aggregate instead of throwing") {
    // user-supplied schema with a timestamp column: the source cannot
    // order timestamps driver-side, so it must DECLINE the pushdown
    // (keeping Spark's aggregate), not accept it and throw at planning
    val tmp = java.nio.file.Files.createTempFile("graft_ts_", ".jsonl")
    java.nio.file.Files.write(tmp,
      ("""{"sensor_index": 1, "seen": "2024-01-01 10:00:00"}""" + "\n" +
       """{"sensor_index": 2, "seen": "2024-01-02 11:00:00"}""")
        .getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sensor_index",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seen",
        org.apache.spark.sql.types.TimestampType)))
    val df = spark.read.format("graft-fixture").schema(schema)
      .load(tmp.toString)
    val q = df.agg(max($"seen").as("m"), sum($"sensor_index").as("s"))
    assert(q.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "MAX(timestamp) must not be claimed by the source")
    val row = q.as[(java.sql.Timestamp, Long)].head()
    assert(row._1.toString.startsWith("2024-01-02") && row._2 == 3L)
  }

  test("timestamp payload fields parse with session-timezone rules: " +
    "zoneless strings read in the session zone, 'Z' and ±hh:mm offsets " +
    "honor their zone") {
    // session zone is UTC: all four spellings below are the same instant
    val tmp = java.nio.file.Files.createTempFile("graft_tsz_", ".jsonl")
    java.nio.file.Files.write(tmp,
      ("""{"sensor_index": 1, "seen": "2024-01-01 10:00:00"}""" + "\n" +
       """{"sensor_index": 2, "seen": "2024-01-01T10:00:00"}""" + "\n" +
       """{"sensor_index": 3, "seen": "2024-01-01T10:00:00Z"}""" + "\n" +
       """{"sensor_index": 4, "seen": "2024-01-01T12:00:00+02:00"}""")
        .getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sensor_index",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seen",
        org.apache.spark.sql.types.TimestampType)))
    val seen = spark.read.format("graft-fixture").schema(schema)
      .load(tmp.toString)
      .select(unix_micros($"seen")).as[Long].collect().toSet
    assert(seen == Set(1704103200000000L),
      s"all four spellings must land on 2024-01-01T10:00:00Z: $seen")
  }

  test("aggregate pushdown declines honestly on paged dirs; " +
    "COUNT(DISTINCT) pushes COMPLETE on the single-payload path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aggp_").toString
    (0 until 2).foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/page-00$p.jsonl"),
        s"""{"sensor_index": $p, "pm25": ${p + 1.0}}""".getBytes("UTF-8"))
    }
    val paged = spark.read.format("graft-fixture").load(dir)
      .agg(count(lit(1)).as("n"))
    assert(paged.queryExecution.executedPlan.toString
      .contains("HashAggregate"),
      "paged directories must keep Spark's aggregate")
    assert(paged.as[Long].head() == 2L)

    // single-payload path: the driver-side fetch owns every row, so a
    // per-group distinct is closed-form and pushes COMPLETE
    val distinct = spark.read.format("graft-fixture").load(path)
      .agg(countDistinct($"location_type").as("n"))
    assert(!distinct.queryExecution.executedPlan.toString
      .contains("HashAggregate"),
      "COUNT(DISTINCT) should push complete on the single-payload path")
    assert(distinct.as[Long].head() == 2L)

    // a paged dir could never merge partial distincts — still declined
    val pagedDistinct = spark.read.format("graft-fixture").load(dir)
      .agg(countDistinct($"pm25").as("n"))
    assert(pagedDistinct.queryExecution.executedPlan.toString
      .contains("HashAggregate"),
      "paged COUNT(DISTINCT) must keep Spark's aggregate")
    assert(pagedDistinct.as[Long].head() == 2L)
  }

  test("gzipped pages and the PageFetcher boundary") {
    // gz page read transparently (the reference's gzip-aware body)
    val dir = java.nio.file.Files.createTempDirectory("graft_gzp_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/page-000.jsonl"),
      """{"sensor_index": 1, "pm25": 1.0}""".getBytes("UTF-8"))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/page-001.jsonl.gz"))
    gz.write("""{"sensor_index": 2, "pm25": 2.0}""".getBytes("UTF-8"))
    gz.close()
    val df = spark.read.format("graft-fixture").load(dir)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("sensor_index").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    // a custom fetcher swaps the transport without touching the plan
    val custom = spark.read.format("graft-fixture")
      .option("fetcher", classOf[CannedFetcher].getName)
      .load("ignored-by-canned-fetcher")
    assert(custom.select("sensor_index").as[Long].collect().sorted.toSeq
      == Seq(7L, 8L))
  }

  test("HttpClientFetcher: real transport against an in-process server " +
    "through the DSv2 scan; params, gzip, retry") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import graft.sources.v2.{HttpClientFetcher, PageRequest}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var lastQuery: String = null
    val body =
      "{\"sensor_index\": 1, \"pm25\": 1.5}\n{\"sensor_index\": 2, \"pm25\": 2.5}"
        .getBytes("UTF-8")
    server.createContext("/data", (ex: HttpExchange) => {
      lastQuery = ex.getRequestURI.getQuery
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/gz", (ex: HttpExchange) => {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(body); gz.close()
      val zipped = bos.toByteArray
      ex.getResponseHeaders.add("Content-Encoding", "gzip")
      ex.sendResponseHeaders(200, zipped.length)
      ex.getResponseBody.write(zipped); ex.close()
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (hits.incrementAndGet() < 3) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/forbidden", (ex: HttpExchange) => {
      ex.sendResponseHeaders(403, -1); ex.close()
    })
    server.createContext("/crlf", (ex: HttpExchange) => {
      val b = new String(body, "UTF-8").split("\n").mkString("", "\r\n", "\r\n")
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      // end-to-end: schema inference + scan both fetch over real HTTP
      val df = spark.read.format("graft-fixture")
        .option("fetcher", classOf[HttpClientFetcher].getName)
        .load(s"$base/data")
      assert(df.select("sensor_index").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L))
      val f = new HttpClientFetcher
      // params: sorted + URL-encoded into the query string
      assert(f.fetch(PageRequest(s"$base/data",
        params = Map("b" -> "2", "a" -> "x y"))).size == 2)
      assert(lastQuery == "a=x+y&b=2")
      // Content-Encoding: gzip decodes transparently
      assert(f.fetch(PageRequest(s"$base/gz")).size == 2)
      // CRLF line endings: no trailing \r survives on any line
      val crlf = f.fetch(PageRequest(s"$base/crlf"))
      assert(crlf.size == 2 && crlf.forall(!_.endsWith("\r")), crlf)
      // 5xx retries until success (3rd attempt here)
      System.setProperty("graft.http.backoffMs", "1")
      assert(f.fetch(PageRequest(s"$base/flaky")).size == 2)
      assert(hits.get() == 3)
      // 4xx fails fast, no retry
      val e = intercept[IllegalStateException] {
        f.fetch(PageRequest(s"$base/forbidden"))
      }
      assert(e.getMessage.contains("403"))
    } finally {
      System.clearProperty("graft.http.backoffMs")
      server.stop(0)
    }
  }

  test("fetcher.* source options reach the fetcher via configure") {
    RecordingConfFetcher.seen = Map.empty
    val df = spark.read.format("graft-fixture")
      .option("fetcher", classOf[RecordingConfFetcher].getName)
      .option("fetcher.maxInflightPerHost", "3")
      .option("fetcher.apiKeyHeader", "X-Key")
      .load(path)
    assert(df.count() == 4)
    // DSv2 option maps are case-insensitive → keys arrive lowercased,
    // prefix stripped
    assert(RecordingConfFetcher.seen.get("maxinflightperhost")
      .contains("3"), RecordingConfFetcher.seen)
    assert(RecordingConfFetcher.seen.get("apikeyheader")
      .contains("X-Key"), RecordingConfFetcher.seen)
  }

  test("per-host in-flight cap: 24 concurrent fetches never exceed the " +
    "configured limit, and all complete") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import graft.sources.v2.{HttpClientFetcher, PageRequest}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // an Executor with real parallelism — the default single-threaded
    // handler would serialize requests and mask a broken cap
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32))
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val body = "{\"v\": 1}".getBytes("UTF-8")
    server.createContext("/slow", (ex: HttpExchange) => {
      val now = inFlight.incrementAndGet()
      maxSeen.accumulateAndGet(now, Math.max(_, _))
      Thread.sleep(30) // widen the overlap window
      inFlight.decrementAndGet()
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = new HttpClientFetcher
      f.configure(Map("maxinflightperhost" -> "3"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(24)
      try {
        val futures = (1 to 24).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            override def call(): Int = f.fetch(PageRequest(s"$base/slow")).size
          })
        }
        assert(futures.map(_.get()).sum == 24, "every fetch must succeed")
      } finally pool.shutdown()
      assert(maxSeen.get() <= 3,
        s"server observed ${maxSeen.get()} concurrent requests, cap was 3")
      assert(maxSeen.get() >= 2,
        "the pool never overlapped — test lost its teeth")
    } finally server.stop(0)
  }

  test("limit pushdown: fully pushed for single payloads (with filters " +
    "applied first), declined for paged directories") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter($"pm25" > 4.0).limit(1)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("limit=1"),
      scan.scan.description())
    assert(df.count() == 1)
    // filters run BEFORE the truncation: the surviving row must satisfy
    // them (a truncate-then-filter scan could return zero rows here)
    assert(df.select($"pm25").as[Double].collect().forall(_ > 4.0))
    // paged directory: pushLimit declines (a page may be empty), Spark
    // applies the limit itself, results stay correct
    val dir = java.nio.file.Files.createTempDirectory("graft_lim_").toString
    (0 until 2).foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/page-00$p.jsonl"),
        s"""{"sensor_index": $p, "pm25": 1.0, "name": "x"}""".getBytes("UTF-8"))
    }
    val paged = spark.read.format("graft-fixture").load(dir).limit(1)
    val pscan = paged.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(!pscan.scan.description().contains("limit="),
      pscan.scan.description())
    assert(paged.count() == 1)
  }

  test("TopN pushdown: API-side ORDER BY + LIMIT (the reference's " +
    "sorted-listing early exit), filters applied first") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter($"location_type" === 0)
      .orderBy($"pm25".desc).limit(2)
      .select($"sensor_index", $"pm25")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.description().contains("topN=[pm25:2]"),
      scan.scan.description())
    // global order is the scan's responsibility once the Sort is gone
    val rows = df.as[(Long, Double)].collect().toSeq
    assert(rows == rows.sortBy(-_._2) && rows.length == 2, rows)
    assert(rows.forall(_._2 >= rows.last._2))
    // paged directories decline: Spark keeps its own Sort+Limit
    val dir = java.nio.file.Files.createTempDirectory("graft_topn_").toString
    (0 until 2).foreach { p =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/page-00$p.jsonl"),
        s"""{"sensor_index": $p, "pm25": ${p * 2.0}, "name": "x"}"""
          .getBytes("UTF-8"))
    }
    val paged = spark.read.format("graft-fixture").load(dir)
      .orderBy($"pm25".desc).limit(1)
    val pscan = paged.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(!pscan.scan.description().contains("topN="),
      pscan.scan.description())
    assert(paged.select($"sensor_index").as[Long].head() == 1L)
  }

  test("unsupported predicates fall back to post-scan evaluation") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter(substring($"name", 6, 1) === "A") // not connector-pushable
    assert(df.count() == 1)
    assert(df.select("sensor_index").as[Long].first() == 123L)
  }

  test("null-aware filters behave API-side") {
    val notNull = spark.read.format("graft-fixture").load(path)
      .filter($"pm25".isNotNull)
    assert(notNull.count() == 3)
    val in = spark.read.format("graft-fixture").load(path)
      .filter($"name".isin("Site A", "Site C"))
    assert(in.count() == 2)
  }
}
