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

  test("sketch kernels are SQL-registered: minhash_sig, simhash_sig, " +
    "token_set_encode match their Column-API forms") {
    import graft.ext.Dedup
    import spark.implicits._
    val docs = Seq((1L, "red fox jumps"), (2L, "blue fox"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("__sqldocs")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig(split(text, ' '), 1, 8) AS sig,
        |       simhash_sig(split(text, ' ')) AS sh,
        |       token_set_encode(split(text, ' ')) AS enc
        |FROM __sqldocs""".stripMargin)
      .as[(Long, Seq[String], Int, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 1, k = 8)
      .as[(Long, Seq[String])].collect().toMap
    val fps = Dedup.simhashFingerprints(docs, "doc_id", "text")
      .as[(Long, Int)].collect().toMap
    val encs = Dedup.encodeTokenSets(docs, "doc_id", "text", None)
      .select($"id", $"toks").as[(Long, Seq[Long])].collect().toMap
    for (id <- Seq(1L, 2L)) {
      assert(viaSql(id)._1 == sigs(id))
      assert(viaSql(id)._2 == fps(id))
      assert(viaSql(id)._3 == encs(id))
    }
    // non-literal n/k is a clear error, not a silent misplan
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(split(text, ' '), doc_id + 1, 8) " +
        "FROM __sqldocs").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("Bloom aggregate: distributed build equals local build bit-for-bit, " +
    "no false negatives, probe stays codegen'd") {
    import graft.plans.{BloomFilterAgg, BloomKernel, BloomMightContain}
    import spark.implicits._
    val keys = (0 until 2000).map(_.toLong)
    val (numBits, numHashes) = (1 << 15, 5)
    // distributed: 8 partitions of map-side partials OR-merged
    val distBytes = keys.toDF("k").repartition(8)
      .agg(BloomFilterAgg.bloomAgg($"k", numBits, numHashes))
      .head.getAs[Array[Byte]](0)
    // local reference build
    val words = new Array[Long](BloomKernel.wordsFor(numBits))
    keys.foreach(BloomKernel.set(words, numBits, numHashes, _))
    assert(distBytes.sameElements(
      BloomKernel.serialize(words, numBits, numHashes)),
      "OR-merge must be partitioning-independent")
    // no false negatives; false positives rare at ~16 bits/key
    val probed = (0 until 6000).map(_.toLong).toDF("v")
      .filter(BloomMightContain.bloomMightContain(distBytes, $"v"))
      .as[Long].collect().toSet
    assert((0 until 2000).forall(i => probed.contains(i.toLong)),
      "a Bloom filter can never drop an inserted key")
    val fps = probed.size - 2000
    assert(fps < 200, s"implausible FP count $fps at 16 bits/key")
    // the probe compiles into whole-stage codegen (no interpreted
    // eval); a Range source, because LocalRelation filters constant-fold
    val plan = spark.range(10).select($"id".as("v"))
      .filter(BloomMightContain.bloomMightContain(distBytes, $"v"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, plan.toString)
    // SQL surface: build with bloom_agg, probe with the filter bytes
    // bound as a BINARY parameter (foldable → accepted by the builder)
    val sqlBytes = spark.sql(
      "SELECT bloom_agg(xxhash64(CAST(id AS STRING)), 32768, 5) " +
        "FROM range(100)").head.getAs[Array[Byte]](0)
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM range(200) " +
        "WHERE bloom_might_contain(:f, xxhash64(CAST(id AS STRING)))",
      Map("f" -> sqlBytes)).head.getLong(0)
    assert(viaSql >= 100 && viaSql < 150,
      s"SQL probe found $viaSql of 100 inserted (+ rare FPs)")
  }

  test("Count-Min aggregate: distributed build equals local build " +
    "bit-for-bit, estimates never undercount, exact-prefilter heavy " +
    "hitters equal the naive aggregation even on a tiny sketch") {
    import graft.plans.{CmsEstimate, CmsKernel, CountMinAgg}
    import spark.implicits._
    // skewed stream: key i appears (i+1) times, i = 0..99
    val keys = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong))
    val (depth, width) = (4, 1 << 10)
    val distBytes = keys.toDF("k").repartition(8)
      .agg(CountMinAgg.cmsAgg($"k", depth, width))
      .head.getAs[Array[Byte]](0)
    val local = new Array[Long](depth * width)
    keys.foreach(CmsKernel.add(local, depth, width, _))
    assert(distBytes.sameElements(
      CmsKernel.serialize(local, depth, width)),
      "add-merge must be partitioning-independent")
    // one-sided error: estimate >= true count for every key
    val est = (0 until 100).map(_.toLong).toDF("v")
      .select($"v", CmsEstimate.cmsEstimate(distBytes, $"v").as("e"))
      .as[(Long, Long)].collect().toMap
    (0 until 100).foreach { i =>
      assert(est(i.toLong) >= i + 1,
        s"CMS undercounted key $i: ${est(i.toLong)} < ${i + 1}")
    }
    // SQL surface round trip
    val sqlBytes = spark.sql(
      "SELECT cms_agg(xxhash64(CAST(id % 10 AS STRING)), 4, 1024) " +
        "FROM range(1000)").head.getAs[Array[Byte]](0)
    val viaSql = spark.sql(
      "SELECT cms_estimate(:s, xxhash64(CAST(7 AS STRING))) AS e",
      Map("s" -> sqlBytes)).head.getLong(0)
    assert(viaSql >= 100, s"key 7 appears 100 times, estimated $viaSql")
    // heavy hitters: CMS prefilter = naive agg, even with a sketch so
    // small that collisions overestimate heavily (exactness comes from
    // the verify agg, same pattern as the 256-bit Bloom test)
    val docs = Tables.documents(spark, sf0001)
    val naive = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .filter($"freq" >= 50)
      .as[(String, Long)].collect().toSet
    for (w <- Seq(16, 1 << 14)) {
      val got = graft.ext.CorpusStats
        .heavyHitters(docs, "text", minFreq = 50L, depth = 4, width = w)
        .as[(String, Long)].collect().toSet
      assert(got == naive, s"width=$w heavy hitters diverged")
    }
  }

  test("HyperLogLog aggregate: partitioning-independent, duplicate-blind, " +
    "estimate within the theoretical error bound, SQL-registered") {
    import graft.plans.{HllAgg, HllKernel}
    import spark.implicits._
    val keys = (1 to 20000).map(i => s"key-$i")
    def est(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(HllAgg.hllAgg(col("v"))).head.getDouble(0)
    val base = est(keys.toDF("v").repartition(8))
    // partitioning must not move the estimate (max-merge is associative)
    assert(est(keys.toDF("v").repartition(3)) == base)
    // duplicates must not move it (max is idempotent)
    assert(est((keys ++ keys ++ keys.take(5000)).toDF("v").repartition(8))
      == base)
    // σ ≈ 1.04/√256 = 6.5%; allow 4σ
    assert(math.abs(base - 20000) / 20000 < 0.26,
      s"HLL estimate $base implausible for 20000 distinct")
    // local replay of the kernel matches the distributed aggregate
    val regs = new Array[Long](HllKernel.m)
    keys.foreach(k => HllKernel.add(regs, k.getBytes("UTF-8")))
    assert(HllKernel.estimate(regs) == base)
    // SQL surface
    keys.toDF("v").createOrReplaceTempView("__hllv")
    assert(spark.sql("SELECT hll_agg(v) FROM __hllv").head.getDouble(0)
      == base)
    // linear-counting branch: tiny cardinality stays near-exact
    val small = est((1 to 30).map(i => s"s$i").toDF("v"))
    assert(math.abs(small - 30) < 4, s"small-range estimate $small for 30")
    // arity errors name the function instead of dying mid-analysis
    val e0 = intercept[Exception] { spark.sql("SELECT hll_agg() FROM __hllv") }
    val e2 = intercept[Exception] {
      spark.sql("SELECT hll_agg(v, v) FROM __hllv") }
    assert(e0.getMessage.contains("hll_agg"), e0.getMessage)
    assert(e2.getMessage.contains("hll_agg"), e2.getMessage)
  }

  test("the sketch-valued HLL trio is SQL-registered with Column-API " +
    "parity: hll_est(hll_union(hll_singleton(v))) matches the " +
    "DataFrame chain bit for bit, and arity errors name the function") {
    import graft.plans.{HllEst, HllSingleton, HllUnionAgg}
    import spark.implicits._
    val keys = (1 to 5000).map(i => s"k-$i")
    keys.toDF("v").createOrReplaceTempView("__hlltrio")
    val viaApi = keys.toDF("v")
      .select(HllSingleton.hllSingleton(col("v")).as("s"))
      .agg(HllUnionAgg.hllUnion(col("s")).as("u"))
      .select(HllEst.hllEst(col("u")))
      .head.getDouble(0)
    val viaSql = spark.sql(
      "SELECT hll_est(hll_union(hll_singleton(v))) FROM __hlltrio")
      .head.getDouble(0)
    assert(viaSql == viaApi)
    // the singleton→union path must agree with the direct value agg —
    // one definition of the registers, two routes in
    assert(viaApi ==
      keys.toDF("v").agg(graft.plans.HllAgg.hllAgg(col("v")))
        .head.getDouble(0))
    // a merged singleton round-trips its registers byte-for-byte
    val sqlSketch = spark.sql(
      "SELECT hll_union(hll_singleton(v)) FROM __hlltrio WHERE v = 'k-1'")
      .head.getAs[Array[Byte]](0)
    val apiSketch = Seq("k-1").toDF("v")
      .select(HllSingleton.hllSingleton(col("v")))
      .head.getAs[Array[Byte]](0)
    assert(sqlSketch.toSeq == apiSketch.toSeq)
    for (bad <- Seq("SELECT hll_singleton() FROM __hlltrio",
      "SELECT hll_union(hll_singleton(v), hll_singleton(v)) FROM __hlltrio",
      "SELECT hll_est() FROM __hlltrio")) {
      val err = intercept[Exception] { spark.sql(bad) }
      assert(err.getMessage.contains("hll_"), err.getMessage)
    }
  }

  test("sketch probes ship as broadcasts, not plan literals: a " +
    "production-width sketch adds only a handle to the serialized " +
    "expression") {
    import graft.plans.{CmsEstimate, CmsKernel, CountMinAgg}
    import graft.plans.{BloomFilterAgg, BloomKernel, BloomMightContain}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    def serializedSize(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    // width 2^18 at depth 4 = 8 MB of counters; numBits 2^24 = 2 MB of
    // filter words.  The task closure must carry the Broadcast handle
    // (KBs), not the arrays.
    val (depth, width) = (4, 1 << 18)
    val cmsBytes = (0 until 1000).map(_.toLong).toDF("k")
      .agg(CountMinAgg.cmsAgg($"k", depth, width))
      .head.getAs[Array[Byte]](0)
    assert(cmsBytes.length > (8 << 20))
    val cmsExpr = ColumnBridge.expression(
      CmsEstimate.cmsEstimate(cmsBytes, $"k"))
    assert(serializedSize(cmsExpr) < (64 << 10),
      s"cms_estimate expression serialized to ${serializedSize(cmsExpr)} B " +
        "— the sketch is riding the plan instead of a broadcast")
    val bloomBytes = (0 until 1000).map(_.toLong).toDF("k")
      .agg(BloomFilterAgg.bloomAgg($"k", 1 << 24, 5))
      .head.getAs[Array[Byte]](0)
    assert(bloomBytes.length > (1 << 20))
    val bloomExpr = ColumnBridge.expression(
      BloomMightContain.bloomMightContain(bloomBytes, $"k"))
    assert(serializedSize(bloomExpr) < (64 << 10),
      s"bloom_might_contain expression serialized to " +
        s"${serializedSize(bloomExpr)} B — the filter is riding the plan " +
        "instead of a broadcast")
    // and the broadcast-backed probes still answer correctly
    val est = (0 until 10).map(_.toLong).toDF("k")
      .select(CmsEstimate.cmsEstimate(cmsBytes, $"k").as("e"))
      .as[Long].collect()
    assert(est.forall(_ >= 1))
    val hits = (0 until 2000).map(_.toLong).toDF("k")
      .filter(BloomMightContain.bloomMightContain(bloomBytes, $"k"))
      .count()
    assert(hits >= 1000 && hits < 1100, s"bloom probe found $hits")
  }

  test("Bloom decontamination equals the exact semi-join even when the " +
    "filter is sized to false-positive heavily") {
    val docs = Tables.documents(spark, sf0001)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    import spark.implicits._
    val exact = graft.ext.Dedup
      .contaminatedDocs(train, bench, "doc_id", "text", n = 5)
      .as[Long].collect().toSet
    // 256 bits for thousands of shingles → the prefilter passes almost
    // everything; the verify join must still produce the exact answer
    val bloomTiny = graft.ext.Dedup.contaminatedDocsBloom(train, bench,
      "doc_id", "text", n = 5, numBits = 256, numHashes = 3)
      .as[Long].collect().toSet
    assert(bloomTiny == exact)
    // and a realistically-sized filter too
    val bloom = graft.ext.Dedup.contaminatedDocsBloom(train, bench,
      "doc_id", "text", n = 5)
      .as[Long].collect().toSet
    assert(bloom == exact)
  }

  test("pii_redact is SQL-registered and matches the Column-API scrub") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail jo@x.org from 10.0.0.1 ssn 123-45-6789"),
      (2L, "nothing here")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("__piidocs")
    val viaSql = spark.sql(
      "SELECT doc_id, pii_redact(text) AS r FROM __piidocs")
      .as[(Long, String)].collect().toMap
    assert(viaSql(1L) == "mail <EMAIL> from <IP> ssn <SSN>")
    assert(viaSql(2L) == "nothing here")
    val viaCol = docs.select($"doc_id",
        graft.ext.Pii.redact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(viaSql == viaCol)
  }

  test("PointInPolygon: convex, concave notch, outside, SQL registration") {
    import graft.plans.PointInPolygon.pointInPolygon
    // concave Asia/Shanghai ring from the GeoTz dim
    val (_, xs, ys) = graft.functions.GeoTz.zones.find(_._1 == "Asia/Shanghai").get
    val pts = Seq(
      (80.0, 25.0, true),   // plainly inside
      (110.0, 40.0, false), // inside bbox but in the concave notch
      (80.0, 25.0, true),
      (60.0, 25.0, false),  // west of the ring
      (80.0, 50.0, false)   // north of the ring
    ).toDF("px", "py", "want")
    val wrong = pts
      .withColumn("got", pointInPolygon(col("px"), col("py"),
        typedLit(xs), typedLit(ys)))
      .filter(col("got") =!= col("want")).count()
    assert(wrong == 0)
    // SQL registration via GraftExtensions
    val r = spark.sql(
      "SELECT point_in_polygon(0.5D, 0.5D, array(0D,1D,1D,0D), array(0.1D,0.2D,1.1D,1.2D))")
      .first().getBoolean(0)
    assert(r)
  }

  test("GeoTz polygon lookup: zone hit, concave miss, nautical fallback") {
    val pts = Seq(
      (1L, -75.0, 40.0),   // America/New_York
      (2L, 10.0, 50.0),    // Europe/Berlin
      (3L, 80.0, 25.0),    // Asia/Shanghai
      (4L, 110.0, 40.0),   // in Shanghai bbox but inside the notch → fallback
      (5L, 0.0, 0.0),      // ocean → fallback UTC+0
      (6L, 150.0, -30.0),  // Australia/Sydney
      (7L, -170.0, 10.0)   // ocean far west → UTC-11
    ).toDF("id", "lon", "lat")
    val got = graft.functions.GeoTz.tzForPoints(pts, "id", "lon", "lat")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "America/New_York")
    assert(got(2L) == "Europe/Berlin")
    assert(got(3L) == "Asia/Shanghai")
    assert(got(4L) == "UTC+7")
    assert(got(5L) == "UTC+0")
    assert(got(6L) == "Australia/Sydney")
    assert(got(7L) == "UTC-11")
  }

  test("GeoTz coarse world extract: real city coordinates resolve to " +
    "their IANA zones; loadZones round-trips an external dim") {
    import graft.functions.GeoTz
    val cities = Seq(
      (1L, -118.24, 34.05, "America/Los_Angeles"), // Los Angeles
      (2L, -87.63, 41.88, "America/Chicago"),      // Chicago
      (3L, -74.01, 40.71, "America/New_York"),     // New York
      (4L, -0.13, 51.51, "Europe/London"),         // London
      (5L, 13.40, 52.52, "Europe/Berlin"),         // Berlin
      (6L, 77.21, 28.64, "Asia/Kolkata"),          // Delhi
      (7L, 121.47, 31.23, "Asia/Shanghai"),        // Shanghai
      (8L, 139.69, 35.69, "Asia/Tokyo"),           // Tokyo
      (9L, 151.21, -33.87, "Australia/Sydney"),    // Sydney
      (10L, 28.05, -26.20, "Africa/Johannesburg"), // Johannesburg
      (11L, -46.63, -23.55, "America/Sao_Paulo"),  // São Paulo
      (12L, -140.0, -20.0, "UTC-9")                // open Pacific → nautical
    )
    val pts = cities.map(c => (c._1, c._2, c._3)).toDF("id", "lon", "lat")
    val got = GeoTz.tzForPoints(pts, "id", "lon", "lat",
        zs = GeoTz.coarseWorldZones)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cities.foreach { case (id, _, _, want) =>
      assert(got(id) == want, s"city $id: got ${got(id)}, want $want")
    }
    // external extract: one zone through the JSON bridge
    val dir = java.nio.file.Files.createTempDirectory("graft_tz_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/zones.json"),
      """{"tz": "Test/Zone", "xs": [0.5, 10.5, 9.5, 1.5], "ys": [0.5, 1.5, 10.5, 9.5]}""")
    val loaded = GeoTz.loadZones(spark, s"$dir/zones.json")
    assert(loaded == Seq(("Test/Zone", Seq(0.5, 10.5, 9.5, 1.5),
      Seq(0.5, 1.5, 10.5, 9.5))))
    val one = GeoTz.tzForPoints(Seq((1L, 5.0, 5.0)).toDF("id", "lon", "lat"),
      "id", "lon", "lat", zs = loaded).first().getString(1)
    assert(one == "Test/Zone")
  }

  test("loadZonesGeoJson: a timezone-boundary-builder-shaped " +
    "FeatureCollection (Polygon + MultiPolygon, holes, closed rings) " +
    "drives tzForPoints on real coordinates") {
    import graft.functions.GeoTz
    val zs = GeoTz.loadZonesGeoJson(spark,
      "src/test/resources/fixtures/tz_extract.geojson")
    // London = 1 outer ring (its hole is dropped), Tokyo = 3 islands,
    // Sydney = 1 → 5 rings; closing vertices removed
    assert(zs.length == 5)
    assert(zs.count(_._1 == "Asia/Tokyo") == 3)
    assert(zs.forall { case (_, xs, ys) =>
      xs.length == 4 && ys.length == 4 &&
        (xs.head, ys.head) != (xs.last, ys.last)
    })
    val cities = Seq(
      (1L, -0.13, 51.51, "Europe/London"),   // London
      (2L, 139.69, 35.69, "Asia/Tokyo"),     // Tokyo (Honshu ring)
      (3L, 141.35, 43.06, "Asia/Tokyo"),     // Sapporo (Hokkaido ring)
      (4L, 130.42, 33.59, "Asia/Tokyo"),     // Fukuoka (Kyushu ring)
      (5L, 151.21, -33.87, "Australia/Sydney"),
      (6L, -3.5, 54.2, "Europe/London"),     // inside the dropped hole
      (7L, -140.0, -20.0, "UTC-9"))          // open Pacific → nautical
    val got = GeoTz.tzForPoints(
        cities.map(c => (c._1, c._2, c._3)).toDF("id", "lon", "lat"),
        "id", "lon", "lat", zs = zs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cities.foreach { case (id, _, _, want) =>
      assert(got(id) == want, s"point $id: got ${got(id)}, want $want")
    }
  }

  test("TopKPerKey physical operator: same rows as window+filter, " +
    "plans a heap exec instead of a WindowExec, handles k > group size") {
    import graft.plans.TopKPerKey.topKPerKey
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
    val byLen = Seq(length($"text").desc, $"doc_id".asc)
    val viaWindow = docs.withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy(byLen: _*)))
      .filter($"rn" <= 3).drop("rn")
      .select($"doc_id").as[Long].collect().toSet
    val viaHeap = topKPerKey(docs, Seq($"lang"), byLen, k = 3)
    assert(viaHeap.select($"doc_id").as[Long].collect().toSet == viaWindow)
    val plan = viaHeap.queryExecution.executedPlan.toString
    // the physical node prints by its nodeName ("TopKPerKey" + the
    // keys/order/k args)
    assert(plan.contains("TopKPerKey [lang"), plan)
    assert(!plan.contains("Window"),
      "the heap operator must replace the window sort entirely")
    // k larger than every group: identity on rows
    assert(topKPerKey(docs, Seq($"lang"), byLen, k = 100000).count()
      == docs.count())
    // distribution contract: grouped keys never split across partitions
    // (child distribution requirement inserted the hash exchange)
    assert(plan.contains("hashpartitioning"), plan)
  }

  test("dense world extract: ~230 zones load from the bundled GeoJSON, " +
    "land coordinates resolve to real IANA zones, nautical only at sea") {
    import graft.functions.GeoTz
    val zs = GeoTz.denseWorldZones
    assert(zs.length >= 200, s"expected a dense extract, got ${zs.length}")
    assert(zs.forall { case (_, xs, ys) =>
      xs.length == 4 && ys.length == 4 &&
        ys.indices.forall(i => ys(i) != ys((i + 1) % 4)) // no horizontal edge
    })
    val cities = Seq(
      (1L, 2.35, 48.85, "Europe/Paris"),
      (2L, -0.13, 51.51, "Europe/London"),
      (3L, 139.69, 35.69, "Asia/Tokyo"),
      (4L, -99.13, 19.43, "America/Mexico_City"),
      (5L, 36.82, -1.29, "Africa/Nairobi"),
      (6L, 77.21, 28.64, "Asia/Kolkata"),
      (7L, -58.38, -34.60, "America/Argentina/Buenos_Aires"),
      (8L, 174.76, -36.85, "Pacific/Auckland"),
      (9L, 37.62, 55.75, "Europe/Moscow"),
      (10L, -149.5, -17.68, "Pacific/Tahiti"),
      (11L, -140.0, -20.0, "UTC-9"),   // open Pacific → nautical
      (12L, -30.0, 0.0, "UTC-2"))      // mid-Atlantic → nautical
    val got = GeoTz.tzForPoints(
        cities.map(c => (c._1, c._2, c._3)).toDF("id", "lon", "lat"),
        "id", "lon", "lat", zs = zs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cities.foreach { case (id, _, _, want) =>
      assert(got(id) == want, s"point $id: got ${got(id)}, want $want")
    }
    // the bundled file also round-trips through the Hadoop-path loader
    val viaLoader = GeoTz.loadZonesGeoJson(spark,
      "src/main/resources/graft/tz/dense_zones.geojson")
    assert(viaLoader == zs)
  }

  test("tz grid index bounds per-point candidate counts at 231 zones " +
    "(the join must never degrade toward a per-row full scan)") {
    import graft.functions.GeoTz
    val zs = GeoTz.denseWorldZones
    val cells = GeoTz.zoneCells(spark, zs)
    val perCell = cells.groupBy("__cx", "__cy")
      .agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    val maxCand = perCell.max
    val meanCand = perCell.sum.toDouble / perCell.length
    info(f"grid cells=${perCell.length} max-candidates=$maxCand " +
      f"mean=$meanCand%.2f zones=${zs.length}")
    // a point probes exactly one cell, so per-cell polygon count IS the
    // exact-test fanout per row.  Bounds chosen well above the measured
    // dense-extract values (max 22, mean 4.13): a denser future extract
    // that pushes a cell past 35 candidates (15% of the zone table)
    // should fail here and prompt a finer grid, not silently run
    // 231 ray-casts per point
    assert(maxCand <= 35,
      s"hottest grid cell carries $maxCand polygon candidates")
    assert(meanCand <= 8.0, f"mean candidate fanout $meanCand%.2f too high")
    // and the index actually prunes: total candidate volume across the
    // grid stays far below cells x zones
    assert(meanCand * 3 < zs.length)
  }

  test("x18 packing and x17 IVF plans: every window is partitioned " +
    "(no global sort funnels)") {
    val packs = graft.ext.CorpusStats.packAssignments(
      Tables.documents(spark, sf0001), "doc_id", "lang", "text", 2048, 8)
    val pw = packs.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(pw.isEmpty, "packing windows must partition by (stream, shard)")
    val e = Tables.embeddings(spark, sf0001)
    val ivf = graft.ext.Similarity.ivfTopK(
      e.filter(col("vec_id") < 8), e.filter(col("vec_id") >= 8), 10)
    val iw = ivf.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(iw.isEmpty,
      "IVF centroid selection must be TakeOrdered, not a global window")
  }

  test("PushNanosEquivFilter restores range pushdown on nano timestamps") {
    // The driver's events files now ship µs timestamps, so the
    // nanos-as-long generation this rule exists for is built as a
    // fixture: a long `ts` in nanoseconds with sub-µs values straddling
    // both bounds, exercising the micros(ns) ∈ [lo,hi] ⟺
    // ns ∈ [lo·1000, hi·1000+999] identity row by row.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanofix")
      .toString
    def ns(s: String) =
      java.time.Instant.parse(s).getEpochSecond * 1000000000L
    val lo = ns("2024-01-03T00:00:00Z")
    val hi = ns("2024-01-25T00:00:00Z")
    Seq(
      (1L, lo - 1),        // last ns of the prior µs: excluded
      (2L, lo),            // exact lower bound
      (3L, lo + 999),      // sub-µs jitter above the bound
      (4L, (lo + hi) / 2), // interior
      (5L, hi),            // exact upper bound
      (6L, hi + 999),      // floors to the bound µs: included
      (7L, hi + 1000))     // first ns of the next µs: excluded
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = Tables.events(spark, dir)
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
    assert(q.collect().map(_.getLong(0)).sorted
      .sameElements(Array(2L, 3L, 4L, 5L, 6L)))
  }

  test("µs-timestamp events generation reads natively with pushed " +
    "range bounds") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "events.ts must surface as TIMESTAMP regardless of generation")
    val q = ev
      .filter(col("ts").between(lit("2024-01-03 00:00:00"),
                                lit("2024-01-25 00:00:00")))
      .select(col("event_id"))
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThanOrEqual(ts,"),
      s"range bounds must push through the NTZ→LTZ cast: $pushed")
    // semantics check against the raw NTZ read (UTC session zone)
    val expected = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("ts").between(lit("2024-01-03 00:00:00"),
                                lit("2024-01-25 00:00:00")))
      .count()
    assert(q.count() == expected && expected > 0)
  }
}
