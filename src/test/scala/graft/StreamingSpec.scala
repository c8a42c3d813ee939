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

  test("streaming windowed HLL distinct estimate equals the batch " +
    "answer (sketch buffers live in streaming state)") {
    import graft.plans.HllAgg
    val schema = spark.read.parquet(stagedDir).schema
    val stream = Streams.fileStream(spark, stagedDir, schema)
      .groupBy(window($"ts", "6 hours").as("w"))
      .agg(round(HllAgg.hllAgg($"user_id"), 4).as("est_users"))
    Streams.runToMemory(spark, stream, "hllwin", outputMode = "complete")
    val streamed = spark.table("hllwin")
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss"), $"est_users")
      .as[(String, Double)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy(window($"ts", "6 hours").as("w"))
      .agg(round(HllAgg.hllAgg($"user_id"), 4).as("est_users"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss"), $"est_users")
      .as[(String, Double)].collect().toSet
    // the sketch is order- and batching-insensitive (max-merge), so the
    // streaming estimates are BIT-identical to batch, not merely close
    assert(streamed == batch)
  }

  test("streaming windowed CMS heavy hitters equal the batch answer " +
    "(broadcast sketch probe + candidate-sized windowed state)") {
    val batchEvents = Tables.events(spark, sf0001)
    // sketch built once from accepted history (the st5 gate pattern)
    val cms = graft.streaming.Streams.windowedHeavyHitters(
        batchEvents, "ts", "user_id", "1 day", minFreq = 3L,
        buildOnly = true)
      .head.getAs[Array[Byte]]("cms")
    val schema = spark.read.parquet(stagedDir).schema
    val stream = graft.streaming.Streams.windowedHeavyHitters(
      Streams.fileStream(spark, stagedDir, schema),
      "ts", "user_id", "1 day", minFreq = 3L, probeSketch = Some(cms))
    Streams.runToMemory(spark, stream, "cmswin", outputMode = "complete")
    val streamed = spark.table("cmswin")
      .select(date_format($"w", "yyyy-MM-dd HH:mm:ss"), $"k", $"n")
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.streaming.Streams.windowedHeavyHitters(
        batchEvents, "ts", "user_id", "1 day", minFreq = 3L)
      .select(date_format($"w", "yyyy-MM-dd HH:mm:ss"), $"k", $"n")
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must produce at least one heavy hitter")
  }

  test("streaming rate anomalies equal the batch answer (history stats " +
    "broadcast, stateless z-score past the windowed count)") {
    import graft.ext.Anomaly
    val ev = Tables.events(spark, sf0001)
    val batch = Anomaly.keyRateAnomalies(ev, "ts", "user_id", "1 day", 1.5)
      .select(date_format($"w", "yyyy-MM-dd HH:mm:ss"), $"k", $"n", $"z")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    // stats table persisted from history (the st5/st8 gate pattern);
    // the stream re-counts windows and z-scores each as it closes
    val stats = Anomaly.keyStats(
      Anomaly.windowCounts(ev, "ts", "user_id", "1 day")).localCheckpoint()
    val schema = spark.read.parquet(stagedDir).schema
    val stream = Anomaly.zScores(
      Anomaly.windowCounts(
        Streams.fileStream(spark, stagedDir, schema), "ts", "user_id",
        "1 day"),
      stats, minZ = 1.5)
    Streams.runToMemory(spark, stream, "ratewin", outputMode = "complete")
    val streamed = spark.table("ratewin")
      .select(date_format($"w", "yyyy-MM-dd HH:mm:ss"), $"k", $"n", $"z")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("windowed heavy hitters are sketch-independent: a tiny sketch " +
    "(all-collisions) still returns the exact answer") {
    val ev = Tables.events(spark, sf0001)
    val wide = graft.streaming.Streams.windowedHeavyHitters(
        ev, "ts", "user_id", "1 day", minFreq = 3L)
      .select($"w", $"k", $"n").as[(java.sql.Timestamp, Long, Long)]
      .collect().toSet
    val tiny = graft.streaming.Streams.windowedHeavyHitters(
        ev, "ts", "user_id", "1 day", minFreq = 3L, depth = 1, width = 16)
      .select($"w", $"k", $"n").as[(java.sql.Timestamp, Long, Long)]
      .collect().toSet
    assert(tiny == wide)
  }

  test("streaming exact dedup: fingerprint state drops re-ingested docs " +
    "across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd_").toString
    val docs = Tables.documents(spark, sf0001).limit(30)
      .select($"doc_id", $"text")
    docs.write.mode("overwrite").parquet(dir)
    // second delivery: same texts under new ids (re-crawl duplicates)
    docs.withColumn("doc_id", $"doc_id" + 100000)
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = graft.streaming.Streams.fileStream(spark, dir, schema)
      .withColumn("fp", graft.ext.TextAnalysis.fingerprint($"text"))
      .dropDuplicates("fp")
    graft.streaming.Streams.runToMemory(spark, stream, "sdedup")
    val expected = docs
      .select(graft.ext.TextAnalysis.fingerprint($"text")).distinct().count()
    assert(spark.table("sdedup").count() == expected)
  }

  test("streaming ingest near-dup gate equals the batch answer " +
    "(stream-static LSH under foreachBatch)") {
    val docs = Tables.documents(spark, sf0001)
    val existing = docs.filter($"doc_id" % 7 =!= 0)
    val incoming = docs.filter($"doc_id" % 7 === 0)
    val batchAnswer = graft.ext.Dedup
      .lshMatchAgainst(existing, incoming, "doc_id", "text",
        n = 1, k = 8, bandRows = 2, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(batchAnswer.nonEmpty)
    // deliver the incoming docs in two files → two-ish micro-batches;
    // the static existing side is indexed per batch by the same call
    val dir = java.nio.file.Files.createTempDirectory("graft_ing_").toString
    incoming.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    incoming.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val flagged = scala.collection.mutable.Set[(Long, Long, Double)]()
    // index the static side ONCE; every micro-batch joins it
    val index = graft.ext.Dedup.lshIndex(existing, "doc_id", "text",
      n = 1, k = 8, bandRows = 2)
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= graft.ext.Dedup
          .lshMatchIndexed(index, df, "doc_id", "text", threshold = 0.8)
          .as[(Long, Long, Double)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(flagged.toSet == batchAnswer,
      "per-micro-batch gating must equal the all-at-once batch answer")
  }

  test("streaming media ingest gate equals the batch answer " +
    "(dHash fingerprint index built once, probed per micro-batch)") {
    import graft.ext.Multimodal
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val incoming = docs.filter($"doc_id" % 35 === 1)
      .withColumn("text", concat(upper(substring($"text", 1, 1)),
        expr("substring(text, 2)")))
      .withColumn("doc_id", $"doc_id" + 30000000L)
    val batchAnswer = Multimodal.matchAgainst(spark,
        Multimodal.mediaFromDocuments(docs),
        Multimodal.mediaFromDocuments(incoming), maxDist = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_mig_").toString
    incoming.filter($"doc_id" % 2 === 0).write.mode("append").parquet(dir)
    incoming.filter($"doc_id" % 2 =!= 0).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val flagged = scala.collection.mutable.Set[(Long, Long, Int)]()
    val index = Multimodal.fpIndex(spark,
      Multimodal.mediaFromDocuments(docs))
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= Multimodal
          .matchIndexed(index, spark, Multimodal.mediaFromDocuments(df),
            maxDist = 4)
          .as[(Long, Long, Int)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(flagged.toSet == batchAnswer,
      "per-micro-batch media gating must equal the batch answer")
  }

  test("streaming embedding ingest gate equals the batch answer " +
    "(IVF index built once, probed per micro-batch)") {
    import graft.ext.Similarity
    val e = Tables.embeddings(spark, sf0001)
    val incoming = e.filter($"vec_id" % 9 === 2)
      .withColumn("embedding", transform($"embedding", x => x * lit(2.0f)))
      .withColumn("vec_id", $"vec_id" + 40000000L)
    val index = Similarity.ivfIndex(e, dim = 64, nlist = 16)
    val batchAnswer = Similarity
      .ivfGate(index, incoming, threshold = 0.9, nprobe = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_eig_").toString
    incoming.filter($"vec_id" % 2 === 0).write.mode("append").parquet(dir)
    incoming.filter($"vec_id" % 2 =!= 0).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val flagged = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= Similarity.ivfGate(index, df, threshold = 0.9,
          nprobe = 4).as[(Long, Long, Double)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(flagged.toSet == batchAnswer,
      "per-micro-batch embedding gating must equal the batch answer")
  }

  test("streaming Bloom decontamination gate equals the batch answer " +
    "(filter built once, probed per micro-batch)") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val train = docs.filter($"doc_id" % 97 =!= 0)
    val batchAnswer = graft.ext.Dedup
      .contaminatedDocs(train, bench, "doc_id", "text", n = 5)
      .as[Long].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    train.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    train.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // the gate (bloom bytes + pinned bench shingles) builds ONCE
    val gate = graft.ext.Dedup.bloomGate(bench, "doc_id", "text", n = 5)
    val flagged = scala.collection.mutable.Set[Long]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= graft.ext.Dedup
          .contaminatedInBatch(gate, df, "doc_id", "text")
          .as[Long].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(flagged.toSet == batchAnswer,
      "per-micro-batch Bloom gating must equal the all-at-once answer")
  }

  test("streaming DSIR gate equals the batch answer " +
    "(model trained once, micro-batches scored against the pinned table)") {
    import graft.ext.QualityModel
    val docs = Tables.documents(spark, sf0001)
    // threshold -2.0: the synthetic corpus shares one vocabulary, so
    // weights sit near -2.5 — the cut keeps a nonempty top slice
    val batchAnswer = QualityModel
      .dsirWeights(docs, docs.filter($"lang" === "en"), "doc_id", "text")
      .filter($"weight" > -2.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_").toString
    docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    docs.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // the model trains ONCE from the reference corpora and is pinned
    val model = QualityModel
      .dsirModel(docs, docs.filter($"lang" === "en"), "text")
      .localCheckpoint()
    val kept = scala.collection.mutable.Set[Long]()
    val q2 = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= QualityModel.dsirScoreWith(model, df, "doc_id", "text")
          .filter($"weight" > -2.0).select($"doc_id").as[Long].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(kept.toSet == batchAnswer,
      "per-micro-batch DSIR gating must equal the all-at-once answer")
    // persistence: the saved model scores identically across restarts
    spark.sql("DROP TABLE IF EXISTS dsir_model_t")
    QualityModel.saveDsirModel(model, "dsir_model_t", dim = 1024)
    val (loaded, dim) = QualityModel.loadDsirModel(spark, "dsir_model_t")
    assert(dim == 1024)
    val reloadedKept = QualityModel
      .dsirScoreWith(loaded, docs, "doc_id", "text", dim)
      .filter($"weight" > -2.0).select($"doc_id").as[Long].collect().toSet
    assert(reloadedKept == batchAnswer)
    spark.sql("DROP TABLE IF EXISTS dsir_model_t")
  }

  test("streaming trained-quality gate equals the batch answer, and " +
    "the persisted model gates identically after a restart") {
    import graft.ext.QualityModel
    val docs = Tables.documents(spark, sf0001)
    val model = QualityModel.trainQualityModel(docs, "doc_id", "text",
      $"lang" === "en", dim = 64, iters = 4).localCheckpoint()
    // centered cut: above the corpus-mean score (class imbalance moves
    // raw mean-weight scores off zero on the shared-vocab corpus)
    val tau = QualityModel.corpusMeanScore(docs, "text", model, 64)
    val batchAnswer = QualityModel
      .scoreWith(docs, "doc_id", "text", model, dim = 64, threshold = tau)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_qm_").toString
    docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    docs.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val kept = scala.collection.mutable.Set[Long]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= QualityModel.scoreWith(df, "doc_id", "text", model, 64,
            threshold = tau)
          .filter($"keep").select($"doc_id").as[Long].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(kept.toSet == batchAnswer,
      "per-micro-batch trained-QM gating must equal the all-at-once answer")
    // restart: the persisted model gates identically
    spark.sql("DROP TABLE IF EXISTS qm_gate_t")
    QualityModel.saveQualityModel(model, "qm_gate_t", dim = 64)
    val (loaded, dim) = QualityModel.loadQualityModel(spark, "qm_gate_t")
    val reloadedKept = QualityModel
      .scoreWith(docs, "doc_id", "text", loaded, dim, threshold = tau)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(reloadedKept == batchAnswer)
    spark.sql("DROP TABLE IF EXISTS qm_gate_t")
  }

  test("streaming winnow gate equals batch; extension flags re-uploads " +
    "of accepted batches; save/load keeps the gate") {
    import graft.ext.Dedup
    val docs = Tables.documents(spark, sf0001)
    val existing = docs.filter($"doc_id" % 7 =!= 0)
    val incoming = docs.filter($"doc_id" % 7 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"in_id", $"ex_id").as[(Long, Long)].collect().toSet
    val batchAnswer = pairs(Dedup.winnowMatchAgainst(existing, incoming,
      "doc_id", "text", minShared = 1))
    assert(batchAnswer.nonEmpty)
    // per-micro-batch probe over the pinned index ≡ all-at-once
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_").toString
    incoming.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    incoming.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val ix0 = Dedup.winnowIndex(existing, "doc_id", "text")
    val flagged = scala.collection.mutable.Set[(Long, Long)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        flagged ++= pairs(Dedup.winnowMatchIndexed(ix0, df,
          "doc_id", "text", minShared = 1))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(flagged.toSet == batchAnswer)
    // a novel accepted doc folds in; its verbatim re-upload is flagged
    val novel = Seq((1000L, (1 to 20).map(i => s"nv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val reup = novel.withColumn("doc_id", lit(2000L))
    assert(pairs(Dedup.winnowMatchIndexed(ix0, reup,
      "doc_id", "text", minShared = 1)).isEmpty)
    val ix1 = Dedup.extendWinnowIndex(ix0, novel, "doc_id", "text")
    assert(pairs(Dedup.winnowMatchIndexed(ix1, reup,
      "doc_id", "text", minShared = 1)) == Set((2000L, 1000L)))
    // bucketed persistence round-trips the extended gate
    spark.sql("DROP TABLE IF EXISTS winnow_ix_t")
    Dedup.saveWinnowIndex(ix1, "winnow_ix_t")
    val loaded = Dedup.loadWinnowIndex(spark, "winnow_ix_t")
    assert((loaded.k, loaded.w, loaded.dfCap) == ((4, 4, 100)))
    assert(pairs(Dedup.winnowMatchIndexed(loaded, reup,
      "doc_id", "text", minShared = 1)) == Set((2000L, 1000L)))
    spark.sql("DROP TABLE IF EXISTS winnow_ix_t")
  }

  test("streaming session windows equal the batch answer " +
    "(watermarked session_window over a file stream)") {
    // append mode emits only watermark-CLOSED sessions, so a far-future
    // sentinel event (own user, second file → second micro-batch)
    // pushes the final watermark past every real session
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_").toString
    val events = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
    events.write.mode("append").parquet(dir)
    Seq((-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val sessions = stream
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("s"))
    Streams.runToMemory(spark, sessions, "sess", outputMode = "append")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .filter($"user_id" >= 0)
      .select($"user_id", date_format($"w.start", "yyyy-MM-dd HH:mm:ss"),
        date_format($"w.end", "yyyy-MM-dd HH:mm:ss"), $"n", $"s")
      .as[(Long, String, String, Long, Double)].collect().toSet
    val streamedCols = spark.table("sess").columns
    val streamed = shape(
      if (streamedCols.contains("w")) spark.table("sess")
      else spark.table("sess").withColumnRenamed("session_window", "w"))
    val batch = shape(events
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("s")))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("session windows: an event at EXACTLY the gap extends the " +
    "session; one past it starts a new one; end = last event + gap") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:10:00"), 2.0),
      (1L, ts("2024-01-01 00:40:00"), 3.0), // = prior end → EXTENDS
      (1L, ts("2024-01-01 01:10:01"), 5.0), // 1 s past the gap → new
      (2L, ts("2024-01-01 05:00:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val got = events
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .select($"user_id", $"w.start".cast("string").as("b"),
        $"w.end".cast("string").as("e"), $"n", $"s")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00", "2024-01-01 01:10:00", 3L, 6.0),
      (1L, "2024-01-01 01:10:01", "2024-01-01 01:40:01", 1L, 5.0),
      (2L, "2024-01-01 05:00:00", "2024-01-01 05:30:00", 1L, 4.0)))
  }

  test("full curation ingest loop under foreachBatch: quality gate + " +
    "growing near-dup index, accepted set equals sequential replay") {
    import graft.ext.{Dedup, TextAnalysis}
    // corpus seed + three staged batches: b1 novel (accepted), b2 a
    // near-dup of b1 (rejected ONLY if the index grew), b3 low-quality
    // (rejected by the quality gate before the index is even consulted)
    val seed = Seq((1L, "alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa the a of is")).toDF("doc_id", "text")
    val b1 = Seq((10L, "lambda mu nu xi omicron pi rho sigma tau " +
      "upsilon the a of is"))
    val b2 = Seq((20L, "lambda mu nu xi omicron pi rho sigma tau " +
      "upsilon the a of is phi"))
    val b3 = Seq((30L, "tiny"))
    val dir = java.nio.file.Files.createTempDirectory("graft_loop_").toString
    for ((batch, i) <- Seq(b1, b2, b3).zipWithIndex)
      batch.toDF("doc_id", "text").coalesce(1).write.mode("append")
        .parquet(s"$dir/b$i")
    def qualityOkDf(df: org.apache.spark.sql.DataFrame) =
      df.filter(TextAnalysis.qualityOk(
        TextAnalysis.tokens(col("text")), minTokens = 5,
        maxTokens = 1000, minStopRatio = 0.01))
    // sequential replay (the expected semantics)
    var ixSeq = Dedup.lshIndex(seed, "doc_id", "text", n = 1, k = 8,
      bandRows = 2)
    val acceptedSeq = scala.collection.mutable.Set[Long]()
    for (i <- 0 until 3) {
      val batch = spark.read.parquet(s"$dir/b$i")
      val q = qualityOkDf(batch)
      val dups = Dedup.lshMatchIndexed(ixSeq, q, "doc_id", "text", 0.8)
        .select($"doc_id").as[Long].collect().toSet
      val ok = q.filter(!$"doc_id".isin(dups.toSeq: _*))
      acceptedSeq ++= ok.select($"doc_id").as[Long].collect()
      ixSeq = Dedup.extendLshIndex(ixSeq, ok, "doc_id", "text")
    }
    assert(acceptedSeq.toSet == Set(10L), // b2 near-dups b1; b3 low-quality
      s"sequential replay accepted $acceptedSeq")
    // the same loop as a Structured Streaming foreachBatch job
    val schema = spark.read.parquet(s"$dir/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    var ix = Dedup.lshIndex(seed, "doc_id", "text", n = 1, k = 8,
      bandRows = 2)
    val accepted = scala.collection.mutable.Set[Long]()
    val qr = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val q = qualityOkDf(df)
        val dups = Dedup.lshMatchIndexed(ix, q, "doc_id", "text", 0.8)
          .select(col("doc_id")).as[Long].collect().toSet
        val ok = q.filter(!col("doc_id").isin(dups.toSeq: _*))
        accepted ++= ok.select(col("doc_id")).as[Long].collect()
        ix = Dedup.extendLshIndex(ix, ok, "doc_id", "text")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    qr.awaitTermination()
    // micro-batch ORDER is not contractual for a file source, so the
    // invariant is: exactly one of the near-dup pair survives (whoever
    // arrived first), and the low-quality doc never does
    assert(accepted.toSet == Set(10L) || accepted.toSet == Set(20L),
      s"streaming loop accepted $accepted")
  }

  test("privacy + model-quality gates compose in the streaming ingest " +
    "loop: scrub-then-score equals the batch answer") {
    import graft.ext.{Pii, QualityModel}
    val base = Tables.documents(spark, sf0001)
    // stream-static: the LM trains once on the full corpus and is pinned
    val model = QualityModel.bigramModel(base, "text").localCheckpoint()
    // inject PII into some docs so the scrub genuinely rewrites text —
    // the <EMAIL>/<IP> placeholder tokens are unseen by the model, so
    // the cross-corpus floor is exercised in-stream too
    val sample = base.limit(60).withColumn("text",
      when($"doc_id" % 7 === 0,
        concat($"text", lit(" mail u@x.org from 10.0.0.1")))
        .otherwise($"text"))
      .select($"doc_id", $"text").repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    sample.write.mode("overwrite").parquet(dir)
    def stage(df: org.apache.spark.sql.DataFrame) = {
      val scrubbed = Pii.piiByDoc(df, "doc_id", "text")
        .select($"doc_id", $"has_pii", $"text_redacted".as("text"))
      QualityModel.lmScoreWith(scrubbed, "doc_id", "text", model)
        .join(scrubbed.select($"doc_id", $"has_pii"), "doc_id")
    }
    def toSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val expected = toSet(stage(spark.read.parquet(dir)).collect())
    assert(expected.nonEmpty && expected.exists(_._4),
      "injection must produce PII hits")
    val got = scala.collection.mutable.Set[(Long, Long, Double, Boolean)]()
    val q = spark.readStream.schema(sample.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= toSet(stage(df).collect()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.toSet == expected)
  }

  test("incremental ingest: extending the index with accepted batches " +
    "catches near-dups of PRIOR batches, not just the original corpus") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    // batch 1: doc 10 is novel (accepted); batch 2: doc 20 near-dups
    // doc 10 — only an EXTENDED index can flag it
    val batch1 = Seq((10L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch2 = Seq((20L, "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val ix0 = graft.ext.Dedup.lshIndex(corpus, "doc_id", "text",
      n = 1, k = 8, bandRows = 2)
    val hits1 = graft.ext.Dedup
      .lshMatchIndexed(ix0, batch1, "doc_id", "text", threshold = 0.8)
    assert(hits1.count() == 0) // batch 1 accepted wholesale
    val ix1 = graft.ext.Dedup.extendLshIndex(ix0, batch1, "doc_id", "text")
    // static index misses the cross-batch dup; extended index flags it
    val staticHits = graft.ext.Dedup
      .lshMatchIndexed(ix0, batch2, "doc_id", "text", threshold = 0.8)
    assert(staticHits.count() == 0)
    val hits2 = graft.ext.Dedup
      .lshMatchIndexed(ix1, batch2, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(hits2.map(h => (h._1, h._2)).toSeq == Seq((20L, 10L)))
    assert(hits2.head._3 >= 0.8)
  }

  test("bucketed LSH index: save/load round-trips parameters and " +
    "matches, and the corpus side joins WITHOUT a shuffle") {
    val docs = Tables.documents(spark, sf0001)
    val existing = docs.filter($"doc_id" % 7 =!= 0)
    val incoming = docs.filter($"doc_id" % 7 === 0)
    val mem = graft.ext.Dedup.lshIndex(existing, "doc_id", "text",
      n = 1, k = 8, bandRows = 2)
    Seq("g_ix_bands", "g_ix_enc").foreach(dropTableFully)
    graft.ext.Dedup.saveLshIndex(mem, "g_ix_bands", "g_ix_enc", buckets = 4)
    val loaded = graft.ext.Dedup.loadLshIndex(spark, "g_ix_bands", "g_ix_enc")
    assert((loaded.n, loaded.k, loaded.bandRows) == (1, 8, 2))
    def answer(ix: graft.ext.Dedup.LshIndex) = graft.ext.Dedup
      .lshMatchIndexed(ix, incoming, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(answer(loaded) == answer(mem))
    // the bucketed scan supplies the band_key hash partitioning: the
    // corpus-sized side of the candidate join never shuffles — only
    // batch-derived sides do.  AQE off so exchanges are literal.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = loaded.bands.groupBy($"band_key")
        .count().queryExecution.executedPlan
      assert(probe.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "bucketed band table must pre-partition by band_key")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("index loaders refuse non-index tables with a clear message") {
    dropTableFully("g_plain")
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").saveAsTable("g_plain")
    val e = intercept[RuntimeException] {
      graft.ext.Dedup.loadLshIndex(spark, "g_plain", "g_plain")
    }
    assert(e.getMessage.contains("not a graft LSH index"))
    val e2 = intercept[RuntimeException] {
      graft.ext.Similarity.loadIvfIndex(spark, "g_plain", "g_plain")
    }
    assert(e2.getMessage.contains("not a graft IVF index"))
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

class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful diff-upsert emits only changed stations across batches") {
    val in = java.nio.file.Files.createTempDirectory("graft_st_in_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_st_ck_").toString

    val emitted = scala.collection.mutable.Set[(String, String)]()
    def runBatch(): Set[(String, String)] = {
      val schema = spark.read.parquet(in).schema
      val stream = graft.streaming.Streams.fileStream(spark, in, schema)
      val out = graft.streaming.Streams.diffUpsertStream(spark, stream)
      val q = out.writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= df.as[(String, String)].collect(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      emitted.toSet
    }

    // batch 1: two stations
    Seq(("st1", "siteA v1"), ("st2", "siteB v1")).toDF("key", "content")
      .write.mode("append").parquet(in)
    assert(runBatch() == Set(("st1", "siteA v1"), ("st2", "siteB v1")))

    // batch 2: st1 unchanged, st2 changed, st3 new → only st2+st3 emitted
    Seq(("st1", "siteA v1"), ("st2", "siteB v2"), ("st3", "siteC v1"))
      .toDF("key", "content").write.mode("append").parquet(in)
    val second = runBatch()
    assert(second == Set(("st1", "siteA v1"), ("st2", "siteB v1"),
      ("st2", "siteB v2"), ("st3", "siteC v1")))
  }

  test("diff-upsert state survives a query restart under the RocksDB " +
    "state store provider") {
    val in = java.nio.file.Files.createTempDirectory("graft_rdb_in_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rdb_ck_").toString
    // The production config for large key spaces: incremental,
    // disk-backed state (SURVEY §2.9).  The provider class is read per
    // query start, so setting it here scopes it to these two runs.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      // each run returns ONLY its own emissions, so the second run
      // proves the first run's hash state was restored from RocksDB
      def runBatch(): Set[(String, String)] = {
        val emitted = scala.collection.mutable.Set[(String, String)]()
        val schema = spark.read.parquet(in).schema
        val stream = graft.streaming.Streams.fileStream(spark, in, schema)
        val out = graft.streaming.Streams.diffUpsertStream(spark, stream)
        val q = out.writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            emitted ++= df.as[(String, String)].collect(); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        emitted.toSet
      }
      Seq(("st1", "siteA v1"), ("st2", "siteB v1")).toDF("key", "content")
        .write.mode("append").parquet(in)
      assert(runBatch() == Set(("st1", "siteA v1"), ("st2", "siteB v1")))
      // restart: st1 re-delivered unchanged, st2 changed, st3 new —
      // unchanged st1 must be suppressed by RESTORED state, not re-emitted
      Seq(("st1", "siteA v1"), ("st2", "siteB v2"), ("st3", "siteC v1"))
        .toDF("key", "content").write.mode("append").parquet(in)
      assert(runBatch() == Set(("st2", "siteB v2"), ("st3", "siteC v1")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("diff-upsert with a sequence column keeps the LATEST write, " +
    "not the lexicographic max") {
    val in = java.nio.file.Files.createTempDirectory("graft_seq_in_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seq_ck_").toString
    // one batch, two updates for the same key; the newer content sorts
    // lexicographically FIRST, so content-max would pick the older one
    Seq(("st1", "z-old-content", 1L), ("st1", "a-new-content", 2L))
      .toDF("key", "content", "seq").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = graft.streaming.Streams.fileStream(spark, in, schema)
    val out = graft.streaming.Streams.diffUpsertStream(spark, stream,
      seqCol = Some("seq"))
    val emitted = scala.collection.mutable.Set[(String, String)]()
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted ++= df.as[(String, String)].collect(); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(emitted.toSet == Set(("st1", "a-new-content")))
  }
}

class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes partitions on read (SURVEY §4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.events(spark, sf0001)
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    // partition filter present and only one partition directory selected
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(q.count() > 0)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("orders_b", "customer_b").foreach(dropTableFully)
      Tables.orders(spark, sf0001)
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sf0001)
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        "bucketed join should not shuffle either side")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
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

  test("streaming cluster-route gate equals the batch answer " +
    "(k-means codebook trained once, routed per micro-batch)") {
    import graft.ext.Clustering
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val incoming = e.filter($"vec_id" % 9 === 2)
      .withColumn("embedding", transform($"embedding", x => x * lit(2.0f)))
      .withColumn("vec_id", $"vec_id" + 40000000L)
    val cent = Clustering.kmeansCentroids(e, k = 8, dim = 64, iters = 2)
    val batchAnswer = Clustering.kmeansAssign(incoming, cent)
      .as[(Long, Long, Double)].collect().toSet
    assert(batchAnswer.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmr_").toString
    incoming.filter($"vec_id" % 2 === 0).write.mode("append").parquet(dir)
    incoming.filter($"vec_id" % 2 =!= 0).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val routed = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        routed ++= Clustering.kmeansAssign(df, cent)
          .as[(Long, Long, Double)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(routed.toSet == batchAnswer,
      "per-micro-batch routing must equal the batch answer")
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without query: $dangling")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
