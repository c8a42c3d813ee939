package graft

import graft.ext.Warc
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container walk: writer/parser round trip through
  * both layouts, the Spark records stage, and the hostile-bytes
  * posture (truncation monotonicity, bit flips, gzip-bomb budget). */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def mkRecs(n: Int): Seq[(String, String, String, Array[Byte])] =
    (0 until n).map { j =>
      (Seq("response", "request", "metadata")(j % 3),
        s"http://h.example.com/p/$j", s"2026-08-0${1 + j % 8}T00:00:00Z",
        ascii(s"payload-$j-" + "y" * (j * 7 % 40)))
    }

  test("round trip: plain and gzip (member-per-record) layouts both " +
    "invert the writer exactly — types, URIs, dates, payload bytes") {
    for (gzip <- Seq(false, true); n <- Seq(1, 3, 7)) {
      val recs = mkRecs(n)
      val file = Warc.syntheticWarc(recs, gzip = gzip)
      if (gzip) assert((file(0) & 0xff) == 0x1f && (file(1) & 0xff) == 0x8b)
      val parsed = Warc.parseFile(file, Warc.defaultMaxInflated)
      assert(parsed.size === n, s"gzip=$gzip n=$n")
      parsed.zip(recs).foreach { case (p, (t, u, d, pay)) =>
        assert(p.warcType === t)
        assert(p.targetUri === u)
        assert(p.date === d)
        assert(p.payload.sameElements(pay))
      }
    }
  }

  test("Spark records stage: one row per record, exact metadata, " +
    "payload intact through the DataFrame") {
    val files = Seq(
      (1L, Warc.syntheticWarc(mkRecs(3), gzip = false)),
      (2L, Warc.syntheticWarc(mkRecs(2), gzip = true)),
      (3L, "not a warc at all".getBytes("US-ASCII")) // zero rows
    ).toDF("file_id", "payload")
    val out = Warc.records(spark, files, "file_id", "payload")
      .orderBy(col("file_id"), col("rec_index"))
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L, 2L, 2L))
    val r0 = out(0)
    assert(r0.getInt(1) === 0 && r0.getString(2) === "response")
    assert(r0.getString(3) === "http://h.example.com/p/0")
    assert(r0.getLong(6) === r0.getAs[Array[Byte]](7).length.toLong)
    assert(new String(out(4).getAs[Array[Byte]](7), "US-ASCII")
      .startsWith("payload-1-"))
  }

  test("hostility: truncation keeps a monotone well-formed prefix, " +
    "bit flips degrade (never throw), the inflate budget stops a " +
    "gzip bomb before it allocates") {
    val plain = Warc.syntheticWarc(mkRecs(5), gzip = false)
    var last = 0
    (1 to 40).foreach { i =>
      val cut = plain.take(math.max(1, plain.length * i / 40))
      val n = Warc.parseFile(cut, Warc.defaultMaxInflated).size
      assert(n >= last && n <= 5, s"cut $i: $n after $last")
      last = n
    }
    assert(last === 5)
    val gz = Warc.syntheticWarc(mkRecs(4), gzip = true)
    val rng = new scala.util.Random(3)
    (0 until 60).foreach { _ =>
      val p = (if (rng.nextBoolean()) plain else gz).clone()
      val at = rng.nextInt(p.length)
      p(at) = (p(at) ^ (1 << rng.nextInt(8))).toByte
      Warc.parseFile(p, Warc.defaultMaxInflated) // must not throw
      ()
    }
    // gzip bomb: highly compressible giant member vs a small budget
    val bomb = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      val chunk = new Array[Byte](64 * 1024)
      (0 until 64).foreach(_ => g.write(chunk)) // 4 MB of zeros
      g.close()
      out.toByteArray
    }
    val before = Warc.oversizeRejected.get()
    assert(Warc.parseFile(bomb, budget = 256 * 1024).isEmpty)
    assert(Warc.oversizeRejected.get() > before)
  }

  test("streaming WARC frontier gate: micro-batched file delivery " +
    "through foreachBatch equals the one-shot batch answer, and " +
    "accepted batches extend the frontier index") {
    import graft.ext.{Warc, Web}
    def warcFile(id: Long): (Long, Array[Byte]) = {
      // %12 ids (all incoming, since incoming = %4) get a UNIQUE path
      // → guaranteed novel; the rest share a (mod 6, mod 9) lattice
      // the existing set fully covers → guaranteed seen
      val path = if (id % 12 == 0) s"u$id" else s"${id % 9}"
      val recs = Seq(("response",
        s"http://h${id % 6}.example.com/p/$path", "2026-08-01T00:00:00Z",
        ascii(s"body $id")))
      (id, Warc.syntheticWarc(recs, gzip = id % 2 == 0))
    }
    val all = (0L until 60L).map(warcFile)
    val toDocs = (df: org.apache.spark.sql.DataFrame) =>
      Warc.records(spark, df, "file_id", "payload")
        .filter(col("warc_type") === "response")
        .select(col("file_id").as("doc_id"), col("target_uri").as("url"))
    val existing = all.filter(_._1 % 4 != 0).toDF("file_id", "payload")
    val incoming = all.filter(_._1 % 4 == 0).toDF("file_id", "payload")
    val index = Web.urlIndex(toDocs(existing), "url")
    val batchAnswer = Web.urlNoveltyGate(index, toDocs(incoming),
        "doc_id", "url")
      .as[(Long, String, Boolean)].collect().toSet
    assert(batchAnswer.exists(_._3) && batchAnswer.exists(!_._3),
      "fixture must exercise both novel and seen verdicts")
    // micro-batched delivery: two parquet files, one per trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_").toString
    incoming.filter(col("file_id") % 8 === 0)
      .write.mode("append").parquet(dir)
    incoming.filter(col("file_id") % 8 =!= 0)
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val seen = scala.collection.mutable.Set[(Long, String, Boolean)]()
    var ix = index
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = toDocs(df).localCheckpoint()
        seen ++= Web.urlNoveltyGate(ix, docs, "doc_id", "url")
          .as[(Long, String, Boolean)].collect()
        ix = Web.extendUrlIndex(ix, docs, "url") // frontier grows
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // NOTE: verdicts computed against the index AS OF each batch; the
    // one-shot equality below holds because batches never collide on a
    // canonical URL the other batch introduces (file_id%8 split keeps
    // host/path lattices disjoint across the two batches? no — it does
    // not, so compare against the sequential reference instead)
    var ixRef = index
    val refSeen = scala.collection.mutable.Set[(Long, String, Boolean)]()
    Seq(incoming.filter(col("file_id") % 8 === 0),
      incoming.filter(col("file_id") % 8 =!= 0)).foreach { b =>
      val docs = toDocs(b).localCheckpoint()
      refSeen ++= Web.urlNoveltyGate(ixRef, docs, "doc_id", "url")
        .as[(Long, String, Boolean)].collect()
      ixRef = Web.extendUrlIndex(ixRef, docs, "url")
    }
    assert(seen.toSet === refSeen.toSet)
    // and every verdict the one-shot batch marks SEEN is seen here too
    // (extension can only mark MORE things seen, never fewer)
    batchAnswer.filter(!_._3).foreach { case (id, u, _) =>
      assert(seen.exists(r => r._1 == id && !r._3),
        s"one-shot seen verdict lost for $id / $u")
    }
  }
}
