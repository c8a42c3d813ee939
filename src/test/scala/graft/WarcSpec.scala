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
}
