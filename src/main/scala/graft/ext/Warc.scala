package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500 / "WARC/1.0") record parsing — the container format
  * of web-scale crawl corpora (Common-Crawl-family pipelines read WARC
  * before any URL or content pass exists), implemented from scratch on
  * the public spec with zero new dependencies.
  *
  * Format walked: each record is a `WARC/1.x\r\n` version line,
  * `Name: value` header lines up to a blank line, exactly
  * `Content-Length` payload bytes, and a `\r\n\r\n` record separator.
  * Compressed WARCs are per-record gzip MEMBERS concatenated into one
  * stream (the spec's recommended layout) — the JDK's `GZIPInputStream`
  * reads concatenated members transparently, so one decompress pass
  * recovers the record stream.
  *
  * Scale shape: [[Warc.records]] is a narrow typed `mapPartitions` —
  * one crawl file (payload blob) in, one row per WARC record out, no
  * shuffle anywhere; a 100 TB crawl parses at scan parallelism and
  * only the (skinny) record metadata plus the payload the caller asked
  * for continue downstream.  Hostility posture matches the codec SPI:
  * the decompressed-size budget is enforced DURING inflation (never
  * trust a gzip bomb's headers), a malformed record ends that file's
  * walk at the last well-formed record, and nothing throws.
  */
object Warc {

  /** One parsed record: `file_id` = the input blob's id, `rec_index` =
    * record ordinal within the file. */
  case class WarcRecord(file_id: Long, rec_index: Int, warc_type: String,
                        target_uri: String, warc_date: String,
                        content_type: String, content_length: Long,
                        payload: Array[Byte])

  /** Decompressed-bytes budget per crawl file (gzip-bomb guard),
    * overridable per job. */
  val maxInflatedConf = "spark.graft.warc.maxInflatedBytes"
  val defaultMaxInflated: Long = 256L * 1024 * 1024

  def maxInflatedFor(spark: SparkSession): Long =
    spark.conf.get(maxInflatedConf, defaultMaxInflated.toString).toLong

  /** Files whose inflation hit the budget — observable, never silent. */
  val oversizeRejected = new java.util.concurrent.atomic.AtomicLong()

  /** crawl files (`idCol`, `payloadCol: binary`) → one row per WARC
    * record.  Gzip (member-concatenated) and plain WARC both accepted;
    * undecodable files simply contribute zero rows (they belong to a
    * different lens). */
  def records(spark: SparkSession, files: DataFrame, idCol: String,
              payloadCol: String): DataFrame = {
    import spark.implicits._
    val budget = maxInflatedFor(spark)
    files.select(files(idCol).cast("long"), files(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        parseFile(payload, budget).zipWithIndex.map { case (r, i) =>
          WarcRecord(id, i, r.warcType, r.targetUri, r.date,
            r.contentType, r.payload.length.toLong, r.payload)
        }
      })
      .toDF()
  }

  private[graft] case class Rec(warcType: String, targetUri: String,
                              date: String, contentType: String,
                              payload: Array[Byte])

  /** Parse one crawl file (gzip-inflating if needed); malformed tails
    * degrade to the records parsed so far. */
  private[graft] def parseFile(payload: Array[Byte],
                             budget: Long): Seq[Rec] =
    try {
      val bytes =
        if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f &&
          (payload(1) & 0xff) == 0x8b) {
          inflateAll(payload, budget) match {
            case Some(b) => b
            case None => return Nil
          }
        } else payload
      parseRecords(bytes)
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** Inflate concatenated gzip members under `budget`; None when the
    * stream is corrupt or the budget trips. */
  private def inflateAll(p: Array[Byte], budget: Long)
      : Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(p))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > budget) {
          oversizeRejected.incrementAndGet()
          return None
        }
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Index of the next CRLF at/after `from`, or -1. */
  private def crlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private[graft] def parseRecords(b: Array[Byte]): Seq[Rec] = {
    val out = Seq.newBuilder[Rec]
    var off = 0
    var ok = true
    while (ok && off < b.length) {
      // version line
      val vEnd = crlf(b, off)
      if (vEnd < 0 || !ascii(b, off, math.min(vEnd, off + 5))
        .startsWith("WARC/")) { ok = false }
      else {
        // header block up to the blank line
        var h = vEnd + 2
        var warcType = ""
        var uri = ""
        var date = ""
        var ctype = ""
        var clen = -1L
        var headerOk = true
        var blank = false
        while (headerOk && !blank) {
          val e = crlf(b, h)
          if (e < 0) headerOk = false
          else if (e == h) { blank = true; h = e + 2 }
          else {
            val line = ascii(b, h, e)
            val ci = line.indexOf(':')
            if (ci > 0) {
              val k = line.substring(0, ci).trim.toLowerCase
              val v = line.substring(ci + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "warc-date" => date = v
                case "content-type" => ctype = v
                case "content-length" =>
                  clen = try v.toLong catch { case _: Exception => -1L }
                case _ => ()
              }
            }
            h = e + 2
          }
        }
        if (!headerOk || clen < 0 || h + clen > b.length) ok = false
        else {
          val payload = java.util.Arrays.copyOfRange(b, h,
            (h + clen).toInt)
          out += Rec(warcType, uri, date, ctype, payload)
          // record separator: exactly \r\n\r\n per spec; tolerate EOF
          var nxt = (h + clen).toInt
          var seps = 0
          while (seps < 2 && nxt + 1 < b.length && b(nxt) == '\r' &&
            b(nxt + 1) == '\n') { nxt += 2; seps += 1 }
          if (seps == 0 && nxt < b.length) ok = false // garbage tail
          off = nxt
        }
      }
    }
    out.result()
  }

  /** Deterministic synthetic WARC writer — the injection constructor
    * the parser must invert exactly (the codec-family pattern: one
    * source of truth for WRITING, an independent walk for READING).
    * Each record's payload is the given bytes verbatim; `gzip = true`
    * emits one gzip member per record, concatenated (the spec's
    * compressed layout). */
  def syntheticWarc(records: Seq[(String, String, String, Array[Byte])],
                    gzip: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (warcType, uri, date, payload) =>
      val rec = new java.io.ByteArrayOutputStream()
      val hdr = new StringBuilder()
      hdr.append("WARC/1.0\r\n")
      hdr.append(s"WARC-Type: $warcType\r\n")
      if (uri.nonEmpty) hdr.append(s"WARC-Target-URI: $uri\r\n")
      hdr.append(s"WARC-Date: $date\r\n")
      hdr.append("Content-Type: application/http;msgtype=response\r\n")
      hdr.append(s"Content-Length: ${payload.length}\r\n")
      hdr.append("\r\n")
      rec.write(hdr.toString.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))
      rec.write(payload)
      rec.write("\r\n\r\n".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))
      if (gzip) {
        val gz = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(rec.toByteArray)
        g.close()
        out.write(gz.toByteArray)
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }
}
