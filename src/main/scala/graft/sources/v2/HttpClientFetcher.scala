package graft.sources.v2

/** Real-transport [[PageFetcher]] over `java.net.http.HttpClient`
  * (JDK 11+) — the production counterpart of [[FixtureFetcher]]:
  * GET with sorted query params and headers, transparent gzip
  * (Content-Encoding: gzip or a `.gz` URL), and bounded
  * exponential-backoff retries on 5xx / connection errors
  * (reference analog: the `request()` + gunzip boundary,
  * `fetcher/utils.js:3-24`).  4xx fails fast — a bad key or URL will
  * not improve by retrying.
  *
  * No declared query uses it (zero-egress build environment); DsV2Spec
  * drives it end-to-end against an in-process HTTP server through the
  * DSv2 scan path.  Instantiated per task by class name (the `fetcher`
  * option), so the non-serializable client never rides a closure.
  */
class HttpClientFetcher extends PageFetcher {
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  /** Per-host in-flight cap for THIS JVM (reference analog: the
    * p-limit(10) politeness contract, `cmu.js:74`, and the 20-device
    * batches of `airgradient.js:101-110`).  Spark's task parallelism
    * otherwise fires one request per core at the same host.  Set via
    * the `fetcher.maxInflightPerHost` source option; cluster-wide
    * in-flight is cap × executor count, so size it as
    * budget / #executors. */
  @volatile private var maxInflightPerHost: Int =
    HttpClientFetcher.defaultMaxInflightPerHost

  override def configure(conf: Map[String, String]): Unit =
    conf.get("maxinflightperhost").foreach { v =>
      val n = v.toInt
      require(n >= 1, s"fetcher.maxInflightPerHost must be >= 1, got $n")
      maxInflightPerHost = n
    }

  override def fetch(req: PageRequest): Seq[String] = {
    val uri = java.net.URI.create(HttpClientFetcher.withQuery(req))
    val builder = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofSeconds(60)).GET()
    req.headers.toSeq.sortBy(_._1)
      .foreach { case (k, v) => builder.header(k, v) }
    val request = builder.build()
    val limiter = HttpClientFetcher.limiterFor(
      s"${uri.getHost}:${uri.getPort}", maxInflightPerHost)
    var attempt = 0
    var result: Option[Seq[String]] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt < HttpClientFetcher.maxAttempts) {
      if (attempt > 0) Thread.sleep(HttpClientFetcher.backoffMs << (attempt - 1))
      attempt += 1
      try {
        // the permit covers only the wire time — backoff sleeps hold
        // no permit, so a retrying task never starves its neighbors
        limiter.acquire()
        val resp =
          try client.send(request,
            java.net.http.HttpResponse.BodyHandlers.ofByteArray())
          finally limiter.release()
        val code = resp.statusCode()
        if (code >= 200 && code < 300) {
          val enc = resp.headers().firstValue("Content-Encoding")
          val gzipped = (enc.isPresent && enc.get.toLowerCase.contains("gzip")) ||
            uri.getPath.endsWith(".gz")
          val bytes =
            if (gzipped) {
              val in = new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(resp.body()))
              val out = in.readAllBytes(); in.close(); out
            } else resp.body()
          // \r?\n: a CRLF server must not leave a trailing \r on every
          // line (it would corrupt the last field of each JSONL record)
          result = Some(new String(bytes, "UTF-8").split("\r?\n").toSeq
            .filter(_.trim.nonEmpty))
        } else if (code >= 500) {
          lastErr = new java.io.IOException(s"HTTP $code from $uri")
        } else {
          throw new IllegalStateException(
            s"HTTP $code from $uri (not retryable)")
        }
      } catch {
        case e: java.io.IOException => lastErr = e
      }
    }
    result.getOrElse(throw new java.io.IOException(
      s"fetch failed after $attempt attempts: $uri", lastErr))
  }
}

object HttpClientFetcher {
  val maxAttempts = 3

  /** Conservative default politeness cap (the reference uses 10 for
    * its heaviest API). */
  val defaultMaxInflightPerHost = 8

  /** host:port → semaphore, shared by every fetcher instance in this
    * JVM so concurrent tasks contend on the same permits.  The FIRST
    * fetcher to touch a host fixes its cap (documented first-wins —
    * one politeness budget per host per executor). */
  private val limiters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Semaphore]()

  private[v2] def limiterFor(hostKey: String,
                             permits: Int): java.util.concurrent.Semaphore =
    limiters.computeIfAbsent(hostKey,
      _ => new java.util.concurrent.Semaphore(permits, true))
  /** Base backoff between retries; system-property override keeps the
    * retry test fast. */
  def backoffMs: Long =
    sys.props.get("graft.http.backoffMs").map(_.toLong).getOrElse(200L)

  /** Sorted, URL-encoded query string appended to the request URL —
    * sorted so URLs are deterministic (cache-key / replay friendly). */
  def withQuery(req: PageRequest): String =
    if (req.params.isEmpty) req.url
    else req.params.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }
      .mkString(req.url + (if (req.url.contains("?")) "&" else "?"), "&", "")
}
