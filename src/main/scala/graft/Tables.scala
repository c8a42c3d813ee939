package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `\$sfDir/`. All queries in
  * [[SparkEntry.queries]] read exclusively through here so that the scan
  * path (vectorized parquet reader, pushed filters, pruned columns) is
  * uniform and visible in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-path parquet SCHEMA cache (round-20, guide §1.2 per-task →
    * per-query fixed costs): `spark.read.parquet` re-infers the schema
    * on EVERY call — a driver-side footer read plus, for `events`'
    * nanos generation, a thrown-and-retried inference — and every
    * bench run of every query pays it again.  A schema is immutable
    * METADATA of a file, not a result: caching it never bypasses any
    * computation over the data (the scan still reads parquet each
    * run), which is exactly how a production deployment works — table
    * schemas live in a catalog, not in per-query re-inference.
    *
    * Keyed by (path, mtime, length) so a test that REWRITES a fixture
    * path (e.g. TablesSpec's per-generation events files) can never
    * read a stale schema.  Values are plain StructTypes — no RDD
    * blocks, no checkpoint handles — so the measurement harnesses'
    * slate wipe has nothing to poison (the CacheRegistrySpec concern
    * does not apply; its frame-cache rule guards checkpointed
    * FRAMES). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  private def cachedSchema(spark: SparkSession, path: String)(
      infer: => org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    schemaCache.computeIfAbsent(
      (path, st.getModificationTime, st.getLen), _ => infer)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsImpl(spark, sfDir)
    else {
      val path = s"$sfDir/$name.parquet"
      val schema = cachedSchema(spark, path)(spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects, so it's read as a nano-count long via
    * `spark.sql.legacy.parquet.nanosAsLong` and floored to microseconds)
    * and plain timestamp[us] (surfacing as TIMESTAMP_NTZ or TIMESTAMP).
    * Branch on the schema actually read, not on an assumption about the
    * file — the session zone is pinned to UTC everywhere, so casting NTZ
    * to TIMESTAMP preserves the instant.  Sub-microsecond ordering in the
    * nanos case is sacrificed; every consumer tie-breaks on `event_id`.
    *
    * The legacy flag is NOT left set on the session: a library loader
    * must not flip a session-wide SQL conf under its caller, who may
    * read their own TIMESTAMP(NANOS) files expecting the default
    * rejection.  A nanos file is detected by the plain read throwing
    * PARQUET_TYPE_ILLEGAL; the flag is then set only around the EAGER
    * schema-inference call (restored in `finally`), and the actual
    * DataFrame is built with that schema passed EXPLICITLY — a
    * user-supplied schema maps the nanos column to raw longs at scan
    * time without any conf, so nothing about the returned (lazy) plan
    * depends on session state at action time. */
  private def eventsImpl(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$sfDir/events.parquet"
    // schema resolution (cached per path+mtime — see [[schemaCache]]):
    // the nanos probe below throws and re-infers under the legacy
    // flag, so on that generation EVERY uncached call paid the double
    // inference; with the cache both generations resolve once and the
    // DataFrame is always built from the explicit schema
    val schema = cachedSchema(spark, path)(
      try spark.read.parquet(path).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PARQUET_TYPE_ILLEGAL" =>
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.get(key)
          try { spark.conf.set(key, "true"); spark.read.parquet(path).schema }
          finally spark.conf.set(key, prev)
      })
    val raw = spark.read.schema(schema).parquet(path)
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected nanos-as-long, timestamp, or timestamp_ntz)")
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
