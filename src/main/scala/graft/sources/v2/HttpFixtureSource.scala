package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's HTTP providers —
  * SURVEY §4 rows 1–2 made formal (§7.3 stretch goal).
  *
  * The reference pushes work to the API: PurpleAir requests only the
  * `fields=` it needs (`purpleair.js:94-118` — column pruning) and
  * constrains `max_age`/`location_type` server-side
  * (`purpleair.js:120-125` — predicate pushdown).  This connector does
  * the same at the DSv2 boundary: `SupportsPushDownRequiredColumns` and
  * `SupportsPushDownFilters` receive Catalyst's pruned schema and
  * predicates, and the "HTTP fetch" (here: a recorded JSONL payload
  * read driver-side, exactly where the reference's `request()` runs)
  * applies them before a single row enters the cluster.  Unsupported
  * predicates are returned to Spark for post-scan evaluation.
  *
  * Usage:
  *   spark.read.format("graft-fixture").schema(s).load(path)
  *
  * Two layouts:
  *  - `path` = one recorded response file → the "fetch" runs
  *    driver-side (like the reference's single `request()`), rows split
  *    round-robin into `partitions` (default 4) InputPartitions;
  *  - `path` = a DIRECTORY of page files (`page-*.jsonl`, one per
  *    HTTP page / device cohort) → ONE InputPartition PER PAGE, and
  *    each page is fetched+parsed+filtered ON ITS EXECUTOR TASK.  This
  *    is the scale path: the reference's driver-side `pLimit(10)`
  *    concurrency cap becomes genuine task parallelism — 10 000 pages
  *    are 10 000 tasks the scheduler spreads over the cluster, with
  *    pushed filters and pruned columns applied inside each task
  *    before a single row is materialized.
  */
/** The reference's `request()` boundary (`utils.js:3`): URL, query
  * params, API-key headers, and gzip handling live behind this
  * interface.  This build ships the recorded-payload implementation
  * (zero-egress environment); a production build registers an
  * HTTP-client implementation by class name via the `fetcher` option —
  * the DSv2 data plane (pushdown, page partitioning, in-task fetch) is
  * identical either way. */
trait PageFetcher extends Serializable {
  def fetch(req: PageRequest): Seq[String]

  /** Source options prefixed `fetcher.` arrive here (prefix stripped,
    * keys lowercased — DSv2 option maps are case-insensitive), once,
    * right after instantiation.  Default: ignore. */
  def configure(conf: Map[String, String]): Unit = ()
}

case class PageRequest(url: String,
                       params: Map[String, String] = Map.empty,
                       headers: Map[String, String] = Map.empty)

/** Recorded-payload fetcher: local replay with transparent gzip
  * (the reference's gzip-aware body handling, `utils.js:18-24`). */
class FixtureFetcher extends PageFetcher {
  override def fetch(req: PageRequest): Seq[String] = {
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(req.url))
    val bytes =
      if (req.url.endsWith(".gz")) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw))
        val out = in.readAllBytes(); in.close(); out
      } else raw
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.trim.nonEmpty)
  }
}

object PageFetcher {
  def instantiate(className: String,
                  conf: Map[String, String] = Map.empty): PageFetcher = {
    val f = Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[PageFetcher]
    f.configure(conf)
    f
  }

  /** `fetcher.`-prefixed entries of a DSv2 option/property map, prefix
    * stripped and keys lowercased. */
  def confOf(m: java.util.Map[String, String]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asScala.collect {
      case (k, v) if k.toLowerCase.startsWith("fetcher.") =>
        k.toLowerCase.stripPrefix("fetcher.") -> v
    }.toMap
  }
}

class HttpFixtureSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-fixture"

  override def supportsExternalMetadata(): Boolean = true

  private def fetcherOf(get: String => String): String =
    Option(get("fetcher")).getOrElse(classOf[FixtureFetcher].getName)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpFixtureSource.infer(HttpFixtureSource.readLines(
      Option(options.get("path")).getOrElse(
        throw new IllegalArgumentException("path option required")),
      PageFetcher.instantiate(fetcherOf(options.get),
        PageFetcher.confOf(options))))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FixtureTable(schema,
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("path option required")),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      fetcherOf(properties.get), PageFetcher.confOf(properties))
}

object HttpFixtureSource {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val pageExts = Seq(".json", ".jsonl", ".json.gz", ".jsonl.gz")

  /** Page files of a directory payload, deterministically ordered. */
  def pageFiles(path: String): Option[Seq[String]] = {
    val f = new java.io.File(path)
    if (!f.isDirectory) None
    else Some(f.listFiles().toSeq
      .filter(p => pageExts.exists(p.getName.endsWith))
      .map(_.getAbsolutePath).sorted)
  }

  def readLines(path: String,
                fetcher: PageFetcher = new FixtureFetcher): Seq[String] =
    pageFiles(path) match {
      case Some(pages) =>
        pages.headOption.map(p => fetcher.fetch(PageRequest(p)))
          .getOrElse(Seq.empty)
      case None => fetcher.fetch(PageRequest(path))
    }

  /** Executor-side page scan: fetch → parse → pushed filters → prune,
    * all inside the task that owns the page. */
  def scanPage(file: String, fullSchema: StructType, required: StructType,
               pushed: Array[Filter], fetcher: PageFetcher,
               topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None)
      : Iterator[Array[Any]] = {
    val names = fullSchema.fieldNames
    val filtered = fetcher.fetch(PageRequest(file)).iterator
      .map(l => parse(l, fullSchema))
      .filter { vals =>
        val m = names.zip(vals).toMap
        pushed.forall(accepts(_, m))
      }
    // API-side ORDER BY … LIMIT (the reference's sorted listing +
    // early exit, cmu.js:254-264): sort AFTER the pushed filters,
    // truncate, THEN project — sort keys need not survive pruning
    val ordered = topN.fold(filtered) { case (orders, l) =>
      val idx = orders.map { case (f, _, _) => names.indexOf(f) }
      filtered.toSeq.sortWith { (ra, rb) =>
        var c = 0
        var i = 0
        while (c == 0 && i < orders.length) {
          val (_, desc, nullsFirst) = orders(i)
          val (va, vb) = (ra(idx(i)), rb(idx(i)))
          c = (va, vb) match {
            case (null, null) => 0
            case (null, _)    => if (nullsFirst) -1 else 1
            case (_, null)    => if (nullsFirst) 1 else -1
            case _            =>
              val base = compareValues(va, vb)
              if (desc) -base else base
          }
          i += 1
        }
        c < 0
      }.take(l).iterator
    }
    ordered.map { vals =>
      val m = names.zip(vals).toMap
      required.fieldNames.map(m(_))
    }
  }

  /** Same-type value comparison for TopN ordering. */
  private def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    case (x: String, y: String)   => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _                        => 0
  }

  /** First-record type inference: long / double / boolean / string. */
  def infer(lines: Seq[String]): StructType = {
    val first = JsonMethods.parse(lines.head).asInstanceOf[JObject]
    StructType(first.obj.map {
      case (k, _: JInt)    => StructField(k, LongType)
      case (k, _: JDouble) => StructField(k, DoubleType)
      case (k, _: JBool)   => StructField(k, BooleanType)
      case (k, _)          => StructField(k, StringType)
    })
  }

  /** Parse one payload record into schema-ordered JVM values. */
  def parse(line: String, schema: StructType): Array[Any] = {
    val obj = JsonMethods.parse(line).asInstanceOf[JObject].obj.toMap
    schema.fields.map { f =>
      obj.get(f.name) match {
        case None | Some(JNull) => null
        case Some(v) => (f.dataType, v) match {
          case (LongType, JInt(i))      => i.toLong
          case (LongType, JDouble(d))   => d.toLong
          case (DoubleType, JInt(i))    => i.toDouble
          case (DoubleType, JDouble(d)) => d
          case (BooleanType, JBool(b))  => b
          // user-supplied schemas may type payload fields as timestamps
          // ("2024-01-01 10:00:00", ISO-8601 'T', trailing 'Z' or a
          // ±hh:mm offset) — InternalRow wants epoch micros; aggregate
          // pushdown DECLINES on this type.  Parsed with Spark's own
          // session-timezone rules (zoneless strings read in the
          // SESSION zone, zone-suffixed strings honor their zone), not
          // Timestamp.valueOf, which reads the JVM-default zone and
          // throws on any zone suffix
          case (TimestampType, JString(s)) =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils
              .stringToTimestamp(UTF8String.fromString(s),
                org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
                  org.apache.spark.sql.internal.SQLConf.get
                    .sessionLocalTimeZone))
              .getOrElse(throw new IllegalArgumentException(
                s"unparseable timestamp '$s'"))
          case (StringType, JString(s)) => s
          case (StringType, other)      => JsonMethods.compact(other)
          case (dt, other) =>
            throw new IllegalArgumentException(s"can't read $other as $dt")
        }
      }
    }
  }

  /** Driver-side ("API-side") evaluation of pushed filters. */
  def accepts(filter: Filter, row: Map[String, Any]): Boolean = {
    def cmp(att: String, v: Any): Option[Int] =
      (row.getOrElse(att, null), v) match {
        case (null, _) => None
        case (a: Long, b: Number)    => Some(java.lang.Long.compare(a, b.longValue()))
        case (a: Double, b: Number)  => Some(java.lang.Double.compare(a, b.doubleValue()))
        case (a: String, b: String)  => Some(a.compareTo(b))
        case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
        case _ => None
      }
    filter match {
      case EqualTo(a, v)            => cmp(a, v).contains(0)
      case GreaterThan(a, v)        => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v)           => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v).exists(_ <= 0)
      case IsNotNull(a)             => row.getOrElse(a, null) != null
      case IsNull(a)                => row.getOrElse(a, null) == null
      case In(a, vs)                => vs.exists(v => cmp(a, v).contains(0))
      case And(l, r)                => accepts(l, row) && accepts(r, row)
      case Or(l, r)                 => accepts(l, row) || accepts(r, row)
      case _                        => true // unsupported: Spark re-checks
    }
  }

  /** Which filters this "API" can evaluate server-side. */
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
         _: LessThanOrEqual | _: IsNotNull | _: IsNull | _: In => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case _ => false
  }
}

class FixtureTable(tableSchema: StructType, path: String, partitions: Int,
                   fetcherClass: String,
                   fetcherConf: Map[String, String] = Map.empty)
    extends Table with SupportsRead {
  override def name(): String = s"graft-fixture($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(tableSchema, path, partitions, fetcherClass,
      fetcherConf)
}

class FixtureScanBuilder(fullSchema: StructType, path: String,
                         partitions: Int, fetcherClass: String,
                         fetcherConf: Map[String, String] = Map.empty)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None
  private var topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None
  private var agg: Option[(Seq[String], Seq[(String, String)])] = None

  /** Parse a connector [[Aggregation]] into (groupBy col names,
    * (kind, col) specs) — only plain column references and the
    * aggregate kinds the fixture API can answer (COUNT(*) / COUNT /
    * COUNT DISTINCT / MIN / MAX / SUM / AVG). */
  private def parseAgg(a: org.apache.spark.sql.connector.expressions
      .aggregate.Aggregation)
      : Option[(Seq[String], Seq[(String, String)])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, NamedReference}
    def name(e: V2Expr): Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    // MIN/MAX only on types the driver-side rollup can order (the
    // same set `aggregatedRows.lt` handles) — a user-supplied schema
    // may carry timestamp/decimal/binary columns, and declining here
    // makes Spark keep the aggregate instead of the scan throwing at
    // planInputPartitions
    def orderable(e: V2Expr): Option[String] = name(e).filter { c =>
      fullSchema.fieldNames.contains(c) && (fullSchema(c).dataType match {
        case LongType | IntegerType | DoubleType | BooleanType |
             StringType => true
        case _ => false
      })
    }
    // SUM/AVG only on the numeric types the rollup can total exactly —
    // AVG is answered directly (complete pushdown sees the original
    // Avg; Spark only decomposes to SUM+COUNT for partial pushdown)
    def numeric(e: V2Expr): Option[String] = name(e).filter { c =>
      fullSchema.fieldNames.contains(c) && (fullSchema(c).dataType match {
        case LongType | IntegerType | DoubleType => true
        case _ => false
      })
    }
    val gb = a.groupByExpressions().toSeq.map(name)
    val fns = a.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(("count_star", ""))
      case c: Count if !c.isDistinct => name(c.column).map(("count", _))
      // exact under COMPLETE pushdown only: this source's driver-side
      // fetch owns every row, so a per-group distinct is closed-form
      // (a paged/partial source could never merge distincts from
      // partial counts — pageFiles sources decline in
      // supportCompletePushDown)
      case c: Count if c.isDistinct =>
        name(c.column).map(("count_distinct", _))
      case m: Min => orderable(m.column).map(("min", _))
      case m: Max => orderable(m.column).map(("max", _))
      case s: Sum if !s.isDistinct => numeric(s.column).map(("sum", _))
      case av: Avg if !av.isDistinct => numeric(av.column).map(("avg", _))
      case _ => None
    }
    if (gb.forall(_.isDefined) && fns.forall(_.isDefined) && fns.nonEmpty)
      Some((gb.flatten, fns.flatten))
    else None
  }

  /** Aggregate pushdown — the API-side rollup endpoint (a paged HTTP
    * API answering `/summary?groupby=` instead of shipping raw rows).
    * COMPLETE pushdown only, and only for the single-payload path
    * where the driver-side fetch owns every row: a paged directory
    * computes per-page partials at most, and partial pushdown would
    * make Spark re-aggregate rows this source already collapsed. */
  override def supportCompletePushDown(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    HttpFixtureSource.pageFiles(path).isEmpty && parseAgg(a).isDefined

  override def pushAggregation(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    if (!supportCompletePushDown(a)) false
    else { agg = parseAgg(a); true }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(HttpFixtureSource.supported)
    pushed = ok
    rest // Spark evaluates these post-scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown — the API-side `limit=` query param every paged
    * HTTP source supports.  Fully pushed for the single-payload path
    * (the driver-side fetch truncates AFTER the pushed filters, so the
    * scan emits exactly ≤ limit rows and Spark drops its own Limit).
    * Honestly DECLINED for paged directories: a recorded page may be
    * empty, so capping the page count could under-deliver rows — the
    * per-page partitions stay and Spark's limit applies. */
  override def pushLimit(l: Int): Boolean =
    HttpFixtureSource.pageFiles(path) match {
      case Some(_) => false
      case None => limit = Some(l); true
    }

  /** ORDER BY … LIMIT pushdown — the reference's sorted-listing early
    * exit (`cmu.js:254-264` orders objects `desc` and stops at the
    * watermark).  Fully pushed for single payloads over plain column
    * references; declined for paged directories (same reason as
    * [[pushLimit]]) and for computed sort expressions. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean =
    HttpFixtureSource.pageFiles(path) match {
      case Some(_) => false
      case None =>
        import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
        val parsed = orders.toSeq.map(o => o.expression() match {
          case ref: NamedReference if ref.fieldNames().length == 1 =>
            Some((ref.fieldNames()(0),
              o.direction() == SortDirection.DESCENDING,
              o.nullOrdering() == NullOrdering.NULLS_FIRST))
          case _ => None
        })
        if (parsed.forall(_.isDefined)) {
          topN = Some((parsed.flatten, l))
          true
        } else false
    }

  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan =
    new FixtureScan(fullSchema, required, pushed, path, partitions,
      fetcherClass, limit, topN, fetcherConf, agg)
}

class FixtureScan(fullSchema: StructType, required: StructType,
                  pushed: Array[Filter], path: String, partitions: Int,
                  fetcherClass: String, limit: Option[Int] = None,
                  topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None,
                  fetcherConf: Map[String, String] = Map.empty,
                  agg: Option[(Seq[String], Seq[(String, String)])] = None)
    extends Scan with Batch {

  private def aggSchema: StructType = {
    val (gb, fns) = agg.get
    StructType(gb.map(c => fullSchema(c)) ++ fns.map {
      case ("count_star", _) => StructField("count(*)", LongType, false)
      case ("count", c) => StructField(s"count($c)", LongType, false)
      case ("count_distinct", c) =>
        StructField(s"count(DISTINCT $c)", LongType, false)
      // Spark's result types: SUM widens integrals to LONG; AVG is
      // DOUBLE for every non-decimal numeric input
      case ("sum", c) => StructField(s"sum($c)",
        if (fullSchema(c).dataType == DoubleType) DoubleType else LongType,
        true)
      case ("avg", c) => StructField(s"avg($c)", DoubleType, true)
      case (kind, c) =>
        StructField(s"$kind($c)", fullSchema(c).dataType, true)
    })
  }

  override def readSchema(): StructType = agg.fold(required)(_ => aggSchema)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-fixture pushed=[${pushed.mkString(",")}] " +
      s"columns=[${required.fieldNames.mkString(",")}]" +
      limit.map(l => s" limit=$l").getOrElse("") +
      topN.map { case (o, l) =>
        s" topN=[${o.map(_._1).mkString(",")}:$l]"
      }.getOrElse("") +
      agg.map { case (gb, fns) =>
        s" aggregates=[${fns.map(f => s"${f._1}(${f._2})").mkString(",")}" +
          s" by ${gb.mkString(",")}]"
      }.getOrElse("")

  /** Driver-side complete aggregation over the fetched+filtered rows —
    * the "rollup endpoint" the pushed [[agg]] stands for.  Null
    * semantics mirror Spark's: COUNT(c) skips nulls, MIN/MAX ignore
    * nulls, a null group key is its own group. */
  private def aggregatedRows(): Array[Array[Any]] = {
    val (gb, fns) = agg.get
    val names = fullSchema.fieldNames
    val rows = HttpFixtureSource.scanPage(path, fullSchema, fullSchema,
      pushed, PageFetcher.instantiate(fetcherClass, fetcherConf)).toSeq
    val gbIdx = gb.map(c => names.indexOf(c))
    val fnIdx = fns.map { case (_, c) => if (c.isEmpty) -1 else names.indexOf(c) }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Int, y: Int) => x < y
      case (x: Double, y: Double) => x < y
      case (x: Boolean, y: Boolean) => !x && y
      // UTF8 binary ordering, matching Spark's — Java's UTF-16
      // compareTo diverges on supplementary-plane characters
      case (x: String, y: String) =>
        UTF8String.fromString(x).compareTo(UTF8String.fromString(y)) < 0
      case _ => throw new IllegalArgumentException(
        s"unorderable agg input: $a / $b")
    }
    rows.groupBy(r => gbIdx.map(i => r(i)).toList).toArray
      .map { case (key, grp) =>
      def num(v: Any): Double = v match {
        case d: java.lang.Double => d.doubleValue
        case l: java.lang.Long => l.doubleValue
        case n: java.lang.Integer => n.doubleValue
        case other => throw new IllegalArgumentException(
          s"non-numeric agg input: $other")
      }
      val out = fns.zip(fnIdx).map {
        case (("count_star", _), _) => grp.size.toLong
        case (("count", _), i) => grp.count(_(i) != null).toLong
        case (("count_distinct", _), i) =>
          grp.map(_(i)).filter(_ != null).distinct.size.toLong
        case (("sum", c), i) =>
          val vs = grp.map(_(i)).filter(_ != null)
          if (vs.isEmpty) null
          // branches annotated Any: Scala would otherwise harmonize
          // the Long/Double match to Double, widening the Long sum
          else fullSchema(c).dataType match {
            case DoubleType => vs.map(num).sum: Any
            case _ => (vs.map {
              case l: java.lang.Long => l.longValue
              case n: java.lang.Integer => n.longValue
              case other => throw new IllegalArgumentException(
                s"non-integral sum input: $other")
            }.sum): Any
          }
        case (("avg", _), i) =>
          val vs = grp.map(_(i)).filter(_ != null)
          // Spark's Average: DOUBLE running sum / count for non-decimals
          if (vs.isEmpty) null else vs.map(num).sum / vs.size
        case ((kind, _), i) =>
          val vs = grp.map(_(i)).filter(_ != null)
          if (vs.isEmpty) null
          else if (kind == "min") vs.reduce((a, b) => if (lt(a, b)) a else b)
          else vs.reduce((a, b) => if (lt(a, b)) b else a)
      }
      (key ++ out).toArray
    }
  }

  /** Partition planning.  Paged directory → one InputPartition per
    * page, fetched lazily executor-side.  Single recorded response →
    * the "HTTP fetch" runs on the driver (like the reference's
    * `request()`), applies pushed filters + pruning API-side, then
    * splits rows round-robin into InputPartitions. */
  override def planInputPartitions(): Array[InputPartition] =
    if (agg.isDefined) {
      // complete agg pushdown: one partition of pre-aggregated rows
      Array(FixturePartition(aggregatedRows()): InputPartition)
    } else HttpFixtureSource.pageFiles(path) match {
      case Some(pages) =>
        pages.map(p => FixturePagePartition(p): InputPartition).toArray
      case None =>
        val all = HttpFixtureSource
          .scanPage(path, fullSchema, required, pushed,
            PageFetcher.instantiate(fetcherClass, fetcherConf), topN)
        val keep = limit.fold(all)(all.take).toArray
        if (topN.isDefined) {
          // fully-pushed TopN removed Spark's Sort: the scan OWNS the
          // global order, so the ≤N rows stay in one ordered partition
          Array(FixturePartition(keep): InputPartition)
        } else {
          val n = math.max(1, math.min(partitions, keep.length))
          (0 until n).map(i =>
            FixturePartition(keep.zipWithIndex.collect {
              case (r, j) if j % n == i => r
            }): InputPartition).toArray
        }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(fullSchema, required, pushed, fetcherClass,
      fetcherConf)
}

case class FixturePartition(rows: Array[Array[Any]]) extends InputPartition
case class FixturePagePartition(file: String) extends InputPartition

class FixtureReaderFactory(fullSchema: StructType, required: StructType,
                           pushed: Array[Filter], fetcherClass: String,
                           fetcherConf: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {

  private def rowIterator(p: InputPartition): Iterator[Array[Any]] = p match {
    case FixturePartition(rows) => rows.iterator
    case FixturePagePartition(file) => // fetch happens HERE, in the task
      HttpFixtureSource.scanPage(file, fullSchema, required, pushed,
        PageFetcher.instantiate(fetcherClass, fetcherConf))
    case other =>
      throw new IllegalArgumentException(s"unexpected partition: $other")
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = rowIterator(p)
      private var cur: Array[Any] = _
      override def next(): Boolean = {
        if (rows.hasNext) { cur = rows.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(cur.toIndexedSeq.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
      override def close(): Unit = ()
    }
}
