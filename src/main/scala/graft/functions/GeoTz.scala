package graft.functions

import graft.plans.PointInPolygon.pointInPolygon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F16 — timezone from coordinates as a real polygon lookup
  * (`senstate.js:67` resolves zones via geo-tz's polygon dataset).
  *
  * Operator shape, built for 100 TB:
  *  1. zone polygons are a BROADCAST dim (the real tz-boundary set is
  *     tens of MB — squarely in broadcast range; here a coarse built-in
  *     table with the same shape), pre-exploded to a 15°×15° grid
  *     index: one row per (cell, polygon-overlapping-bbox);
  *  2. points compute their grid cell map-side and equi-join the dim —
  *     each point meets only the handful of polygons whose bbox touches
  *     its cell, never the whole polygon set;
  *  3. the exact ray-cast test ([[graft.plans.PointInPolygon]], full
  *     whole-stage codegen) runs per candidate, and a skinny
  *     (key, tz) aggregation reduces multi-candidate points;
  *  4. points outside every polygon (ocean) fall back to the nautical
  *     `UTC±round(lon/15)` approximation ([[ColumnFns.tzFromLon]]) —
  *     the reference's own fallback semantics for unmapped areas.
  *
  * The built-in polygons are synthetic but structurally real: ring
  * vertex arrays, convex and CONCAVE shapes, non-overlapping, no
  * horizontal edges (so the oracle's non-short-circuiting ray-cast
  * replay never divides by zero).
  */
object GeoTz {

  /** (tz, xs, ys): coarse zone rings.  Vertices at .5 offsets avoid
    * integer-coordinate edge cases; "Asia/Shanghai" is concave (notch)
    * to exercise real ray casting. */
  val zones: Seq[(String, Seq[Double], Seq[Double])] = Seq(
    ("America/New_York",
      Seq(-85.5, -70.5, -72.5, -84.5), Seq(34.5, 36.5, 45.5, 44.5)),
    ("Europe/Berlin",
      Seq(4.5, 15.5, 14.5, 5.5), Seq(46.5, 47.5, 55.5, 54.5)),
    ("Asia/Shanghai",
      Seq(74.5, 124.5, 124.5, 100.5, 99.5, 74.5),
      Seq(19.5, 20.5, 45.5, 30.5, 44.5, 43.5)),
    ("Australia/Sydney",
      Seq(139.5, 155.5, 154.5, 140.5), Seq(-40.5, -39.5, -24.5, -25.5)),
    ("America/Sao_Paulo",
      Seq(-55.5, -40.5, -41.5, -54.5), Seq(-30.5, -29.5, -14.5, -15.5)))

  /** Coarse REAL-WORLD zone extract: 20 major IANA zones as tilted
    * quadrilaterals approximating their actual extents (authored from
    * public geography; boundaries are deliberately coarse — a rough
    * containment proxy, NOT survey data).  Corners are tilted a few
    * tenths of a degree so no edge is exactly horizontal (keeps every
    * consumer of the ray-cast — including a potential SQL replay — away
    * from the horizontal-edge division).  Swap in a full
    * timezone-boundary-builder extract via [[loadZones]] for
    * production accuracy; the operator and its plan are identical at
    * any dim size. */
  val coarseWorldZones: Seq[(String, Seq[Double], Seq[Double])] = Seq(
    ("America/Los_Angeles",
      Seq(-124.8, -114.3, -117.1, -124.6), Seq(32.2, 32.6, 49.1, 48.5)),
    ("America/Denver",
      Seq(-114.2, -102.1, -102.3, -114.0), Seq(31.2, 31.6, 49.2, 48.8)),
    ("America/Chicago",
      Seq(-102.0, -85.8, -86.0, -101.8), Seq(28.9, 29.3, 49.3, 48.9)),
    ("America/New_York",
      Seq(-85.7, -66.9, -67.1, -85.5), Seq(24.9, 25.3, 47.5, 47.1)),
    ("America/Mexico_City",
      Seq(-106.2, -95.9, -96.1, -106.0), Seq(16.1, 16.5, 26.3, 25.9)),
    ("America/Sao_Paulo",
      Seq(-53.4, -40.1, -40.3, -53.2), Seq(-33.6, -33.2, -14.1, -14.5)),
    ("Europe/London",
      Seq(-8.1, 1.7, 1.5, -7.9), Seq(49.9, 50.3, 59.1, 58.7)),
    ("Europe/Berlin",
      Seq(1.8, 15.1, 14.9, 2.0), Seq(43.1, 43.5, 55.3, 54.9)),
    ("Europe/Moscow",
      Seq(27.1, 44.9, 44.7, 27.3), Seq(49.9, 50.3, 68.1, 67.7)),
    ("Africa/Cairo",
      Seq(24.1, 35.9, 35.7, 24.3), Seq(21.9, 22.3, 31.7, 31.3)),
    ("Africa/Lagos",
      Seq(2.6, 14.3, 14.1, 2.8), Seq(3.9, 4.3, 14.1, 13.7)),
    ("Africa/Johannesburg",
      Seq(16.1, 32.9, 32.7, 16.3), Seq(-34.9, -34.5, -21.9, -22.3)),
    ("Asia/Kolkata",
      Seq(68.1, 88.9, 88.7, 68.3), Seq(7.9, 8.3, 33.1, 32.7)),
    ("Asia/Shanghai",
      Seq(97.1, 122.9, 122.7, 97.3), Seq(19.9, 20.3, 42.1, 41.7)),
    ("Asia/Tokyo",
      Seq(129.1, 145.9, 145.7, 129.3), Seq(29.9, 30.3, 45.6, 45.2)),
    ("Asia/Dubai",
      Seq(51.1, 56.9, 56.7, 51.3), Seq(21.9, 22.3, 26.6, 26.2)),
    ("Asia/Jakarta",
      Seq(94.9, 108.1, 107.9, 95.1), Seq(-8.3, -7.9, 6.1, 5.7)),
    ("Australia/Perth",
      Seq(112.1, 129.1, 128.9, 112.3), Seq(-35.3, -34.9, -12.9, -13.3)),
    ("Australia/Sydney",
      Seq(140.9, 153.9, 153.7, 141.1), Seq(-39.3, -38.9, -27.9, -28.3)),
    ("Pacific/Auckland",
      Seq(165.9, 178.9, 178.7, 166.1), Seq(-47.3, -46.9, -33.9, -34.3)))

  val cellDeg = 15

  /** Load a zone table from JSON lines of
    * `{"tz": "...", "xs": [...], "ys": [...]}` rows — the bridge to a
    * real tz-boundary extract (e.g. a simplified
    * timezone-boundary-builder dump pre-flattened to rings).  Collected
    * driver-side: the dim is bounded by design (full real set ≈ 10⁵
    * ring rows, tens of MB). */
  def loadZones(spark: SparkSession,
                path: String): Seq[(String, Seq[Double], Seq[Double])] =
    spark.read.schema("tz STRING, xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>")
      .json(path).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getSeq[Double](2)))
      .toSeq

  /** Bridge from a RAW timezone-boundary extract — a GeoJSON
    * FeatureCollection whose features carry `properties.tzid` and
    * Polygon / MultiPolygon geometry (the schema of
    * timezone-boundary-builder's `combined.json` releases).  Every
    * polygon contributes its OUTER ring; holes are dropped (the dim is
    * a containment proxy) and the GeoJSON closing vertex is removed
    * (rings here are stored open; [[graft.plans.PointInPolygon]]
    * closes implicitly).  Parsed driver-side with jackson (already on
    * Spark's classpath) through the Hadoop filesystem — same
    * bounded-dim rationale as [[loadZones]]. */
  def loadZonesGeoJson(spark: SparkSession,
                       path: String): Seq[(String, Seq[Double], Seq[Double])] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parseZonesGeoJson(in) finally in.close()
  }

  /** The parsing half of [[loadZonesGeoJson]], over any stream — also
    * feeds the bundled [[denseWorldZones]] resource (no SparkSession
    * needed, so oracle SQL generation can run before one exists). */
  def parseZonesGeoJson(in: java.io.InputStream)
      : Seq[(String, Seq[Double], Seq[Double])] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    def ring(r: com.fasterxml.jackson.databind.JsonNode)
        : (Seq[Double], Seq[Double]) = {
      val pts = r.elements().asScala
        .map(pt => (pt.get(0).asDouble(), pt.get(1).asDouble())).toSeq
      val open =
        if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
      (open.map(_._1), open.map(_._2))
    }
    root.get("features").elements().asScala.flatMap { f =>
      val tz = f.get("properties").get("tzid").asText()
      val geom = f.get("geometry")
      val outers = geom.get("type").asText() match {
        case "Polygon" => Seq(geom.get("coordinates").get(0))
        case "MultiPolygon" =>
          geom.get("coordinates").elements().asScala.map(_.get(0)).toSeq
        case other => throw new IllegalArgumentException(
          s"unsupported geometry type $other for $tz")
      }
      outers.map { o => val (xs, ys) = ring(o); (tz, xs, ys) }
    }.toSeq
  }

  /** The bundled ~230-zone world extract
    * (`graft/tz/dense_zones.geojson`, generated by
    * `tools/gen_dense_tz.py`): every feature is a coarse tilted
    * bounding quad of one IANA zone's main landmass, in
    * timezone-boundary-builder's combined.json schema.  Containment is
    * approximate (boxes bleed into neighbors and coastal water;
    * min(tz) resolves overlaps deterministically) — swap in a real
    * simplified tz-boundary dump via [[loadZonesGeoJson]] for survey
    * accuracy; plan and operators are identical at either fidelity. */
  lazy val denseWorldZones: Seq[(String, Seq[Double], Seq[Double])] = {
    val in = getClass.getResourceAsStream("/graft/tz/dense_zones.geojson")
    require(in != null, "bundled dense_zones.geojson missing from classpath")
    try parseZonesGeoJson(in) finally in.close()
  }

  /** Grid-indexed polygon dim: (cx, cy, tz, xs, ys), one row per
    * 15° cell overlapping a polygon's bounding box.  Built driver-side —
    * it is a small constant dim by design (real tz data: ~10⁵ rows). */
  def zoneCells(spark: SparkSession,
                zs: Seq[(String, Seq[Double], Seq[Double])] = zones)
      : DataFrame = {
    import spark.implicits._
    val rows = for {
      (tz, xs, ys) <- zs
      cx <- math.floor(xs.min / cellDeg).toInt to math.floor(xs.max / cellDeg).toInt
      cy <- math.floor(ys.min / cellDeg).toInt to math.floor(ys.max / cellDeg).toInt
    } yield (cx, cy, tz, xs, ys)
    rows.toDF("__cx", "__cy", "tz", "xs", "ys")
  }

  /** (key, tz) for every point: polygon zone where one contains the
    * point, nautical approximation otherwise.  `zs` selects the zone
    * dim: the synthetic oracle table (default), [[coarseWorldZones]],
    * or a [[loadZones]] extract. */
  def tzForPoints(points: DataFrame, keyCol: String,
                  lonCol: String, latCol: String,
                  zs: Seq[(String, Seq[Double], Seq[Double])] = zones)
      : DataFrame = {
    val spark = points.sparkSession
    val pts = points.select(col(keyCol),
      col(lonCol).cast("double").as("__lon"),
      col(latCol).cast("double").as("__lat"))
    // broadcast is justified here (unlike the dedup joins): the polygon
    // dim is a bounded constant table, not data-sized
    val cand = pts
      .withColumn("__cx", floor(col("__lon") / cellDeg).cast("int"))
      .withColumn("__cy", floor(col("__lat") / cellDeg).cast("int"))
      .join(broadcast(zoneCells(spark, zs)), Seq("__cx", "__cy"), "left")
    // per-candidate exact test runs map-side (partial agg); only
    // (key, tz, lon) partials reach the shuffle
    cand.groupBy(col(keyCol))
      .agg(
        min(when(pointInPolygon(col("__lon"), col("__lat"),
          col("xs"), col("ys")), col("tz"))).as("__ptz"),
        first(col("__lon")).as("__flon"))
      .select(col(keyCol),
        coalesce(col("__ptz"), ColumnFns.tzFromLon(col("__flon"))).as("tz"))
  }
}
