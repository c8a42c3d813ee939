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

  val cellDeg = 15

  /** Grid-indexed polygon dim: (cx, cy, tz, xs, ys), one row per
    * 15° cell overlapping a polygon's bounding box.  Built driver-side —
    * it is a small constant dim by design (real tz data: ~10⁵ rows). */
  def zoneCells(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      (tz, xs, ys) <- zones
      cx <- math.floor(xs.min / cellDeg).toInt to math.floor(xs.max / cellDeg).toInt
      cy <- math.floor(ys.min / cellDeg).toInt to math.floor(ys.max / cellDeg).toInt
    } yield (cx, cy, tz, xs, ys)
    rows.toDF("__cx", "__cy", "tz", "xs", "ys")
  }

  /** (key, tz) for every point: polygon zone where one contains the
    * point, nautical approximation otherwise. */
  def tzForPoints(points: DataFrame, keyCol: String,
                  lonCol: String, latCol: String): DataFrame = {
    val spark = points.sparkSession
    val pts = points.select(col(keyCol),
      col(lonCol).cast("double").as("__lon"),
      col(latCol).cast("double").as("__lat"))
    // broadcast is justified here (unlike the dedup joins): the polygon
    // dim is a bounded constant table, not data-sized
    val cand = pts
      .withColumn("__cx", floor(col("__lon") / cellDeg).cast("int"))
      .withColumn("__cy", floor(col("__lat") / cellDeg).cast("int"))
      .join(broadcast(zoneCells(spark)), Seq("__cx", "__cy"), "left")
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
