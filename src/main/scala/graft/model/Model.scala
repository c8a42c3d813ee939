package graft.model

import org.apache.spark.sql.types._

/** Data model — SURVEY.md §1 re-expressed as explicit Spark schemas.
  *
  * The reference keeps everything dynamically typed JS; here every record
  * family is a case class + StructType pair: `Dataset[T]` where type
  * safety helps, `DataFrame` + schema where structure is dynamic.
  * Timestamps are `TimestampType` UTC internally (session TZ pinned);
  * per-sink rendering happens at the boundary (SURVEY §2.11.6).
  */

/** Static per-provider config row (`schema/v1.json:1-42`). */
case class SourceConfig(
    schema: String,
    provider: String,
    frequency: String, // minute | hour | day
    secretKey: Option[String],
    active: Boolean,
    meta: Map[String, String])

/** Unit-conversion dimension row (`fetcher/lib/measurand.js:3-11`). */
case class MeasurandRule(input_param: String, parameter: String, unit: String)

/** Leaf sensor (`station.js:108-174`). */
case class Sensor(
    sensor_id: String,
    measurand_parameter: String,
    measurand_unit: String)

/** Mid-level system (`station.js:49-106`). */
case class SensorSystem(
    sensor_system_id: Option[String],
    sensor_system_manufacturer_name: Option[String],
    sensors: Seq[Sensor])

/** Station document: node → systems → sensors (`station.js:1-47`). */
case class SensorNode(
    sensor_node_id: String,
    sensor_node_site_name: Option[String],
    sensor_node_source_name: String,
    sensor_node_ismobile: Option[Boolean],
    sensor_node_geometry: Option[Seq[Double]], // [lon, lat]
    sensor_node_city: Option[String],
    sensor_node_country: Option[String],
    sensor_node_timezone: Option[String],
    sensor_systems: Seq[SensorSystem])

/** Central fact row, fixed stations (`measure.js:14`, `:49-58`). */
case class FixedMeasure(
    sensor_id: String,
    measure: Double,
    timestamp: java.sql.Timestamp)

/** Fact row with per-row coordinates, mobile (`measure.js:16`, `:72-79`). */
case class MobileMeasure(
    sensor_id: String,
    measure: Double,
    timestamp: java.sql.Timestamp,
    longitude: Double,
    latitude: Double)

/** v0.1 JSON-schema station row (`clarity.js:140-147`). */
case class Location(
    location: String,
    label: String,
    ismobile: Boolean,
    lon: Double,
    lat: Double)

/** Per-run summary (`purpleair.js:88`, `clarity.js:192-208`). */
case class FetchSummary(
    source_name: String,
    locations: Long,
    measures: Long,
    from: Option[java.sql.Timestamp],
    to: Option[java.sql.Timestamp])

object Schemas {
  /** Strict source-config schema (`schema/v1.json`): required fields,
    * frequency enum enforced by [[graft.sources.Ingest.readSourceConfigs]]. */
  val sourceConfig: StructType = StructType(Seq(
    StructField("schema", StringType, nullable = false),
    StructField("provider", StringType, nullable = false),
    StructField("frequency", StringType, nullable = false),
    StructField("secretKey", StringType, nullable = true),
    StructField("active", BooleanType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val frequencies: Seq[String] = Seq("minute", "hour", "day")

  val sensor: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("measurand_parameter", StringType, nullable = false),
    StructField("measurand_unit", StringType, nullable = false)))

  val sensorSystem: StructType = StructType(Seq(
    StructField("sensor_system_id", StringType, nullable = true),
    StructField("sensor_system_manufacturer_name", StringType, nullable = true),
    StructField("sensors", ArrayType(sensor), nullable = false)))

  val sensorNode: StructType = StructType(Seq(
    StructField("sensor_node_id", StringType, nullable = false),
    StructField("sensor_node_site_name", StringType, nullable = true),
    StructField("sensor_node_source_name", StringType, nullable = false),
    StructField("sensor_node_ismobile", BooleanType, nullable = true),
    StructField("sensor_node_geometry", ArrayType(DoubleType), nullable = true),
    StructField("sensor_node_city", StringType, nullable = true),
    StructField("sensor_node_country", StringType, nullable = true),
    StructField("sensor_node_timezone", StringType, nullable = true),
    StructField("sensor_systems", ArrayType(sensorSystem), nullable = false)))

  val fixedMeasure: StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("measure", DoubleType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))

  val mobileMeasure: StructType = fixedMeasure
    .add("longitude", DoubleType).add("latitude", DoubleType)

  /** CSV header orders are part of the sink contract (`measure.js:13-17`). */
  val fixedCsvHeader: Seq[String] = Seq("sensor_id", "measure", "timestamp")
  val mobileCsvHeader: Seq[String] =
    Seq("sensor_id", "measure", "timestamp", "longitude", "latitude")
}
