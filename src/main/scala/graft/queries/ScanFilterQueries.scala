package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans/sources (SURVEY §2.1, S1–S12) and projections/filters (§2.2,
  * P3–P14) declared over the driver's tables.
  *
  * The reference's HTTP/Drive/GCS readers collapse to Spark's file
  * sources; what is testable relationally is the *shape* of each scan
  * (filter pushed to the reader, pruned columns, pivot, pagination,
  * header-drop) and each row predicate.  Connector-level concerns
  * (gzip, permissive CSV parse) are exercised through a real
  * write-then-read round trip (s7).
  */
object ScanFilterQueries {
  private val TS = "yyyy-MM-dd HH:mm:ss"
  private val DTS = "%Y-%m-%d %H:%M:%S"

  val qs: Map[String, Q] = Map(
    // S1 source-config scan: keep active sources (sources/index.js:17-20)
    "s1_config_scan" -> ((s, d) =>
      Tables.supplier(s, d)
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"), col("s_name"))),

    // S2 JSON ingest + field extraction (utils.js:3; iqair.js:101)
    "s2_json_fields" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))),

    // S3 permissive CSV numeric parse — bad cells → null (iqair.js:66-82)
    "s3_permissive_parse" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        expr("try_cast(CASE WHEN p_size % 3 = 0 THEN CAST(p_size AS STRING) " +
             "ELSE p_type END AS INT)").as("parsed"))),

    // S4 watermark-bounded incremental listing scan (cmu.js:246-274)
    "s4_watermark_scan" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-15 00:00:00"))
        .groupBy(date_format(date_trunc("day", col("ts")), TS).as("day"))
        .agg(count(lit(1)).as("n"))),

    // S7+K2 gzip CSV round trip: write gzipped headered CSV, read it back,
    // aggregate — lossless parity vs direct parquet agg (utils.js:28-42,
    // providers.js:141-159)
    "s7_gzip_roundtrip" -> ((s, d) => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gzip_").toString
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .write.mode("overwrite")
        .option("header", "true").option("compression", "gzip")
        .csv(tmp)
      s.read.option("header", "true")
        .schema("l_orderkey LONG, l_quantity DOUBLE, l_returnflag STRING")
        .csv(tmp)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // S9 columnar→row pivot: fields[]+data[][] → columns (purpleair.js:134-143)
    "s9_columnar_pivot" -> ((s, d) => {
      val fields = Seq("qty", "price")
      val columnar = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        array(col("l_quantity"), col("l_extendedprice")).as("data"))
      columnar.select(
        col("l_orderkey") +: col("l_linenumber") +:
          fields.zipWithIndex.map { case (f, i) => col("data")(i).as(f) }: _*)
    }),

    // S10 paginated accumulation: fixed-size pages unioned (habitatmap.js:166-207)
    "s10_pagination_union" -> ((s, d) => {
      val w = Window.orderBy(col("o_orderkey"))
      val paged = Tables.orders(s, d)
        .select(col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("page", ((col("rn") - 1) / 1000).cast("int"))
      val pages = (0 to 2).map(p => paged.filter(col("page") === p))
      pages.reduce(_ unionByName _).select(col("o_orderkey"), col("page"))
    }),

    // S12 header-row drop: first element is metadata (miri.js:74)
    "s12_header_drop" -> ((s, d) => {
      val w = Window.orderBy(col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1)
        .select(col("event_id"))
    }),

    // P3 null/NaN measure skip (purpleair.js:60; cmu.js:171)
    "p3_null_nan_skip" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v",
          when(col("event_type") === "error", expr("CAST('NaN' AS DOUBLE)"))
            .when(col("event_type") === "signup", lit(null).cast("double"))
            .otherwise(col("value")))
        .filter(col("v").isNotNull && !isnan(col("v")))
        .select(col("event_id"), col("v"))),

    // P4 sensor-id equality filter (purpleair.js:41-44)
    "p4_id_filter" -> ((s, d) =>
      Tables.events(s, d).filter(col("user_id") === 7)
        .select(col("event_id"), col("user_id"))),

    // P5 status-code filter (senstate.js:57)
    "p5_status_filter" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("status",
          when(col("event_type") === "error", 500).otherwise(200))
        .filter(col("status") === 200)
        .select(col("event_id"), col("status"))),

    // P6 coordinate-precision filter: ≥2 meaningful decimals (airgradient.js:179-188)
    "p6_precision_filter" -> ((s, d) =>
      Tables.events(s, d)
        .filter(abs(col("value") - round(col("value"), 1)) > 1e-9)
        .select(col("event_id"), col("value"))),

    // P7 deployment two-condition filter (data354.js:73)
    "p7_two_cond_filter" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O" && col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"))),

    // P8 unit allow-list filter (lovemyair.js:120-123)
    "p8_allowlist_filter" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id"), col("event_type"))),

    // P9 sentinel handling: 'n/a' dropped, 'inv' → -999 (smartsense.js:110-118)
    "p9_sentinel_map" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("raw",
          when(col("event_type") === "error", "n/a")
            .when(col("event_type") === "signup", "inv")
            .otherwise(col("event_id").cast("string")))
        .filter(col("raw") =!= "n/a")
        .select(col("event_id"),
          when(col("raw") === "inv", -999.0)
            .otherwise(col("raw").cast("double")).as("measure"))),

    // P10 empty-string value filter (iqair.js:188)
    "p10_empty_filter" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("raw",
          when(col("event_type") === "view", "")
            .otherwise(col("event_id").cast("string")))
        .filter(col("raw") =!= "")
        .select(col("event_id"))),

    // P11 time-range + future-data rejection (utils.js:180-209)
    "p11_time_range" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts").between(lit("2024-01-03 00:00:00"),
                                  lit("2024-01-25 00:00:00")))
        .select(col("event_id"))),

    // P12 zone-local cutoff filter (cpcb.js:144-154; IST = fixed UTC+5:30)
    "p12_zone_cutoff" -> ((s, d) =>
      Tables.events(s, d)
        .filter(from_utc_timestamp(col("ts"), "Asia/Kolkata") >
                lit("2024-01-20 00:00:00"))
        .select(col("event_id"))),

    // P13 stripNulls JSON projection (station.js:176-184): Spark's
    // to_json drops null fields by default
    "p13_strip_nulls" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        to_json(struct(
          col("event_id").as("a"),
          when(col("event_type") =!= "error", col("event_type"))
            .as("b"))).as("doc"))),

    // P14 param-whitelist row filter (cpcb.js:154, aernode.js:118)
    "p14_param_whitelist" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))))

  val sql: Map[String, String] = Map(
    "s1_config_scan" ->
      "SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 0",
    "s2_json_fields" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,
    "s3_permissive_parse" ->
      """SELECT p_partkey,
        |       TRY_CAST(CASE WHEN p_size % 3 = 0 THEN CAST(p_size AS VARCHAR)
        |                     ELSE p_type END AS INT) AS parsed
        |FROM part""".stripMargin,
    "s4_watermark_scan" ->
      s"""SELECT strftime(date_trunc('day', ts), '$DTS') AS day,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
         |GROUP BY 1""".stripMargin,
    "s7_gzip_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "s9_columnar_pivot" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
        |       l_extendedprice AS price
        |FROM lineitem""".stripMargin,
    "s10_pagination_union" ->
      """SELECT o_orderkey, CAST((rn - 1) // 1000 AS INT) AS page FROM (
        |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3000""".stripMargin,
    "s12_header_drop" ->
      """SELECT event_id FROM events
        |WHERE event_id > (SELECT min(event_id) FROM events)""".stripMargin,
    "p3_null_nan_skip" ->
      """SELECT event_id, v FROM (
        |  SELECT event_id,
        |         CASE WHEN event_type = 'error' THEN CAST('NaN' AS DOUBLE)
        |              WHEN event_type = 'signup' THEN NULL
        |              ELSE value END AS v
        |  FROM events)
        |WHERE v IS NOT NULL AND NOT isnan(v)""".stripMargin,
    "p4_id_filter" ->
      "SELECT event_id, user_id FROM events WHERE user_id = 7",
    "p5_status_filter" ->
      """SELECT event_id,
        |       CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status
        |FROM events
        |WHERE (CASE WHEN event_type = 'error' THEN 500 ELSE 200 END) = 200""".stripMargin,
    "p6_precision_filter" ->
      """SELECT event_id, value FROM events
        |WHERE abs(value - round(value, 1)) > 1e-9""".stripMargin,
    "p7_two_cond_filter" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderpriority != '5-LOW'""".stripMargin,
    "p8_allowlist_filter" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type IN ('view', 'click')""".stripMargin,
    "p9_sentinel_map" ->
      """SELECT event_id,
        |       CASE WHEN raw = 'inv' THEN -999.0
        |            ELSE CAST(raw AS DOUBLE) END AS measure
        |FROM (
        |  SELECT event_id,
        |         CASE WHEN event_type = 'error' THEN 'n/a'
        |              WHEN event_type = 'signup' THEN 'inv'
        |              ELSE CAST(event_id AS VARCHAR) END AS raw
        |  FROM events)
        |WHERE raw != 'n/a'""".stripMargin,
    "p10_empty_filter" ->
      """SELECT event_id FROM (
        |  SELECT event_id,
        |         CASE WHEN event_type = 'view' THEN ''
        |              ELSE CAST(event_id AS VARCHAR) END AS raw
        |  FROM events)
        |WHERE raw != ''""".stripMargin,
    "p11_time_range" ->
      """SELECT event_id FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
        |             AND TIMESTAMP '2024-01-25 00:00:00'""".stripMargin,
    "p12_zone_cutoff" ->
      """SELECT event_id FROM events
        |WHERE ts + INTERVAL 330 MINUTE > TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "p13_strip_nulls" ->
      """SELECT event_id,
        |       CASE WHEN event_type = 'error'
        |            THEN concat('{"a":', event_id, '}')
        |            ELSE concat('{"a":', event_id, ',"b":"', event_type, '"}')
        |       END AS doc
        |FROM events""".stripMargin,
    "p14_param_whitelist" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY 1""".stripMargin)
}
