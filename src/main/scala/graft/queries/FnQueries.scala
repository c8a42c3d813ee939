package graft.queries

import graft.{Q, Tables}
import graft.functions.ColumnFns
import org.apache.spark.sql.functions._

/** Scalar functions (SURVEY §2.7, F1–F17), sinks (§2.8, K1–K7 — their
  * data-plane selections), and scheduled-micro-batch semantics (§2.9) as
  * batch-window equivalents.  Each query exercises the reusable
  * implementations in [[graft.functions.ColumnFns]].
  */
object FnQueries {
  private val TS = "yyyy-MM-dd HH:mm:ss"
  private val DTS = "%Y-%m-%d %H:%M:%S"

  val qs: Map[String, Q] = Map(
    // F1 unit normalization (measurand.js:19-36) through ColumnFns
    "f1_unit_normalize" -> ((s, d) => {
      val unit = when(col("user_id") % 5 === 0, "ppb")
        .when(col("user_id") % 5 === 1, "ng/m³")
        .when(col("user_id") % 5 === 2, "pp100ml")
        .when(col("user_id") % 5 === 3, "pa")
        .otherwise("ppm")
      Tables.events(s, d)
        .withColumn("unit", unit)
        .select(col("event_id"),
          ColumnFns.normalizeValue(col("unit"), col("value")).as("measure"),
          ColumnFns.normalizeUnit(col("unit")).as("unit"))
    }),

    // F2/F3 id synthesis "{source}-{node}-{parameter}" (purpleair.js:63)
    "f2_id_synthesis" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        ColumnFns.synthId(lit("src"), col("user_id"), col("event_type"))
          .as("sensor_id"))),

    // F4 camelize header normalization (utils.js:131-140)
    "f4_camelize" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        ColumnFns.camelize(
          concat(col("event_type"), lit("_"), col("event_type"), lit("_id")))
          .as("camel"))),

    // F5 comma-strip numeric parse (airqoon.js:93)
    "f5_comma_parse" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        ColumnFns.parseCommaNumber(
          concat(col("l_orderkey").cast("string"), lit(","),
                 col("l_linenumber").cast("string"))).as("parsed"))),

    // F6 epoch / ISO conversions (smartsense.js:122, providers.js:146)
    "f6_epoch_iso" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        ColumnFns.toEpochSeconds(col("o_orderdate")).as("epoch_s"),
        ColumnFns.toIso(col("o_orderdate")).as("iso"))),

    // F7 tz-aware strict parse − 15 min, America/New_York → UTC (cmu.js:211-219)
    "f7_tz_parse" -> ((s, d) => {
      val localStr = date_format(col("o_orderdate"), "yyyy-MM-dd HH_mm")
      val parsed = to_timestamp(localStr, "yyyy-MM-dd HH_mm")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        unix_timestamp(ColumnFns.localToUtcShifted(parsed, "America/New_York"))
          .as("utc_epoch"))
    }),

    // F9 hour-beginning → hour-ending (iqair.js:142, airgradient.js:161-163)
    "f9_hour_ending" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        date_format(ColumnFns.hourEnding(date_trunc("hour", col("ts"))), TS)
          .as("hour_ending"))),

    // F10 month-range generation (cmu.js:126-135; test/cmu.test.js:8-39)
    "f10_month_range" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(min(col("o_orderdate")).as("from"), max(col("o_orderdate")).as("to"))
        .select(explode(ColumnFns.monthSequence(col("from"), col("to")))
          .as("month"))),

    // F11 previous-day math incl. month boundary (iqair.js:24-26)
    "f11_prev_day" -> ((s, d) =>
      Tables.events(s, d)
        .select(date_format(
          date_trunc("day", col("ts")) - expr("INTERVAL 1 DAY"), "yyyy-MM-dd")
          .as("prev_day"))
        .distinct()),

    // F12 space→'T' timestamp fix (miri.js:140)
    "f12_space_to_t" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        ColumnFns.spaceToT(date_format(col("o_orderdate"), TS)).as("iso_t"))),

    // F13 melt / unpivot — THE core reshape (airgradient.js:164-170 etc.)
    "f13_melt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .selectExpr("l_orderkey", "l_linenumber",
          "stack(3, 'quantity', l_quantity, 'discount', l_discount, " +
            "'tax', l_tax) AS (parameter, value)")),

    // F15 lat/lon string split (miri.js:123)
    "f15_latlon_split" -> ((s, d) => {
      val arr = ColumnFns.splitLatLon(
        concat(col("n_nationkey").cast("string"), lit(","),
               col("n_regionkey").cast("string")))
      Tables.nation(s, d).select(
        col("n_nationkey"),
        arr.getItem(0).as("lat"), arr.getItem(1).as("lon"))
    }),

    // F16 timezone from coordinates (senstate.js:67) — nautical approximation
    "f16_tz_from_lon" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        ColumnFns.tzFromLon(col("c_custkey") % 360 - 180).as("tz"))),

    // F16 real polygon lookup: broadcast grid-indexed zone dim +
    // codegen ray-cast point-in-polygon, nautical fallback off-zone.
    // Round 8: runs against the bundled ~230-zone world extract (the
    // dense dim), not the 5-polygon synthetic table — land points
    // resolve to real IANA zones, nautical only at sea.
    "f16b_tz_polygon" -> ((s, d) =>
      graft.functions.GeoTz.tzForPoints(
        Tables.customer(s, d).select(col("c_custkey"),
          (col("c_custkey") % 360 - 180).cast("double").as("lon"),
          (col("c_custkey") % 160 - 80).cast("double").as("lat")),
        "c_custkey", "lon", "lat",
        zs = graft.functions.GeoTz.denseWorldZones)),

    // F17 JSON serialize (providers.js:99)
    "f17_to_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("t")))
          .as("doc"))),

    // K1 station diff-write selection: content-hash CDC (providers.js:94-132)
    "k1_diff_write" -> ((s, d) => {
      val all = Tables.orders(s, d)
      def snap(cutoff: String) = all
        .filter(col("o_orderdate") < lit(cutoff))
        .select(col("o_orderkey"),
          md5(concat_ws("|", col("o_orderstatus"), col("o_orderpriority")))
            .as("content_hash"))
      val existing = snap("1997-01-01")
        .withColumnRenamed("content_hash", "old_hash")
      val incoming = snap("1999-01-01")
      incoming.join(existing, Seq("o_orderkey"), "left")
        .filter(col("old_hash").isNull || col("content_hash") =!= col("old_hash"))
        .select(col("o_orderkey"), col("content_hash"))
    }),

    // K2 measures CSV line rendering (measure.js:34-43)
    "k2_csv_lines" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        concat_ws(",",
          ColumnFns.synthId(lit("src"), col("user_id"), col("event_type")),
          format_string("%.2f", col("value")),
          date_format(col("ts"), TS)).as("line"))),

    // K3 v0.1 JSON envelope (clarity.js:177-190, providers.js:168-185)
    "k3_envelope" -> ((s, d) =>
      Tables.events(s, d)
        .agg(count(lit(1)).as("n"),
          date_format(min(col("ts")), TS).as("from_ts"),
          date_format(max(col("ts")), TS).as("to_ts"))
        .select(to_json(struct(
          lit("v0.1").as("schema"), lit("events").as("source"),
          lit("ingest-id").as("matching_method"),
          col("n"), col("from_ts"), col("to_ts"))).as("envelope"))),

    // K7 empty-batch guard (providers.js:142-144): HAVING-style gate
    "k7_empty_guard" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value") > 200)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 0)),

    // §2.9 tumbling-window micro-batch aggregation (Trigger per frequency)
    "st1_hourly_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(date_format(col("w.start"), TS).as("window_start"),
          col("event_type"), col("n"), col("sum_v"))),

    // §2.9 late-data lookback re-read + idempotent dedup (airgradient.js:137-141)
    "st2_late_dedup" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val lookback = base.filter(col("ts") >= lit("2024-01-28 00:00:00"))
      base.unionByName(lookback)
        .dropDuplicates("event_id")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TS).as("ts_s"))
    }),

    // §2.9 sliding-window (2h window, 1h slide) aggregation
    "st3_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), TS).as("window_start"),
          col("n"))),

    // §2.9 session windows: per-user activity sessions with a 30-min
    // inactivity gap (session end = last event + gap; an event at
    // EXACTLY the gap still extends the session — pinned by
    // StreamingSpec; the oracle replays the break rule via
    // gaps-and-islands on the same µs-floored timestamps)
    "st6_session_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_v"))
        .select(col("user_id"),
          date_format(col("w.start"), TS).as("session_start"),
          date_format(col("w.end"), TS).as("session_end"),
          col("n_events"), col("sum_v"))),

    // §2.9 + sketches: per-window distinct users via the md5 HLL
    // aggregate — the streaming cardinality shape (256 B of state per
    // window vs a distinct-user hash table; max-merge partials are
    // exactly what a stateful streaming agg stores).  Estimate and
    // exact side-by-side; stream ≡ batch pinned in StreamingSpec.
    "st7_hll_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(round(graft.plans.HllAgg.hllAgg(col("user_id")), 4)
            .as("est_users"),
          countDistinct(col("user_id")).as("n_exact"))
        .select(date_format(col("w.start"), TS).as("window_start"),
          col("est_users"), col("n_exact"))),

    // §2.9 + sketches: per-window heavy hitters — one composite-keyed
    // Count-Min sketch prefilters (window, user) groups, exact verify
    // on the sliver; output is sketch-independent (x46 windowed).
    // Stream ≡ batch pinned in StreamingSpec.
    "st8_cms_window_hh" -> ((s, d) =>
      graft.streaming.Streams.windowedHeavyHitters(
        Tables.events(s, d), "ts", "user_id", "1 day", minFreq = 6L)
        .select(date_format(col("w"), TS).as("window_start"),
          col("k").as("user_id"), col("n"))),

    // per-key activity-rate anomalies: daily buckets z-scored against
    // each user's own history (exact-integer-sum moments → replayable
    // doubles; #keys-row broadcast join)
    "x60_rate_anomaly" -> ((s, d) =>
      graft.ext.Anomaly.keyRateAnomalies(
        Tables.events(s, d), "ts", "user_id", "1 day", minZ = 2.0)
        .select(date_format(col("w"), TS).as("window_start"),
          col("k").as("user_id"), col("n"), col("mean"), col("z"))),

    // silence detection: keys with history but no events in the
    // corpus' latest daily window — the gap the z-score can't see
    "x67_silent_keys" -> ((s, d) =>
      graft.ext.Anomaly.silentKeys(
        Tables.events(s, d), "ts", "user_id", "1 day")
        .select(col("k").as("user_id"),
          date_format(col("last_seen"), TS).as("last_seen"),
          col("mean_n"))),

    // reference-window mode: the second half of the corpus z-scored
    // against a FROZEN first-half baseline — a permanent rate shift
    // stays flagged in every probed window instead of absorbing into
    // its own statistics (x60's self-baselining blind spot)
    "x70_anomaly_refwindow" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      graft.ext.Anomaly.keyRateAnomalies(
        ev.filter(col("ts") >= cut), "ts", "user_id", "1 day",
        minZ = 1.5, statsFrom = Some(ev.filter(col("ts") < cut)))
        .select(date_format(col("w"), TS).as("window_start"),
          col("k").as("user_id"), col("n"), col("mean"), col("z"))
    }))

  /** F16 polygon-lookup oracle: the zone dim inlines as VALUES from the
    * same [[graft.functions.GeoTz.zones]] constants, and the ray-cast
    * replays [[graft.plans.PointInPolygon]]'s float expression with
    * identical operand order (edge = vertex i vs previous vertex), so
    * in/out decisions are bit-identical.  The polygon data has no
    * horizontal edges, so the non-short-circuiting CASE never divides
    * by zero. */
  private val f16bSql: String = {
    // the SAME dense dim the Spark query uses — the oracle replays all
    // ~230 ray-casts; min(tz) keeps overlap resolution deterministic
    val polyValues = graft.functions.GeoTz.denseWorldZones
      .map { case (tz, xs, ys) =>
        s"('$tz', [${xs.mkString(", ")}], [${ys.mkString(", ")}])"
      }.mkString(",\n  ")
    val prev = "CASE WHEN i = 1 THEN len(xs) ELSE i - 1 END"
    s"""WITH pts AS (SELECT c_custkey,
       |               CAST(c_custkey % 360 - 180 AS DOUBLE) AS px,
       |               CAST(c_custkey % 160 - 80 AS DOUBLE) AS py
       |             FROM customer),
       |polys(tz, xs, ys) AS (VALUES
       |  $polyValues),
       |cr AS (SELECT c_custkey, tz,
       |         list_sum(list_transform(generate_series(1, len(xs)), i ->
       |           CASE WHEN ((ys[i] > py) <> (ys[$prev] > py))
       |                 AND px < (xs[$prev] - xs[i]) * (py - ys[i])
       |                          / (ys[$prev] - ys[i]) + xs[i]
       |           THEN 1 ELSE 0 END)) AS k
       |       FROM pts CROSS JOIN polys),
       |m AS (SELECT c_custkey, min(tz) AS ptz FROM cr WHERE k % 2 = 1
       |      GROUP BY 1)
       |SELECT p.c_custkey,
       |       coalesce(m.ptz,
       |         concat('UTC', CASE WHEN o >= 0 THEN concat('+', o)
       |                            ELSE CAST(o AS VARCHAR) END)) AS tz
       |FROM (SELECT c_custkey, CAST(round(px / 15.0, 0) AS INT) AS o
       |      FROM pts) p
       |LEFT JOIN m USING (c_custkey)""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "f1_unit_normalize" ->
      """SELECT event_id,
        |       CASE WHEN user_id % 5 = 0 THEN value / 1000
        |            WHEN user_id % 5 = 1 THEN value / 1000
        |            WHEN user_id % 5 = 2 THEN value / 100
        |            WHEN user_id % 5 = 3 THEN value / 100
        |            ELSE value END AS measure,
        |       CASE WHEN user_id % 5 = 0 THEN 'ppm'
        |            WHEN user_id % 5 = 1 THEN 'µg/m³'
        |            WHEN user_id % 5 = 2 THEN 'particles/cm³'
        |            WHEN user_id % 5 = 3 THEN 'hpa'
        |            ELSE 'ppm' END AS unit
        |FROM events""".stripMargin,
    "f2_id_synthesis" ->
      """SELECT event_id,
        |       concat_ws('-', 'src', user_id, event_type) AS sensor_id
        |FROM events""".stripMargin,
    "f4_camelize" ->
      """SELECT event_id,
        |       event_type || upper(substr(event_type, 1, 1))
        |         || substr(event_type, 2) || 'Id' AS camel
        |FROM events""".stripMargin,
    "f5_comma_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(replace(concat(l_orderkey, ',', l_linenumber), ',', '')
        |            AS DOUBLE) AS parsed
        |FROM lineitem""".stripMargin,
    "f6_epoch_iso" ->
      """SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso
        |FROM orders""".stripMargin,
    "f7_tz_parse" ->
      """SELECT o_orderkey,
        |       CAST(epoch(timezone('America/New_York',
        |           strptime(strftime(o_orderdate, '%Y-%m-%d %H_%M'),
        |                    '%Y-%m-%d %H_%M')
        |           - INTERVAL 15 MINUTE)) AS BIGINT) AS utc_epoch
        |FROM orders""".stripMargin,
    "f9_hour_ending" ->
      s"""SELECT event_id,
         |       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '$DTS')
         |         AS hour_ending
         |FROM events""".stripMargin,
    "f10_month_range" ->
      """SELECT strftime(unnest(generate_series(
        |    date_trunc('month', (SELECT min(o_orderdate) FROM orders)),
        |    date_trunc('month', (SELECT max(o_orderdate) FROM orders)),
        |    INTERVAL 1 MONTH)), '%Y-%m') AS month""".stripMargin,
    "f11_prev_day" ->
      """SELECT DISTINCT strftime(date_trunc('day', ts) - INTERVAL 1 DAY,
        |                         '%Y-%m-%d') AS prev_day
        |FROM events""".stripMargin,
    "f12_space_to_t" ->
      s"""SELECT o_orderkey,
         |       replace(strftime(o_orderdate, '$DTS'), ' ', 'T') AS iso_t
         |FROM orders""".stripMargin,
    "f13_melt" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS parameter,
        |       l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem""".stripMargin,
    "f15_latlon_split" ->
      """SELECT n_nationkey,
        |       CAST(string_split(concat(n_nationkey, ',', n_regionkey), ',')[1]
        |            AS DOUBLE) AS lat,
        |       CAST(string_split(concat(n_nationkey, ',', n_regionkey), ',')[2]
        |            AS DOUBLE) AS lon
        |FROM nation""".stripMargin,
    "f16_tz_from_lon" ->
      """SELECT c_custkey,
        |       concat('UTC', CASE WHEN o >= 0 THEN concat('+', o)
        |                          ELSE CAST(o AS VARCHAR) END) AS tz
        |FROM (
        |  SELECT c_custkey,
        |         CAST(round((c_custkey % 360 - 180) / 15.0, 0) AS INT) AS o
        |  FROM customer)""".stripMargin,
    "f16b_tz_polygon" -> f16bSql,
    "f17_to_json" ->
      """SELECT event_id,
        |       concat('{"id":', event_id, ',"t":"', event_type, '"}') AS doc
        |FROM events""".stripMargin,
    "k1_diff_write" ->
      """SELECT i.o_orderkey, i.content_hash FROM (
        |  SELECT o_orderkey,
        |         md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS content_hash
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01') i
        |LEFT JOIN (
        |  SELECT o_orderkey,
        |         md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS old_hash
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01') e
        |  ON i.o_orderkey = e.o_orderkey
        |WHERE e.old_hash IS NULL OR i.content_hash != e.old_hash""".stripMargin,
    "k2_csv_lines" ->
      s"""SELECT event_id,
         |       concat_ws(',', concat_ws('-', 'src', user_id, event_type),
         |                 printf('%.2f', value),
         |                 strftime(ts, '$DTS')) AS line
         |FROM events""".stripMargin,
    "k3_envelope" ->
      s"""SELECT concat('{"schema":"v0.1","source":"events",',
         |              '"matching_method":"ingest-id",',
         |              '"n":', CAST(count(*) AS BIGINT),
         |              ',"from_ts":"', strftime(min(ts), '$DTS'),
         |              '","to_ts":"', strftime(max(ts), '$DTS'), '"}')
         |         AS envelope
         |FROM events""".stripMargin,
    "k7_empty_guard" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE value > 200
        |GROUP BY 1 HAVING count(*) > 0""".stripMargin,
    "st1_hourly_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', ts), '$DTS') AS window_start,
         |       event_type, CAST(count(*) AS BIGINT) AS n,
         |       round(sum(value), 2) AS sum_v
         |FROM events GROUP BY 1, 2""".stripMargin,
    "st2_late_dedup" ->
      s"""SELECT event_id, user_id, strftime(ts, '$DTS') AS ts_s
         |FROM events""".stripMargin,
    "st3_sliding_window" ->
      s"""SELECT strftime(ws, '$DTS') AS window_start, CAST(count(*) AS BIGINT) AS n
         |FROM (
         |  SELECT date_trunc('hour', ts) AS ws FROM events
         |  UNION ALL
         |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
         |GROUP BY 1""".stripMargin,
    // epoch-aligned 6h buckets mirror Spark's window(); the HLL replay
    // is the x48 pattern grouped by window (hex-digit registers, Σ in
    // bucket order, exact 2^-r doubles)
    "st7_hll_window" ->
      s"""WITH e AS (SELECT make_timestamp(
         |             epoch_ns(ts) // 1000 // 21600000000 * 21600000000)
         |             AS w, user_id
         |           FROM events),
         |dt AS (SELECT DISTINCT w, CAST(user_id AS VARCHAR) AS v FROM e),
         |p AS (SELECT w, md5(v) AS h,
         |        len(regexp_extract(substr(md5(v), 3, 12), '^0*')) AS z
         |      FROM dt),
         |r AS (SELECT w,
         |        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         |          + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
         |          AS bucket,
         |        max(4 * z
         |          + CASE WHEN z = 12 THEN 0
         |                 WHEN substr(h, 3 + z, 1) = '1' THEN 3
         |                 WHEN substr(h, 3 + z, 1) IN ('2', '3') THEN 2
         |                 WHEN substr(h, 3 + z, 1) IN ('4', '5', '6', '7')
         |                   THEN 1
         |                 ELSE 0 END + 1) AS rho
         |      FROM p GROUP BY 1, 2),
         |grid AS (SELECT s.w, gs.j AS bucket
         |         FROM (SELECT DISTINCT w FROM e) s
         |         CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS j) gs),
         |fullr AS (SELECT g.w, g.bucket, coalesce(r.rho, 0) AS rho
         |          FROM grid g
         |          LEFT JOIN r ON g.w = r.w AND g.bucket = r.bucket),
         |agg AS (SELECT w,
         |          list_sum(list_transform(list(rho ORDER BY bucket),
         |            x -> power(2::DOUBLE, -x))) AS s,
         |          len(list_filter(list(rho ORDER BY bucket),
         |            x -> x = 0)) AS v
         |        FROM fullr GROUP BY 1),
         |est AS (SELECT w,
         |          0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / 256)
         |            * 256 * 256 / s AS raw, v
         |        FROM agg),
         |ex AS (SELECT w, count(DISTINCT user_id) AS n_exact
         |       FROM e GROUP BY 1)
         |SELECT strftime(est.w, '$DTS') AS window_start,
         |       round(CASE WHEN raw <= 2.5::DOUBLE * 256 AND v > 0
         |                  THEN 256 * ln(256::DOUBLE / v) ELSE raw END, 4)
         |         AS est_users,
         |       ex.n_exact
         |FROM est JOIN ex ON est.w = ex.w""".stripMargin,
    // exact replay — the CMS prefilter is output-invisible (one-sided
    // error + exact verify); epoch-aligned 1-day buckets mirror window()
    "st8_cms_window_hh" ->
      s"""WITH e AS (SELECT make_timestamp(
         |             epoch_ns(ts) // 1000 // 86400000000 * 86400000000)
         |             AS w, user_id
         |           FROM events)
         |SELECT strftime(w, '$DTS') AS window_start, user_id,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM e GROUP BY 1, 2 HAVING count(*) >= 6""".stripMargin,
    // same fixed arithmetic shape as the engine: var = ss/k - (s/k)^2
    // over exact integer sums, z rounded BEFORE the threshold
    "x60_rate_anomaly" ->
      s"""WITH e AS (SELECT make_timestamp(
         |             epoch_ns(ts) // 1000 // 86400000000 * 86400000000)
         |             AS w, user_id
         |           FROM events),
         |c AS (SELECT w, user_id, count(*) AS n FROM e GROUP BY 1, 2),
         |s AS (SELECT user_id, count(*) AS kd, sum(n) AS s,
         |             sum(n * n) AS ss
         |      FROM c GROUP BY 1),
         |j AS (SELECT c.w, c.user_id, c.n,
         |        s.s::DOUBLE / s.kd AS mean,
         |        s.ss::DOUBLE / s.kd
         |          - (s.s::DOUBLE / s.kd) * (s.s::DOUBLE / s.kd) AS v
         |      FROM c JOIN s ON c.user_id = s.user_id)
         |SELECT strftime(w, '$DTS') AS window_start, user_id,
         |       CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
         |       round((n - mean) / sqrt(v), 6) AS z
         |FROM j WHERE v > 0
         |  AND abs(round((n - mean) / sqrt(v), 6)) >= 2""".stripMargin,
    // frozen baseline: stats ONLY from pre-cutoff windows, probe only
    // post-cutoff ones; same exact-integer-moment arithmetic as x60
    "x70_anomaly_refwindow" ->
      s"""WITH e AS (SELECT make_timestamp(
         |             epoch_ns(ts) // 1000 // 86400000000 * 86400000000)
         |             AS w, user_id
         |           FROM events),
         |c AS (SELECT w, user_id, count(*) AS n FROM e
         |      WHERE w >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2),
         |h AS (SELECT w, user_id, count(*) AS n FROM e
         |      WHERE w < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2),
         |s AS (SELECT user_id, count(*) AS kd, sum(n) AS s,
         |             sum(n * n) AS ss
         |      FROM h GROUP BY 1),
         |j AS (SELECT c.w, c.user_id, c.n,
         |        s.s::DOUBLE / s.kd AS mean,
         |        s.ss::DOUBLE / s.kd
         |          - (s.s::DOUBLE / s.kd) * (s.s::DOUBLE / s.kd) AS v
         |      FROM c JOIN s ON c.user_id = s.user_id)
         |SELECT strftime(w, '$DTS') AS window_start, user_id,
         |       CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
         |       round((n - mean) / sqrt(v), 6) AS z
         |FROM j WHERE v > 0
         |  AND abs(round((n - mean) / sqrt(v), 6)) >= 1.5""".stripMargin,
    "x67_silent_keys" ->
      s"""WITH e AS (SELECT make_timestamp(
         |             epoch_ns(ts) // 1000 // 86400000000 * 86400000000)
         |             AS w, user_id
         |           FROM events),
         |c AS (SELECT w, user_id, count(*) AS n FROM e GROUP BY 1, 2),
         |mx AS (SELECT max(w) AS mw FROM c)
         |SELECT user_id, strftime(max(w), '$DTS') AS last_seen,
         |       round(sum(n)::DOUBLE / count(*), 6) AS mean_n
         |FROM c, mx GROUP BY user_id, mw
         |HAVING max(w) < mw""".stripMargin,
    // gaps-and-islands replay of session_window: same µs-floored
    // timestamps (make_timestamp mirrors Tables.events' nanos→µs
    // floor), break iff gap STRICTLY exceeds 30 min (an event at
    // exactly the gap extends the session — pinned by StreamingSpec)
    "st6_session_agg" ->
      s"""WITH e AS (SELECT user_id,
         |             make_timestamp(epoch_ns(ts) // 1000) AS ts, value
         |           FROM events),
         |m AS (SELECT user_id, ts, value,
         |        CASE WHEN lag(ts) OVER w IS NULL
         |             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         |        THEN 1 ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                               ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM m)
         |SELECT user_id, strftime(min(ts), '$DTS') AS session_start,
         |       strftime(max(ts) + INTERVAL 30 MINUTE, '$DTS')
         |         AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       round(sum(value), 2) AS sum_v
         |FROM s GROUP BY user_id, sid""".stripMargin)
}
