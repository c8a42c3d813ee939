package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Activity-rate anomaly detection: flag (key, window) buckets whose
  * event count is a z-score outlier against that key's own history —
  * the data-quality monitor a large ingest pipeline runs continuously
  * (a provider suddenly posting 10× its usual volume is either an
  * incident or a duplication bug; both need surfacing, reference
  * analog: the count-compare warning `clarity.js:151-160` generalized
  * from one batch to a per-key baseline).
  *
  * Determinism across engines: mean and variance are derived from
  * exact integer sums (`Σn`, `Σn²`) with one fixed arithmetic shape —
  * `var = ss/k − (s/k)²` — so the oracle computes bit-identical
  * doubles; the z-score rounds before the threshold filter, so the
  * boundary decision is replayable too.
  *
  * Scale shape: two grouped aggregations (map-side partials) — the
  * second collapses to #keys rows, and the join back to bucket counts
  * broadcasts it.  Nothing is ever data-sized after the first agg; no
  * windows, no driver-side state.  Zero-activity buckets are absent by
  * construction (baseline = the key's ACTIVE windows); a calendar
  * left-join densification is the caller's composition when silence
  * itself is the anomaly. */
object Anomaly {

  /** Tumbling-window event counts per key — the shared first stage
    * (and, in the streaming composition, the only stateful one). */
  def windowCounts(events: DataFrame, tsCol: String, keyCol: String,
                   windowDur: String): DataFrame =
    events.groupBy(
        window(col(tsCol), windowDur).getField("start").as("w"),
        col(keyCol).as("k"))
      .agg(count(lit(1)).as("n"))

  /** Per-key first/second moments over windowed counts: #keys rows,
    * broadcastable — in a monitoring deployment this is the table you
    * persist from history and probe with each closed window. */
  def keyStats(counts: DataFrame): DataFrame =
    counts.groupBy(col("k"))
      .agg(count(lit(1)).as("kd"),
        sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))

  /** z-score windowed counts against broadcast per-key stats and keep
    * the |z| >= minZ outliers.  Stateless past the inputs — per
    * micro-batch this is a codegen'd broadcast join + filter. */
  def zScores(counts: DataFrame, stats: DataFrame,
              minZ: Double): DataFrame = {
    require(minZ > 0, s"minZ must be positive (got $minZ)")
    counts.join(broadcast(stats), "k")
      .withColumn("mean", col("s").cast("double") / col("kd"))
      .withColumn("__var",
        col("ss").cast("double") / col("kd") - col("mean") * col("mean"))
      .filter(col("__var") > 0) // constant-rate keys have no outliers
      .withColumn("z",
        round((col("n") - col("mean")) / sqrt(col("__var")), 6))
      .filter(abs(col("z")) >= minZ)
      .select(col("w"), col("k"), col("n"), round(col("mean"), 6).as("mean"),
        col("z"))
  }

  /** Flag (key, window) outliers in `events`.
    *
    * Baseline choice: by default stats come from the SAME window grid
    * being probed (self-baselining).  That is correct for "unusual
    * relative to this run" but has a blind spot a monitoring user may
    * not expect: a key whose rate shifts PERMANENTLY from window 1
    * shifts its own mean/variance with it and is never flagged (in the
    * extreme, a constant new rate has zero variance and is filtered
    * outright).  Pass `statsFrom = Some(history)` — an events
    * DataFrame with the same schema, e.g. last month's corpus — to
    * probe against a FROZEN baseline instead: stats come only from the
    * history, so a persistent shift stays an outlier in every probed
    * window.  Keys absent from the history drop out of the join (no
    * baseline → no z-score), matching the self-baseline behavior for
    * history-less keys. */
  def keyRateAnomalies(events: DataFrame, tsCol: String, keyCol: String,
                       windowDur: String, minZ: Double,
                       statsFrom: Option[DataFrame] = None): DataFrame = {
    val counts = windowCounts(events, tsCol, keyCol, windowDur)
    val stats = keyStats(statsFrom.fold(counts)(h =>
      windowCounts(h, tsCol, keyCol, windowDur)))
    zScores(counts, stats, minZ)
  }

  /** Silence detection — the half of the monitor [[zScores]] cannot
    * see: zero-activity windows are ABSENT from the count grid, so a
    * key that stops reporting never produces a low z-score row.  This
    * flags keys with history whose last active window predates the
    * corpus' latest one, with their historical mean for triage (a
    * silent high-volume key is the incident; a silent stray is noise).
    *
    * Scale shape: the per-key agg collapses the count grid to #keys
    * rows; the latest-window bound attaches as a single-row broadcast.
    * (Reference analog: a provider that stops posting is exactly the
    * missing-station report of `clarity.js:168-171`, lifted from one
    * batch to the time axis.) */
  def silentKeys(events: DataFrame, tsCol: String, keyCol: String,
                 windowDur: String): DataFrame = {
    val counts = windowCounts(events, tsCol, keyCol, windowDur)
    val latest = counts.agg(max(col("w")).as("__mw"))
    counts.crossJoin(broadcast(latest))
      .groupBy(col("k"), col("__mw"))
      .agg(max(col("w")).as("last_seen"), count(lit(1)).as("kd"),
        sum(col("n")).as("s"))
      .filter(col("last_seen") < col("__mw"))
      .select(col("k"), col("last_seen"),
        round(col("s").cast("double") / col("kd"), 6).as("mean_n"))
  }
}
