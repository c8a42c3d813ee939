package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics: ordered funnels and transition
  * matrices over an event log — the product-analytics pair of the
  * engine's events family (attribution x65, retention x66, silent keys
  * x67, rate anomalies x60/x70).  The reference pipeline has no event
  * sequencing (its per-device "windows" are tail slices,
  * `lovemyair.js:127`, `aernode.js:116-118`); these are the standard
  * large-log extensions of that per-key-ordered-slice idea.
  *
  * Scale shape (both operators): ONE shuffle — everything is windows
  * over `partitionBy(user)` sharing a single (ts, tie) sort, then
  * map-side-combinable aggregation of tiny keyed outputs (step counts /
  * a |types|² matrix).  No self-joins, no per-step passes over the log,
  * and nothing driver-side grows with the corpus.
  */
object Behavior {

  /** Strict-ordered funnel: for each user, stage k is reached at the
    * EARLIEST event of `steps(k)` that occurs strictly after (in
    * (ts, tie) order) some completion of stage k-1.  Emits one row per
    * step: (step, event_type, n_users, conversion, avg_sec_from_prev)
    * where `conversion` is n_users(step)/n_users(step-1) rounded to 4
    * decimals (step 0 converts from the full user universe) and
    * `avg_sec_from_prev` is the mean seconds between a user's stage
    * k-1 and stage k completions, over users reaching stage k (null
    * for step 0; rounded to 2 decimals — gaps accumulate as integer
    * microseconds inside a double partial sum, so the mean is exact
    * and order-independent while the summed gaps stay under 2^53 µs,
    * the double-mantissa bound — the same contract as
    * trainQualityModel's dyadic grid).
    *
    * "Strictly after" is sort-order-after — an event at the same
    * timestamp as the prior stage's completion counts only if its
    * tie-break column orders it later.  That makes the operator
    * deterministic under timestamp ties (the x65 max-click-id
    * discipline) and exactly replayable: the per-row "earliest
    * completion so far" is `min(...) over (user, ORDER BY ts, tie
    * ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`, standard SQL both
    * engines execute identically.
    *
    * Physical plan: the k cumulative windows all share one
    * WindowSpec, so Catalyst plans a single Exchange(user) + Sort and
    * stacks the Window operators on it; the final per-user collapse is
    * a hash aggregate with map-side partials and the step table is k
    * rows.  At 100 TB the log crosses the network once. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct == steps, s"steps must be distinct (got $steps)")
    // both quote AND backslash would corrupt the generated stack()
    // literal below (Spark processes escape sequences in SQL string
    // literals, so 'a\' parses wrong even with quotes rejected)
    require(steps.forall(s => !s.contains("'") && !s.contains("\\")),
      s"step names must not contain quotes or backslashes (got $steps)")
    val u = col(userCol); val ts = col(tsCol); val et = col(typeCol)
    val before = Window.partitionBy(u).orderBy(ts, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // qk = this row completes stage k (at this row's ts); built
    // iteratively: stage k needs min(q_{k-1}) over strictly-prior rows.
    var df = events.withColumn("__q0", when(et === steps.head, ts))
    for (k <- 1 until steps.length) {
      df = df
        .withColumn(s"__m${k - 1}", min(col(s"__q${k - 1}")).over(before))
        .withColumn(s"__q$k",
          when(et === steps(k) && col(s"__m${k - 1}").isNotNull, ts))
    }
    val perUser = df.groupBy(u).agg(
      min(col("__q0")).as("__t0"),
      (1 until steps.length).map(k => min(col(s"__q$k")).as(s"__t$k")): _*)
    val counts = perUser.agg(
      count(lit(1)).as("__n_users"),
      steps.indices.map(k =>
        sum(when(col(s"__t$k").isNotNull, 1L).otherwise(0L)).as(s"__n$k")) ++
      (1 until steps.length).map(k =>
        // t_k non-null implies t_{k-1} non-null (stage gating), so the
        // mean is over exactly the users reaching stage k
        round(avg(unix_micros(col(s"__t$k"))
            - unix_micros(col(s"__t${k - 1}"))) / 1000000.0, 2)
          .as(s"__g$k")): _*)
    val stacked = counts.select(expr(
      "stack(" + steps.length + ", " +
        steps.indices.map(k =>
          s"$k, '${steps(k)}', __n$k, " +
            (if (k == 0) "__n_users" else s"__n${k - 1}") + ", " +
            (if (k == 0) "CAST(NULL AS DOUBLE)" else s"__g$k"))
          .mkString(", ") +
        ") as (step, event_type, n_users, __prev, avg_sec_from_prev)"))
    stacked.select(col("step").cast("int").as("step"), col("event_type"),
      col("n_users"),
      // guard: an empty prior stage has no defined conversion (and
      // ANSI mode would throw on the division)
      when(col("__prev") > 0,
        round(col("n_users").cast("double") / col("__prev"), 4))
        .as("conversion"),
      col("avg_sec_from_prev"))
  }

  /** Concurrent-session occupancy: the sweep-line concurrency curve of
    * gap-sessionized activity, aggregated per hour — (hour, n_starts,
    * n_ends, max_concurrent).  "How many sessions were open at once"
    * is the load/capacity number a 100 TB event log gets asked for,
    * and the naive forms are both scale-broken: an interval self-join
    * is O(n²), a global ORDER BY window is one task.  The sweep-line
    * form is neither: sessions → ±1 boundary rows → ONE
    * [[CorpusStats.globalCumSum]] (range-repartitioned prefix sums +
    * broadcast per-partition offsets — no corpus-wide window) → tiny
    * per-hour aggregate.
    *
    * Tie semantics: boundaries order by (ts, delta), so a session
    * ending exactly when another starts closes first (touching
    * sessions never double-count).  Sessions follow
    * `session_window(ts, gap)` exactly (st6): end = last event + gap,
    * end-exclusive.  `max_concurrent` is the max over the curve AT
    * boundary points within the hour; an hour with no boundary events
    * carries the previous level and emits no row (documented — the
    * curve is piecewise constant between boundaries). */
  def sessionOccupancy(events: DataFrame, userCol: String, tsCol: String,
                       gap: String = "30 minutes"): DataFrame = {
    val sessions = events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("__w"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__w.start").as("__st"), col("__w.end").as("__en"))
    val bounds = sessions.select(col("__st").as("ts"), lit(1L).as("delta"))
      .unionByName(sessions.select(col("__en").as("ts"),
        lit(-1L).as("delta")))
    val curve = graft.ext.CorpusStats.globalCumSum(bounds,
      Seq(col("ts"), col("delta")), "delta", cumName = "concurrent")
    curve
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH").as("hour"))
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"),
        max(col("concurrent")).as("max_concurrent"))
  }

  /** First-order transition matrix of the event log: counts of
    * consecutive (prev_type → event_type) pairs within each user's
    * (ts, tie)-ordered stream, plus the row-normalized transition
    * probability.  Output: (prev_type, event_type, n, p) with `p`
    * rounded to 4 decimals — the Markov-chain summary used for
    * navigation analysis and for sanity-checking synthetic event
    * generators (a near-uniform matrix flags an order-free generator).
    *
    * Physical plan: one Exchange(user) + Sort feeding `lag`, then a
    * |types|²-row hash aggregate (map-side partials); the margin
    * normalization is a window over that TINY aggregate, so the log
    * itself shuffles exactly once — a margins join would re-run the
    * whole lag lineage a second time.  Nothing else scales with the
    * corpus. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev_type"), col("event_type"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))), 4)
          .as("p"))
  }
}
