package graft

import graft.ext.Behavior
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Int, String)]) =
    rows.toDF("user_id", "sec", "event_id", "event_type")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("event_type"))

  test("funnel: strict ordering, per-stage gating, tie-break on id") {
    // u1 completes all four; u2's view precedes its signup (stops at
    // stage 0 despite a later click); u3 skips click (stops at view);
    // u4 never signs up; u5/u6 pin tie semantics: same-ts events count
    // only when the tie column orders them after the prior stage.
    val events = ev(Seq(
      (1L, 10L, 1, "signup"), (1L, 20L, 2, "view"),
      (1L, 30L, 3, "click"), (1L, 40L, 4, "purchase"),
      (2L, 10L, 5, "view"), (2L, 20L, 6, "signup"), (2L, 30L, 7, "click"),
      (3L, 10L, 8, "signup"), (3L, 20L, 9, "view"), (3L, 30L, 10, "purchase"),
      (4L, 10L, 11, "view"), (4L, 20L, 12, "click"),
      (5L, 10L, 13, "signup"), (5L, 10L, 14, "view"),
      (6L, 10L, 16, "view"), (6L, 10L, 17, "signup")))
    val got = Behavior.funnelSteps(events, "user_id", "ts", "event_type",
        "event_id", Seq("signup", "view", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq === Seq(
      (0, "signup", 5L, 0.8333, None),        // u1 u2 u3 u5 u6 of 6 users
      (1, "view", 3L, 0.6, Some(6.67)),       // u1 u3 u5; gaps 10,10,0 s
      (2, "click", 1L, 0.3333, Some(10.0)),   // u1; 20→30
      (3, "purchase", 1L, 1.0, Some(10.0))))  // u1; 30→40
  }

  test("funnel rejects duplicate or empty step lists") {
    val events = ev(Seq((1L, 10L, 1, "a")))
    intercept[IllegalArgumentException] {
      Behavior.funnelSteps(events, "user_id", "ts", "event_type",
        "event_id", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Behavior.funnelSteps(events, "user_id", "ts", "event_type",
        "event_id", Seq.empty)
    }
  }

  test("transition matrix: per-user lag pairs, row-normalized") {
    // user A: a→b→b; user B: b→a.  Matrix: (a,b,1), (b,b,1), (b,a,1);
    // margins a=1, b=2.
    val events = ev(Seq(
      (1L, 10L, 1, "a"), (1L, 20L, 2, "b"), (1L, 30L, 3, "b"),
      (2L, 10L, 4, "b"), (2L, 20L, 5, "a")))
    val got = Behavior.transitionMatrix(events, "user_id", "ts",
        "event_type", "event_id")
      .orderBy("prev_type", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "b", 1L, 1.0), ("b", "a", 1L, 0.5), ("b", "b", 1L, 0.5)))
  }

  test("transition matrix orders ties by the tie column, not arrival") {
    // both events at the same ts: id order decides prev→next
    val events = ev(Seq(
      (1L, 10L, 2, "second"), (1L, 10L, 1, "first")))
    val got = Behavior.transitionMatrix(events, "user_id", "ts",
        "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("first", "second")))
  }

  test("session occupancy: sweep-line concurrency with touch-tie " +
    "close-before-open semantics") {
    // u1 [00:00, 00:40), u2 [00:20, 00:50), u3 [00:40, 01:10) —
    // u3 opens exactly as u1 closes: ends sort before starts at a tie,
    // so concurrency peaks at 2, never 3
    val events = ev(Seq(
      (1L, 0L, 1, "a"), (1L, 600L, 2, "a"),
      (2L, 1200L, 3, "a"),
      (3L, 2400L, 4, "a")))
    val got = Behavior.sessionOccupancy(events, "user_id", "ts")
      .orderBy("hour").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("1970-01-01 00", 3L, 2L, 2L),
      ("1970-01-01 01", 0L, 1L, 0L)))
  }

  test("occupancy plan has no global Window: the sweep rides " +
    "globalCumSum's range-partitioned prefix sums") {
    val events = ev(Seq(
      (1L, 0L, 1, "a"), (2L, 1200L, 2, "a")))
    val plan = Behavior.sessionOccupancy(events, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window("), s"unexpected window operator:\n$plan")
  }

  test("funnel plan shuffles the log once: a single user-exchange " +
    "feeds all cumulative windows") {
    val events = ev(Seq(
      (1L, 10L, 1, "signup"), (1L, 20L, 2, "view"),
      (2L, 10L, 3, "signup")))
    val plan = Behavior.funnelSteps(events, "user_id", "ts",
        "event_type", "event_id", Seq("signup", "view"))
      .queryExecution.executedPlan.toString
    val userExchanges = "hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges <= 1,
      s"expected at most one user_id exchange, got $userExchanges:\n$plan")
  }
}
