package graft

import graft.transform.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("a", "2024-01-01 10:00:00", 1L, 10.0),
    ("a", "2024-01-01 10:05:00", 2L, 11.0),
    ("a", "2024-01-01 10:05:00", 3L, 12.0), // same-ts duplicate: greater id wins
    ("b", "2024-01-01 10:02:00", 4L, 20.0))
    .toDF("k", "ss", "qid", "px")
    .select(col("k"), to_timestamp(col("ss")).as("qts"), col("qid"), col("px"))

  private def trades = Seq(
    ("a", "2024-01-01 09:59:00", 100L), // before any quote
    ("a", "2024-01-01 10:03:00", 101L), // after qid 1
    ("a", "2024-01-01 10:05:00", 102L), // exactly at qid 2/3
    ("a", "2024-01-01 10:30:00", 103L), // after everything
    ("b", "2024-01-01 10:02:00", 104L), // exactly at qid 4
    ("c", "2024-01-01 10:00:00", 105L)) // key with no quotes at all
    .toDF("k", "ss", "tid")
    .select(col("k"), to_timestamp(col("ss")).as("tts"), col("tid"))

  private def asOfPairs(inclusive: Boolean): Map[Long, Long] =
    Temporal.asOfJoin(trades, quotes, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"),
      tiebreak = Some("qid"), inclusive = inclusive, matchedTsAs = "mts")
      .select("tid", "qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

  test("asOfJoin attaches the latest at-or-before row per key") {
    assert(asOfPairs(inclusive = true) === Map(
      100L -> -1L, // no predecessor → null payload (left-outer)
      101L -> 1L,
      102L -> 3L,  // equal-ts match included; tie → greatest qid
      103L -> 3L,
      104L -> 4L,  // equal-ts on the other key
      105L -> -1L)) // key absent from right side entirely
  }

  test("asOfJoin strict mode excludes equal-timestamp rows") {
    assert(asOfPairs(inclusive = false) === Map(
      100L -> -1L,
      101L -> 1L,
      102L -> 1L,  // the 10:05 quotes are no longer visible
      103L -> 3L,
      104L -> -1L, // only quote for b is at exactly the trade ts
      105L -> -1L))
  }

  test("asOfJoin forward mode attaches the earliest at-or-after row") {
    def fwd(inclusive: Boolean): Map[Long, Long] =
      Temporal.asOfJoin(trades, quotes, keys = Seq("k"),
        leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"),
        tiebreak = Some("qid"), inclusive = inclusive,
        matchedTsAs = "mts", direction = "forward")
        .select("tid", "qid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    assert(fwd(inclusive = true) === Map(
      100L -> 1L,  // earliest quote after 09:59
      101L -> 3L,  // next is the 10:05 pair; tie → greatest qid
      102L -> 3L,  // equal-ts match included
      103L -> -1L, // nothing after 10:30
      104L -> 4L,
      105L -> -1L))
    assert(fwd(inclusive = false) === Map(
      100L -> 1L,
      101L -> 3L,
      102L -> -1L, // equal-ts quotes excluded, nothing later
      103L -> -1L,
      104L -> -1L,
      105L -> -1L))
  }

  test("asOfJoin exposes the matched right timestamp for tolerance filters") {
    val out = Temporal.asOfJoin(trades, quotes, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid"),
      tiebreak = Some("qid"), matchedTsAs = "mts")
      .withColumn("age_s",
        (unix_micros(col("tts")) - unix_micros(col("mts"))) / 1000000L)
      .filter(col("age_s") <= 120) // 2-minute tolerance
      .select("tid").as[Long].collect().toSet
    // 102/104 match at age 0; 101's match is 3 min old, 103's 25 min
    assert(out === Set(102L, 104L))
  }

  test("asOfJoin plans a single window, no join node") {
    val plan = Temporal.asOfJoin(trades, quotes, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"),
      tiebreak = Some("qid")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    assert(plan.contains("Window"), s"expected a window operator:\n$plan")
  }

  test("asOfJoin keeps left values intact when both sides share a " +
    "non-key column name") {
    // both sides carry "v"; v is neither key, payload, nor timestamp —
    // left rows must come out with THEIR v, never the right side's
    val l = trades.withColumn("v", col("tid") * 10)
    val r = quotes.withColumn("v", lit(-1L))
    val out = Temporal.asOfJoin(l, r, keys = Seq("k"),
        leftTs = "tts", rightTs = "qts", payload = Seq("qid"),
        tiebreak = Some("qid"))
      .select("tid", "v").collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(out === Map(100L -> 1000L, 101L -> 1010L, 102L -> 1020L,
      103L -> 1030L, 104L -> 1040L, 105L -> 1050L))
  }

  test("asOfJoin returns the matched row's payload nulls intact " +
    "(no backfill from older rows)") {
    // qid 2 has px = null; a trade matching qid 2 must see px = null,
    // NOT px backfilled from the older qid 1 row
    val r = Seq(
      ("a", "2024-01-01 10:00:00", 1L, Some(10.0)),
      ("a", "2024-01-01 10:05:00", 2L, None: Option[Double]))
      .toDF("k", "ss", "qid", "px")
      .select(col("k"), to_timestamp(col("ss")).as("qts"),
        col("qid"), col("px"))
    val l = Seq(("a", "2024-01-01 10:06:00", 100L)).toDF("k", "ss", "tid")
      .select(col("k"), to_timestamp(col("ss")).as("tts"), col("tid"))
    val row = Temporal.asOfJoin(l, r, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"),
      tiebreak = Some("qid")).select("qid", "px").collect().head
    assert(row.getLong(0) === 2L)
    assert(row.isNullAt(1), "matched row's null px was backfilled")
  }

  test("asOfJoin ignores right rows with a null timestamp") {
    // a null-ts right row sorts first and must not leak its payload
    // onto left rows that have no real predecessor
    val r = Seq(
      ("a", None: Option[String], 9L, 99.0),
      ("a", Some("2024-01-01 10:05:00"), 1L, 10.0))
      .toDF("k", "ss", "qid", "px")
      .select(col("k"), to_timestamp(col("ss")).as("qts"),
        col("qid"), col("px"))
    val l = Seq(
      ("a", "2024-01-01 10:00:00", 100L),  // before every real quote
      ("a", "2024-01-01 10:06:00", 101L))  // after qid 1
      .toDF("k", "ss", "tid")
      .select(col("k"), to_timestamp(col("ss")).as("tts"), col("tid"))
    val out = Temporal.asOfJoin(l, r, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid"),
      tiebreak = Some("qid"))
      .select("tid", "qid").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    assert(out === Map(100L -> -1L, 101L -> 1L))
  }

  test("asOfJoin rejects column collisions with its outputs") {
    val bad = trades.withColumn("qid", lit(0))
    intercept[IllegalArgumentException] {
      Temporal.asOfJoin(bad, quotes, keys = Seq("k"),
        leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"))
    }
  }

  test("asOfJoinBanded equals asOfJoin with payloads nulled past the " +
    "tolerance, for both inclusive modes") {
    for (inclusive <- Seq(true, false); tolS <- Seq(120L, 400L)) {
      val banded = Temporal.asOfJoinBanded(trades, quotes, keys = Seq("k"),
        leftTs = "tts", rightTs = "qts",
        payload = Seq("qid", "px"), toleranceSeconds = tolS,
        tiebreak = Some("qid"), inclusive = inclusive, matchedTsAs = "mts")
        .select("tid", "qid", "px").collect()
        .map(r => r.getLong(0) -> (
          (if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap
      val expected = Temporal.asOfJoin(trades, quotes, keys = Seq("k"),
        leftTs = "tts", rightTs = "qts", payload = Seq("qid", "px"),
        tiebreak = Some("qid"), inclusive = inclusive, matchedTsAs = "mts")
        .withColumn("__ok",
          unix_micros(col("tts")) - unix_micros(col("mts")) <= tolS * 1000000L)
        .select("tid", "qid", "px", "__ok").collect()
        .map { r =>
          val ok = !r.isNullAt(3) && r.getBoolean(3)
          r.getLong(0) -> (
            (if (!ok || r.isNullAt(1)) -1L else r.getLong(1)),
            (if (!ok || r.isNullAt(2)) -1.0 else r.getDouble(2)))
        }.toMap
      assert(banded === expected, s"inclusive=$inclusive tol=$tolS")
    }
  }

  test("asOfJoinBanded keeps every left row under fully duplicate " +
    "business rows — no silent collapse") {
    // two IDENTICAL left rows (same key, ts, everything): each must
    // produce its own output row with the same match, like asOfJoin
    val l = Seq(
      ("a", "2024-01-01 10:01:30"),
      ("a", "2024-01-01 10:01:30"),
      ("a", "2024-01-01 10:05:00"))
      .toDF("k", "ss")
      .select(col("k"), to_timestamp(col("ss")).as("tts"))
    val out = Temporal.asOfJoinBanded(l, quotes, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts", payload = Seq("qid"),
      toleranceSeconds = 300L)
      .select("tts", "qid").collect()
      .map(r => (r.getTimestamp(0).toString,
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.length == 3, s"left rows lost: ${out.mkString(", ")}")
    assert(out.count(_._1 == "2024-01-01 10:01:30.0") == 2)
    // both duplicates carry the identical (correct) match
    assert(out.filter(_._1 == "2024-01-01 10:01:30.0").map(_._2).toSet
      .size == 1)
  }

  test("asOfJoinBanded plans an equi-join on (keys, band), not a BNLJ") {
    val plan = Temporal.asOfJoinBanded(trades, quotes, keys = Seq("k"),
      leftTs = "tts", rightTs = "qts",
      payload = Seq("qid"), toleranceSeconds = 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join planned:\n$plan")
  }

  // ---- range join ---------------------------------------------------------

  private def evs(rows: (String, String, Long)*) =
    rows.toSeq.toDF("k", "ss", "id")
      .select(col("k"), to_timestamp(col("ss")).as("ts"), col("id"))

  test("rangeJoinBanded equals the naive inequality join, incl. bucket edges") {
    // right rows land in the same bucket, the next bucket, exactly at
    // the gap bound, one microsecond past it, and at the exact left ts
    val left = evs(("a", "2024-01-01 10:00:30", 1L),
      ("a", "2024-01-01 10:09:00", 2L), ("b", "2024-01-01 10:00:00", 3L))
      .withColumnRenamed("ts", "lts").withColumnRenamed("id", "lid")
    val right = evs(
      ("a", "2024-01-01 10:00:30", 10L), // == left ts → excluded (strict)
      ("a", "2024-01-01 10:00:45", 11L), // same bucket
      ("a", "2024-01-01 10:05:30", 12L), // next bucket, exactly at bound
      ("a", "2024-01-01 10:05:31", 13L), // 1 s past the bound → out
      ("a", "2024-01-01 10:13:59", 14L), // in range of left 2
      ("b", "2024-01-01 10:04:59", 15L), // other key
      ("c", "2024-01-01 10:00:10", 16L)) // key with no left rows
      .withColumnRenamed("ts", "rts").withColumnRenamed("id", "rid")

    val banded = Temporal.rangeJoinBanded(left, right, Seq("k"),
      "lts", "rts", maxGapSeconds = 300L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("rts") > col("lts") &&
          unix_micros(col("rts")) - unix_micros(col("lts")) <= 300000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    assert(banded === naive)
    assert(banded === Set((1L, 11L), (1L, 12L), (2L, 14L), (3L, 15L)))
  }

  test("rangeJoinBanded plans an equi-join, not a BNLJ/cartesian") {
    val left = evs(("a", "2024-01-01 10:00:30", 1L))
      .withColumnRenamed("ts", "lts")
    val right = evs(("a", "2024-01-01 10:00:45", 10L))
      .withColumnRenamed("ts", "rts")
    val plan = Temporal.rangeJoinBanded(left, right, Seq("k"),
      "lts", "rts", 300L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join planned:\n$plan")
  }
}
