package graft

import org.apache.spark.sql.functions._

/** The BandTimeRangeJoin optimizer rule: a naive bounded time-range
  * join (no equi keys — Catalyst alone plans BNLJ) must come out as a
  * banded equi-join with the identical answer. */
class BandRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naiveJoin = {
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val r = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
    p.join(r,
        col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select("p_id", "e_id")
  }

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.autoBandRangeJoin", on.toString)
    try body
    finally spark.conf.unset("spark.graft.autoBandRangeJoin")
  }

  test("rule rewrites the naive range join to an equi-join plan") {
    withRule(on = true) {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
    }
    withRule(on = false) {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"),
        s"control: naive plan should be BNLJ without the rule:\n$plan")
    }
  }

  test("rewritten join returns the identical pair set") {
    val banded = withRule(on = true) {
      naiveJoin.as[(Long, Long)].collect().toSet
    }
    val reference = withRule(on = false) {
      naiveJoin.as[(Long, Long)].collect().toSet
    }
    assert(banded == reference)
    assert(banded.nonEmpty)
  }

  test("rule leaves joins with real equi keys alone") {
    withRule(on = true) {
      val ev = Tables.events(spark, sf0001)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"),
          col("ts").as("e_ts"))
      val j = p.join(r, Seq("user_id"))
        .filter(col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__band_l"), s"rule fired needlessly:\n$plan")
      assert(j.count() > 0)
    }
  }

  test("strict and inclusive bound variants both rewrite correctly") {
    withRule(on = true) {
      val ev = Tables.events(spark, sf0001)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
      // >= lower, < upper — the other orientation of each bound
      val j = p.join(r,
          col("e_ts") >= col("p_ts") &&
            col("e_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
        .select("p_id", "e_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = j.as[(Long, Long)].collect().toSet
      val ref = withRule(on = false) { j.as[(Long, Long)].collect().toSet }
      assert(got == ref)
    }
  }
}
