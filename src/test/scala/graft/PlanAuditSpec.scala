package graft

import org.apache.spark.sql.functions._

/** The plan-quality gate, promoted from dev tool to failing test: every
  * declared query's AQE-off physical plan is swept for unbounded-join
  * anti-patterns.  A new `crossJoin` / accidentally-unkeyed join in any
  * query fails HERE instead of waiting for a human plan review. */
class PlanAuditSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct, and the " +
    "BroadcastNestedLoopJoin set equals the documented allowlist") {
    val hits = graft.tools.Plans.audit(spark, sf0001)

    val errors = hits.filter(_._2.exists(_.startsWith("ERROR")))
    assert(errors.isEmpty, s"plans failed to build: $errors")

    val cartesian = hits.filter(_._2.contains("CartesianProduct")).keys.toSeq
    assert(cartesian.isEmpty,
      s"CartesianProduct in declared queries: ${cartesian.sorted.mkString(", ")}")

    val bnlj = hits.filter(_._2.contains("BroadcastNestedLoopJoin")).keySet
    val allow = graft.tools.Plans.bnljAllowlist.keySet
    assert(bnlj == allow,
      s"BNLJ set drifted from allowlist — new (need a bounded-broadcast " +
        s"justification in Plans.bnljAllowlist): ${(bnlj -- allow).toSeq.sorted
          .mkString(", ")}; stale allowlist entries: ${(allow -- bnlj).toSeq.sorted
          .mkString(", ")}")
  }

  test("the audit actually catches an injected cross join") {
    // sanity-check the detector itself on this session's conf: a bare
    // crossJoin must surface as CartesianProduct with AQE off
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // a broadcastable side would plan BroadcastNestedLoopJoin instead —
    // either way the audit flags it, but pin the cartesian branch too
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.range(10).toDF("a")
      val plan = df.crossJoin(spark.range(10).toDF("b"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("CartesianProduct"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }
}
