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

  test("mergeClusters over a bucketed saved table is O(delta)-shuffle: " +
    "no Exchange ever sits above the corpus-side scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import spark.implicits._
    val docs = (1L to 40L).map(Tuple1(_)).toDF("doc_id")
    val oldDocs = docs.filter(col("doc_id") <= 30)
    val newDocs = docs.filter(col("doc_id") > 30)
    val oldPairs = Seq((1L, 2L), (5L, 6L), (10L, 11L)).toDF("a", "b")
    val delta = Seq((31L, 1L), (32L, 33L)).toDF("a", "b")
    val saved = graft.ext.Dedup.duplicateClusters(oldDocs, "doc_id", oldPairs)
    dropTableFully("x77_saved_audit")
    graft.ext.Dedup.saveClusters(saved, "x77_saved_audit")
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val merged = graft.ext.Dedup.mergeClusters(
        graft.ext.Dedup.loadClusters(spark, "x77_saved_audit"),
        newDocs, "doc_id", delta)
      // correctness first: the merged labels match a full recompute
      val full = graft.ext.Dedup.duplicateClusters(docs, "doc_id",
        oldPairs.unionByName(delta))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(merged.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet == full)
      // the O(delta) claim: every Exchange in the plan sits over
      // delta-derived data — none may contain the bucketed corpus scan
      val offending = merged.queryExecution.executedPlan.collect {
        case e: Exchange if e.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == "x77_saved_audit")
          case _ => false
        } => e
      }
      assert(offending.isEmpty,
        s"corpus-side scan reshuffled:\n${offending.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      dropTableFully("x77_saved_audit")
    }
  }

  test("robotsReport is map-only: no shuffle exchange, no aggregate — " +
    "the rule table broadcasts pre-collapsed to host → prefixes") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val docs = Seq((1L, "http://a.com/Articles/12"),
      (2L, "http://b.com/x")).toDF("doc_id", "url")
    val report = graft.ext.Web.robotsReport(docs, "doc_id", "url",
      Seq(("a.com", "/Articles/1"), ("a.com", "/Private"),
        ("b.com", "/y")))
    val plan = report.queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"robotsReport must not shuffle the corpus:\n${shuffles.mkString("\n")}")
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.isEmpty,
      s"robotsReport must not re-aggregate the corpus:\n${aggs.mkString("\n")}")
    // and it still answers: multi-rule host verdicts fold via exists()
    val out = report.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false))
  }

  test("frontierGate is one linear pass: the candidate batch scans " +
    "once, exactly one batch-side shuffle (the index probe key), and " +
    "the rules join broadcasts") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /a\n"))
      .toDF("host", "txt")
    val rules = graft.ext.Web.robotsRules(robots, "host", "txt")
    val seen = Seq((100L, "http://h.com/old")).toDF("doc_id", "url")
    val index = graft.ext.Web.urlIndex(seen, "url")
    val incoming = Seq((1L, "http://h.com/new"), (2L, "http://h.com/a/x"))
      .toDF("doc_id", "url")
    val gate = graft.ext.Web.frontierGate(index, rules, incoming,
      "doc_id", "url")
    // the candidate relation must appear exactly once in the plan —
    // the pre-round-16 shape scanned it once per verdict leg and
    // re-joined on id.  Audit LEAVES of the OPTIMIZED LOGICAL plan
    // (the physical plan is wrapped in AdaptiveSparkPlanExec before
    // execution, whose collect() sees only the un-finalized shell):
    // exactly ONE leaf carries the candidate id column; the only other
    // leaves are the pinned index (LogicalRDD) and the robots-text
    // relation — which legitimately appears twice, because
    // robotsRules' group-match semi-join reads the policy text for
    // both its agent leg and its rules leg (bounded by the robots
    // files, never the corpus).
    val leaves = gate.queryExecution.optimizedPlan.collectLeaves()
    val candLeaves = leaves.filter(_.output.exists(_.name == "doc_id"))
    assert(candLeaves.size == 1,
      s"candidate batch must scan once, found ${candLeaves.size} of " +
        s"${leaves.size} leaves:\n${leaves.mkString("\n")}")
    assert(leaves.size == 4,
      s"leaf census drifted (expect candidate + index + robots x2):\n" +
        leaves.mkString("\n"))
    // execute FIRST, then audit the AQE-finalized physical plan (the
    // unexecuted AdaptiveSparkPlanExec shell hides the real operators)
    val out = gate.collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> true, 2L -> false))
    val exec = gate.queryExecution.executedPlan
    val plan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    // shuffles: only the batch side of the index probe (the pinned
    // index is pre-partitioned; the rules join must broadcast).  The
    // finalized plan nests materialized sub-stages behind
    // QueryStageExec shells that node-collect does not enter, so the
    // join audit reads the printed tree (which does render them).
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1,
      s"frontierGate must shuffle only the candidate batch:\n" +
        shuffles.mkString("\n"))
    val printed = exec.toString
    assert(printed.contains("BroadcastHashJoin"),
      s"rules join must plan as a broadcast hash join:\n$printed")
    assert(!printed.contains("SortMergeJoin"),
      s"no corpus-shaped join may appear in the gate:\n$printed")
  }

  test("recrawlGate scans the candidate batch once and shuffles only " +
    "batch-sized data: the index probe key and the per-candidate " +
    "max-mod fold") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val corpus = Seq((100L, "http://h.com/a", "2026-01-05"))
      .toDF("doc_id", "url", "mod")
    val index = graft.ext.Web.urlModIndex(corpus, "url", "mod")
    val incoming = Seq((1L, "http://h.com/a", "2026-01-06"),
      (2L, "http://h.com/new", null)).toDF("doc_id", "url", "mod")
    val gate = graft.ext.Web.recrawlGate(index, incoming, "doc_id",
      "url", "mod")
    // the candidate relation appears exactly once; the only other leaf
    // is the pinned index (LogicalRDD)
    val leaves = gate.queryExecution.optimizedPlan.collectLeaves()
    val candLeaves = leaves.filter(_.output.exists(_.name == "doc_id"))
    assert(candLeaves.size == 1,
      s"candidate batch must scan once:\n${leaves.mkString("\n")}")
    assert(leaves.size == 2,
      s"leaf census drifted (expect candidate + index):\n" +
        leaves.mkString("\n"))
    val out = gate.collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> true, 2L -> true))
    val exec = gate.queryExecution.executedPlan
    val plan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    // batch-sized shuffles only: the probe join key and the
    // batch-keyed max(mod) aggregation — never anything corpus-shaped
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2,
      s"recrawlGate must shuffle only batch-sized data:\n" +
        shuffles.mkString("\n"))
  }

  test("politenessScheduleResume keeps the single-shuffle schedule " +
    "shape: the state and delay joins broadcast, the slot window " +
    "reuses the TopKPerKey partitioning") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val delays = Seq(("h.com", 2.0)).toDF("host", "delay_sec")
    val state = Seq(("h.com", 4.0)).toDF("host", "next_eta_sec")
    val cand = Seq((1L, "http://h.com/a"), (2L, "http://h.com/b"))
      .toDF("doc_id", "url")
    val sched = graft.ext.Web.politenessScheduleResume(cand, delays,
      state, "doc_id", "url")
    val etas = sched.collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(etas === Map(1L -> 4.0, 2L -> 6.0))
    val exec = sched.queryExecution.executedPlan
    val plan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1,
      s"resumed schedule must keep one candidate shuffle:\n" +
        shuffles.mkString("\n"))
    val printed = exec.toString
    assert(!printed.contains("SortMergeJoin"),
      s"state/delay joins must broadcast:\n$printed")
  }

  test("pageRankMicro's per-sweep plan: the edge table never " +
    "shuffles — both exchanges are partial-aggregated (dst contribs + " +
    "the single-row dangling scalar), joins broadcast") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, SortMergeJoinExec}
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst").localCheckpoint()
    val r = Seq(("a", 2L, 333333L), ("b", 1L, 333333L), ("c", 1L, 333333L))
      .toDF("node", "outdeg", "r").localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ext.Graph.sweep(r, e, 3L, 850000L)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 2,
        s"expected the dst-agg + dangling-scalar exchanges only:\n$plan")
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          w.child
        case other => other
      }
      assert(shuffles.forall(s =>
        unwrap(s.child).isInstanceOf[BaseAggregateExec]),
        s"every sweep exchange must carry partial-aggregated rows " +
          s"(|V|-bounded per partition), never raw edges:\n$plan")
      assert(plan.collect { case s: SortMergeJoinExec => s }.isEmpty,
        s"no sort-merge join in a sweep:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.size == 2,
        s"share and contrib joins must broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("hyperBallSweep's plan: the edge table never shuffles — the " +
    "one exchange carries partial-aggregated register-max partials, " +
    "joins broadcast") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, SortMergeJoinExec}
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst").localCheckpoint()
    val balls = Seq("a", "b", "c").toDF("node")
      .select(col("node"),
        graft.plans.HllSingleton.hllSingleton(col("node")).as("ball"),
        lit(0.0).as("harmonic"))
      .withColumn("est", graft.plans.HllEst.hllEst(col("ball")))
      .localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.ext.Graph.hyperBallSweep(balls, e, 1)
        .queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1,
        s"expected ONE register-union exchange:\n$plan")
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          w.child
        case other => other
      }
      assert(shuffles.forall(s =>
        unwrap(s.child).isInstanceOf[BaseAggregateExec] ||
          s.child.isInstanceOf[BaseAggregateExec]),
        s"the union exchange must carry register-max partials " +
          s"(256 B per node per map side), never raw balls:\n$plan")
      assert(plan.collect { case s: SortMergeJoinExec => s }.isEmpty,
        s"no sort-merge join in a HyperBall sweep:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.size == 2,
        s"ball and rollup joins must broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("the degraded (URL-grain) sweep plan: no rank/share broadcast " +
    "— the contrib join is a co-located shuffle join whose EDGE side " +
    "reads the bucketed table with NO exchange; the only broadcast " +
    "left is the single-row dangling scalar") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledJoin}
    import spark.implicits._
    dropTableFully("pr_edges_audit")
    graft.ext.Graph.saveEdges(
      Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
        .toDF("src", "dst"), "src", "dst", "pr_edges_audit", buckets = 4)
    val e = graft.ext.Graph.loadEdges(spark, "pr_edges_audit")
    val r = Seq(("a", 2L, 1000000L), ("b", 1L, 1000000L),
      ("c", 1L, 1000000L)).toDF("node", "outdeg", "r").localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.ext.Graph.sweep(r, e, 3L, 850000L, hinted = false)
        .queryExecution.executedPlan
      // the one broadcast join left is the dangling crossJoin's
      // single-row side (broadcastable at ANY grain); share + contrib
      // joins must NOT broadcast a |V|-sized table
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.isEmpty,
        s"degraded sweep must not broadcast-hash-join rank tables:\n$plan")
      val sj = plan.collect { case j: ShuffledJoin => j }
      assert(sj.size == 2,
        s"share + contrib joins must plan as shuffled joins:\n$plan")
      // the edge side of the contrib join reads bucketed: no
      // ShuffleExchange anywhere above the pr_edges_audit scan.  Only
      // the INNERMOST join touches the scan directly — the outer
      // rank-update join's subtree contains the whole contrib
      // pipeline (shares exchange included), so filter to sides with
      // no nested join
      val scanSides = plan.collect {
        case j: ShuffledJoin => Seq(j.left, j.right) }.flatten
      val edgeSide = scanSides.filter(s =>
        s.toString.contains("pr_edges_audit") &&
          s.collect { case j: ShuffledJoin => j }.isEmpty)
      assert(edgeSide.nonEmpty, s"no join side reads the edge table:\n$plan")
      assert(edgeSide.forall(s =>
        s.collect { case x: ShuffleExchangeExec => x }.isEmpty),
        s"the bucketed edge side must not exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("the degraded (URL-grain) HyperBall sweep plan: no ball " +
    "broadcast — both |V|-sized joins plan as shuffled joins, and " +
    "the EDGE side of the union join reads the bucketed table with " +
    "NO exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledJoin}
    import spark.implicits._
    dropTableFully("hb_edges_audit")
    graft.ext.Graph.saveEdges(
      Seq(("a", "b"), ("b", "c"), ("c", "a"))
        .toDF("src", "dst"), "src", "dst", "hb_edges_audit", buckets = 4)
    val e = graft.ext.Graph.loadEdges(spark, "hb_edges_audit")
    val balls = Seq("a", "b", "c").toDF("node")
      .select(col("node"),
        graft.plans.HllSingleton.hllSingleton(col("node")).as("ball"),
        lit(0.0).as("harmonic"))
      .withColumn("est", graft.plans.HllEst.hllEst(col("ball")))
      .localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.ext.Graph.hyperBallSweep(balls, e, 1,
        hinted = false).queryExecution.executedPlan
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      assert(bhj.isEmpty,
        s"degraded sweep must not broadcast ball tables:\n$plan")
      val sj = plan.collect { case j: ShuffledJoin => j }
      assert(sj.size == 2,
        s"ball + rollup joins must plan as shuffled joins:\n$plan")
      // the edge side of the inner (ball-union) join reads bucketed:
      // no ShuffleExchange above the hb_edges_audit scan — filter to
      // join sides with no nested join, as in the PageRank census
      val scanSides = plan.collect {
        case j: ShuffledJoin => Seq(j.left, j.right) }.flatten
      val edgeSide = scanSides.filter(s =>
        s.toString.contains("hb_edges_audit") &&
          s.collect { case j: ShuffledJoin => j }.isEmpty)
      assert(edgeSide.nonEmpty, s"no join side reads the edge table:\n$plan")
      assert(edgeSide.forall(s =>
        s.collect { case x: ShuffleExchangeExec => x }.isEmpty),
        s"the bucketed edge side must not exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("the degraded STATE sweep plan (ballSweep, hinted = false): " +
    "no ball broadcast — the ball join plans as a shuffled join " +
    "whose EDGE side reads the bucketed table with NO exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledJoin}
    import spark.implicits._
    dropTableFully("bs_edges_audit")
    graft.ext.Graph.saveEdges(
      Seq(("a", "b"), ("b", "c"), ("c", "a"))
        .toDF("src", "dst"), "src", "dst", "bs_edges_audit", buckets = 4)
    val e = graft.ext.Graph.loadEdges(spark, "bs_edges_audit")
    val cur = Seq("a", "b", "c").toDF("node")
      .select(col("node"),
        graft.plans.HllSingleton.hllSingleton(col("node")).as("ball"))
      .localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.ext.Graph.ballSweep(cur, e, hinted = false)
        .queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"degraded state sweep must not broadcast the ball table:\n$plan")
      val scanSides = plan.collect {
        case j: ShuffledJoin => Seq(j.left, j.right) }.flatten
      val edgeSide = scanSides.filter(s =>
        s.toString.contains("bs_edges_audit") &&
          s.collect { case j: ShuffledJoin => j }.isEmpty)
      assert(edgeSide.nonEmpty, s"no join side reads the edge table:\n$plan")
      assert(edgeSide.forall(s =>
        s.collect { case x: ShuffleExchangeExec => x }.isEmpty),
        s"the bucketed edge side must not exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("the degraded WARM sweep plan (ballWarmSweep, hinted = false): " +
    "no ball OR changed-set broadcast — the changed-set gate and the " +
    "ball join both plan as shuffled joins, and the bucketed EDGE " +
    "side never exchanges (the round-19 named scale wall)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledJoin}
    import spark.implicits._
    dropTableFully("bw_edges_audit")
    graft.ext.Graph.saveEdges(
      Seq(("a", "b"), ("b", "c"), ("c", "a"))
        .toDF("src", "dst"), "src", "dst", "bw_edges_audit", buckets = 4)
    val eOld = graft.ext.Graph.loadEdges(spark, "bw_edges_audit")
    val eDelta = Seq(("c", "d")).toDF("src", "dst").localCheckpoint()
    val cur = Seq("a", "b", "c", "d").toDF("node")
      .select(col("node"),
        graft.plans.HllSingleton.hllSingleton(col("node")).as("ball"))
      .localCheckpoint()
    val changed = Seq("d").toDF("node").localCheckpoint()
    val oldR = Seq("a", "b", "c").toDF("node")
      .select(col("node"),
        graft.plans.HllSingleton.hllSingleton(col("node")).as("old_ball"))
      .localCheckpoint()
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.ext.Graph.ballWarmSweep(cur, changed, oldR,
        eOld, eDelta, hinted = false).queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"degraded warm sweep must broadcast neither the ball table " +
          s"nor the changed set:\n$plan")
      val scanSides = plan.collect {
        case j: ShuffledJoin => Seq(j.left, j.right) }.flatten
      val edgeSide = scanSides.filter(s =>
        s.toString.contains("bw_edges_audit") &&
          s.collect { case j: ShuffledJoin => j }.isEmpty)
      assert(edgeSide.nonEmpty, s"no join side reads the edge table:\n$plan")
      assert(edgeSide.forall(s =>
        s.collect { case x: ShuffleExchangeExec => x }.isEmpty),
        s"the bucketed edge side must not exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", before)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
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
