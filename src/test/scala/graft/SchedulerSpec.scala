package graft

import graft.pipeline.Scheduler
import graft.sources.Ingest
import org.apache.spark.sql.functions._

class SchedulerSpec extends SparkSpec {
  import spark.implicits._

  lazy val configDir: String = fixture("sources")

  test("S1 config scan: active-only, frequency enum enforced") {
    val configs = Ingest.readSourceConfigs(spark, configDir)
    val providers = configs.select("provider").as[String].collect().toSet
    // cmu inactive, badfreq rejected by the enum
    assert(providers == Set("purpleair", "habitatmap", "clarity"))
    // schema fields parsed, meta map accessible
    val meta = configs.filter($"provider" === "clarity")
      .select(element_at($"meta", "url"), $"secretKey")
      .as[(String, String)].first()
    assert(meta == ("recorded", "clarity-key"))
  }

  test("scheduler tick runs due sources, isolates per-source failures") {
    val out = java.nio.file.Files.createTempDirectory("graft_sched_").toString
    val results = Scheduler.runDue(spark, configDir, "hour",
      Map("purpleair" -> fixture("purpleair.json")), // habitatmap missing!
      out)
    assert(results.map(_.provider) == Seq("habitatmap", "purpleair"))
    val byName = results.map(r => r.provider -> r).toMap
    assert(byName("purpleair").ok)
    assert(!byName("habitatmap").ok)
    assert(byName("habitatmap").error.get.contains("no recorded input"))
    // successful source produced its summary and artifacts
    val s = byName("purpleair").summary.get.first()
    assert(s.getLong(2) == 26)
    assert(new java.io.File(s"$out/measures/purpleair").exists())
  }

  test("K5 run listener receives success and error topic events") {
    val out = java.nio.file.Files.createTempDirectory("graft_sns_").toString
    val ok = scala.collection.mutable.ArrayBuffer[String]()
    val failed = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val listener = new Scheduler.RunListener {
      override def onSuccess(provider: String,
                             summary: org.apache.spark.sql.DataFrame): Unit = {
        ok += provider
        // the success payload is the K5 summary shape
        assert(summary.columns.toSeq ==
          Seq("source_name", "locations", "measures", "from", "to"))
        ()
      }
      override def onError(provider: String, error: Throwable): Unit = {
        failed += provider -> error.getMessage; ()
      }
    }
    Scheduler.runDue(spark, configDir, "hour",
      Map("purpleair" -> fixture("purpleair.json")), out, listener)
    assert(ok.toSeq == Seq("purpleair"))
    assert(failed.map(_._1).toSeq == Seq("habitatmap"))
    assert(failed.head._2.contains("no recorded input"))
  }

  test("parallel tick: concurrent sources, same results and isolation") {
    val out = java.nio.file.Files.createTempDirectory("graft_par_").toString
    val results = Scheduler.runDue(spark, configDir, "hour",
      Map("purpleair" -> fixture("purpleair.json")), out,
      parallelism = 4)
    assert(results.map(_.provider) == Seq("habitatmap", "purpleair"))
    val byName = results.map(r => r.provider -> r).toMap
    assert(byName("purpleair").ok && !byName("habitatmap").ok)
    assert(byName("purpleair").summary.get.first().getLong(2) == 26)
  }

  test("per-source isolation holds for Error-rooted failures (NonFatal)") {
    val out = java.nio.file.Files.createTempDirectory("graft_err_").toString
    // the `process` seam stands in for a pipeline whose codegen/assembly
    // fails with an Error-rooted throwable (e.g. a wrapped
    // CompileException) — the tick must capture it and keep going
    val results = Scheduler.runDue(spark, configDir, "hour",
      Map("purpleair" -> fixture("purpleair.json"),
        "habitatmap" -> fixture("habitatmap.json")), out,
      process = (s, p, in, o) =>
        if (p == "habitatmap") throw new AssertionError("codegen blew up")
        else graft.pipeline.Pipelines.processor(s, p, in, o))
    val byName = results.map(r => r.provider -> r).toMap
    assert(!byName("habitatmap").ok)
    assert(byName("habitatmap").error.get.contains("codegen blew up"))
    assert(byName("purpleair").ok) // the Error did not kill the tick
  }

  test("tick timeout: a hung provider becomes a RunResult error, the " +
    "rest of the tick completes") {
    import scala.concurrent.duration._
    val out = java.nio.file.Files.createTempDirectory("graft_to_").toString
    val errored = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new Scheduler.RunListener {
      override def onError(provider: String, error: Throwable): Unit = {
        errored.add(provider); ()
      }
    }
    val results = Scheduler.runDue(spark, configDir, "hour",
      Map("purpleair" -> fixture("purpleair.json"),
        "habitatmap" -> fixture("habitatmap.json")), out,
      listener, parallelism = 2,
      process = (s, p, in, o) =>
        // habitatmap stands in for a provider wedged on a dead upstream
        if (p == "habitatmap") { Thread.sleep(600000L); null }
        else graft.pipeline.Pipelines.processor(s, p, in, o),
      tickTimeout = 15.seconds)
    val byName = results.map(r => r.provider -> r).toMap
    assert(results.map(_.provider) == Seq("habitatmap", "purpleair"))
    assert(!byName("habitatmap").ok)
    assert(byName("habitatmap").error.get.contains("tick timeout"))
    assert(byName("purpleair").ok,
      "the deadline must not fail providers that finished in time")
    assert(errored.contains("habitatmap"), "timeout hits the error topic")
  }

  test("minute tick runs clarity alone (frequency classes)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sched2_").toString
    val results = Scheduler.runDue(spark, configDir, "minute",
      Map("clarity" -> fixture("clarity.json")), out)
    assert(results.map(_.provider) == Seq("clarity") && results.head.ok)
    assert(new java.io.File(s"$out/measures-json/clarity").exists())
  }
}

/** Plan-shape regression tests: the physical plans we rely on at scale. */
class PlanShapeSpec extends SparkSpec {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
  import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
  }

  test("J1 measurand join broadcasts the dimension side") {
    val plan = planString("j1_measurand_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("scans prune columns: j1 reads 4 of 11 lineitem columns") {
    val plan = planString("j1_measurand_join")
    assert(plan.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," +
        "l_linenumber:int,l_quantity:double>"), plan)
  }

  test("whole-stage codegen covers the hot path of f13 melt") {
    val df = SparkEntry.queries("f13_melt")(spark, sf0001)
    val codegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty)
  }
}
