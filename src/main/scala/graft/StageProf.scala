package graft
import org.apache.spark.sql.SparkSession

/** One-off stage profiler for adjudicating history-sensitive spread
  * (round-17 verdict finding #2: x43's 3.9× history-mode growth vs
  * 1.3× for the cluster family, plus its twice-flagged ambient
  * spikes): optionally replays the first N declared queries as
  * session history (the Rehearsal discipline — slate cleared between
  * queries, JVM residue kept), then times `runs` runs of the target
  * query under a stage listener and prints per-run, per-stage
  * wall/GC — so a history-sensitive stage is NAMED from data captured
  * during the slow run, never inferred afterwards (the Bench
  * spread_profile discipline, pointed at one query on demand).
  *
  * Usage:
  *   SPARK_GRAFT_HISTORY=228 SPARK_GRAFT_SF_DIR=/tmp/graft_sf01_v1000 \
  *     sbt "runMain graft.StageProf x43_dataset_card 3"
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val history = sys.env.getOrElse("SPARK_GRAFT_HISTORY", "0").toInt
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (history > 0) {
      val names = SparkEntry.queries.keys.toSeq.sorted.take(history)
      names.foreach { n =>
        graft.queries.ExtQueries.clearSessionSlate(spark)
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      println(s"[stageprof] ran ${names.size} history queries")
    }

    case class StageRec(ms: Long, tasks: Int, gcMs: Long, name: String)
    val live = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        val nm = i.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("StageProf"))
          .map(_.trim.takeWhile(_ != '(')).getOrElse(i.name.take(60))
        live.add(StageRec(ms, i.numTasks,
          i.taskMetrics.jvmGCTime, nm))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    graft.queries.ExtQueries.clearSessionSlate(spark)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup (not profiled separately)
    live.clear()
    for (r <- 1 to runs) {
      live.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is async and its drain API is private —
      // settle on a stable queue size, BOUNDED at 3 s (the Bench
      // quiesce discipline; an unbounded settle would spin forever if
      // any background job kept completing stages — round-18 ADVICE)
      var last = -1
      val deadline = System.nanoTime() + 3000L * 1000000L
      while (System.nanoTime() < deadline &&
             { Thread.sleep(100); val s = live.size; val go = s != last
               last = s; go }) ()
      val stages = {
        import scala.jdk.CollectionConverters._
        live.asScala.toSeq
      }
      val totGc = stages.map(_.gcMs).sum
      println(f"[stageprof] $name run $r: wall=$wall%.3fs " +
        f"stages=${stages.size} stageMs=${stages.map(_.ms).sum} " +
        f"gcMs=$totGc (history=$history)")
      stages.sortBy(-_.ms).take(10).foreach { st =>
        println(f"[stageprof]   ${st.ms}%6d ms  gc=${st.gcMs}%5d ms  " +
          f"tasks=${st.tasks}%3d  ${st.name}")
      }
    }
    spark.stop()
  }
}
