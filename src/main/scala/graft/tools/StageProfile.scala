package graft.tools
import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage wall/records profile of one declared query (dev tool):
  * `runMain graft.tools.StageProfile <query> [sfDir]` — prints each
  * stage's duration, task count, shuffle read/write records after a
  * warm-up run, so PERF.md cost claims cite stages, not guesses. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x3_minhash_lsh_pairs")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sf).count() // warm
    case class St(name: String, ms: Long, tasks: Int, rIn: Long, rOut: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.add(St(i.name.split(" at ").head, ms, i.numTasks,
          i.taskMetrics.shuffleReadMetrics.recordsRead,
          i.taskMetrics.shuffleWriteMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sf).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    println(f"PROFILE $name: wall=$wall%.2fs rows=$n")
    stages.asScala.toSeq.sortBy(-_.ms).foreach { s =>
      println(f"PROFILE   ${s.ms}%6d ms ${s.tasks}%4d tasks " +
        f"readRec=${s.rIn}%10d writeRec=${s.rOut}%10d  ${s.name}")
    }
    spark.stop()
  }
}
