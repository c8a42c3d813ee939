package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection dev tool:
  * `sbt "runMain graft.ExplainQ <query> [sfDir] [mode]"` prints the
  * query's plan (`formatted` by default) so operator work can iterate
  * on the physical plan — codegen spans, pushed filters, exchanges —
  * not just on timings. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // strategy-switch hook for before/after plan capture (same as
    // TimeQ/Bench): SPARK_GRAFT_CONF="spark.graft.rankIndexImpl=rows"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not " +
          "key=value (comma-separated; values must not contain commas)")
      }
    })
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
