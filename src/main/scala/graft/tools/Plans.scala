package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Dump physical plans of representative queries for plan review (dev tool). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // `audit`: sweep EVERY query's physical plan for anti-pattern nodes
    // (cartesian products, nested-loop joins) and print one line per
    // hit.  Expected hits — all bounded-broadcast cross joins by
    // construction: x6/x40 (broadcast query set), x17/x22 (nlist-row
    // centroid codebook), x23/x26/x28/x38/x43/x44 (single-row
    // total/target), x39 (#partitions-row triangular offset join).
    // Anything NEW in this list needs the same justification.
    if (args.headOption.contains("audit")) {
      // AQE off: AdaptiveSparkPlanExec hides its children from collect,
      // and literal plans are what we want to grep anyway
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try {
          val text = fn(spark, d).queryExecution.executedPlan.toString
          for (pat <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
            if (text.contains(pat)) println(s"AUDIT $name: $pat")
        } catch {
          case e: Throwable => println(s"AUDIT $name: ERROR ${e.getClass}")
        }
      }
      spark.stop()
      return
    }
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
