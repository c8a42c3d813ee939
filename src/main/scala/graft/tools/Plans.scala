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
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
