package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object ProbeJ6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (q <- Seq("j6_explode_join", "x2_minhash_sig", "u1_union_pages")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      println(f"[probe] $q cold  ${(System.nanoTime()-t0)/1e9}%6.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      println(f"[probe] $q warm  ${(System.nanoTime()-t1)/1e9}%6.2f s")
    }
    SparkEntry.queries("j6_explode_join")(spark, d).explain("formatted")
    spark.stop()
  }
}
