package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PairDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
      val docs = Tables.documents(spark, d)
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, k = 16, bandRows = 4, threshold = 0.8).count()
      println(s"X3PAIRS dir=$d pairs=$n secs=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
