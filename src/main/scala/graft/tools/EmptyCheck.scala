package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Resilience sweep: run every declared query against EMPTY copies of
  * the input tables (same schemas, zero rows) — the shape of an empty
  * source partition / day / provider at scale.  A query may return
  * zero rows; it must not throw. */
object EmptyCheck {

  /** Write zero-row copies of every input table (schemas preserved;
    * events stays RAW nanos longs — Tables.events floors ts DIV 1000
    * on read, so a pre-floored TIMESTAMP would re-divide) and return
    * the staged dir. */
  def stageEmpty(spark: SparkSession, src: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stageEmpty(spark, "/root/testdata/sf0.001")
    var ok = 0
    var bad = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val n = fn(spark, dir).count()
        ok += 1
        if (n > 0) println(s"EMPTYCHECK $name: WARN rows=$n on empty input")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"EMPTYCHECK $name: THROWS ${e.getClass.getSimpleName}: " +
            e.getMessage.replaceAll("\n", " ").take(140))
      }
    }
    println(s"EMPTYCHECK done: $ok ok, $bad throw")
    spark.stop()
  }
}
