package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash-LSH pipeline stages (dev tool).
  * Every stage is built cold (no cache sharing) so timings reflect the
  * true per-stage cost inside the fused pipeline. */
object ProfileX3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    time("warm (docs count)")(docs.count())
    time("sigs cold")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 1, 8).count())
    // replicate internal candidate stage (salted, size-filtered)
    import graft.ext.TextAnalysis
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 1, 8)
    val toks = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
      .withColumn("sz", size(col("toks"))).localCheckpoint()
    val szOnly = toks.select(col("doc_id"), col("sz"))
    val bands = Dedup.lshBands(sigs, 2).join(broadcast(szOnly), "doc_id")
      .localCheckpoint()
    val a = bands.select(col("band_key"), col("doc_id").as("a"), col("sz").as("sa"))
      .withColumn("salt", pmod(hash(col("a")), lit(16)))
    val b = bands.select(col("band_key"), col("doc_id").as("b"), col("sz").as("sb"))
      .withColumn("salt", explode(sequence(lit(0), lit(15))))
    val joined = a.join(b, Seq("band_key", "salt"))
      .filter(col("a") < col("b") &&
        least(col("sa"), col("sb")).cast("double") / greatest(col("sa"), col("sb")) >= 0.8)
    val rawPairs = time("band join (pre-distinct)")(joined.count())
    println(s"[profile] raw pair rows = $rawPairs")
    val cands = joined.select(col("a"), col("b")).distinct().localCheckpoint()
    time("distinct")(cands.count())
    println(s"[profile] n_candidates = ${cands.count()}")
    val ea = toks.select(col("doc_id").as("a"), col("toks").as("ta"))
    val eb = toks.select(col("doc_id").as("b"), col("toks").as("tb"))
    val vcount = time("verify (string arrays)")(
      cands.join(broadcast(ea), "a").join(broadcast(eb), "b")
        .select(size(array_intersect(col("ta"), col("tb"))).as("i"))
        .agg(sum(col("i"))).collect())
    val _ = vcount
    time("full pipeline cold")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 8, 2, 0.8).count())
    time("full pipeline again")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 8, 2, 0.8).count())
    spark.stop()
  }
}
