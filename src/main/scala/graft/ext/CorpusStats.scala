package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics and dataset management for training-data
  * pipelines: distribution stats, deterministic splits, heavy-hitter
  * n-grams.
  *
  * Scale notes: stats are single hash aggregations (exact percentiles
  * shuffle per-group value lists — swap to `percentile_approx` sketches
  * past memory limits, same API shape); splitting is a pure map-side
  * expression (no shuffle, reproducible across runs/partitionings
  * because the bucket comes from a content/id hash, not RNG state);
  * heavy hitters are explode → partial-agg → top-k, with the map-side
  * combine collapsing the n-gram long tail before the shuffle.
  */
object CorpusStats {

  /** Per-group document-length distribution: exact interpolated
    * quantiles + mean.  Exact (not sketched) so results are
    * oracle-comparable; the approx variant is a drop-in
    * (`percentile_approx`). */
  def lengthStats(docs: DataFrame, groupCol: String,
                  lenColName: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(lenColName)), 2).as("mean_len"),
        expr(s"percentile($lenColName, 0.5)").as("p50_len"),
        expr(s"percentile($lenColName, 0.95)").as("p95_len"),
        min(col(lenColName)).as("min_len"),
        max(col(lenColName)).as("max_len"))

  /** Deterministic train/val/test assignment: bucket = first 8 hex of
    * md5(id || salt) as int mod 100.  Content-addressed, so the split
    * is stable under re-partitioning, re-runs, and incremental corpus
    * growth — the property RNG-based `randomSplit` lacks. */
  def splitColumn(id: Column, salt: String = "graft",
                  trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = (conv(substring(md5(concat(id.cast("string"), lit(salt))),
      1, 8), 16, 10).cast("long") % 100).cast("int")
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  def splitCounts(docs: DataFrame, idCol: String,
                  groupCol: String): DataFrame =
    docs.withColumn("split", splitColumn(col(idCol)))
      .groupBy(col(groupCol), col("split"))
      .agg(count(lit(1)).as("n"))

  /** Top-k word bigrams: heavy-hitter n-grams across the corpus with a
    * deterministic (count desc, bigram asc) ranking.  Bigrams assemble
    * via posexplode + a lead window over token position — plain
    * codegen'd operators instead of an interpreted per-element
    * `transform` lambda (the same rewrite that bought ~10× on
    * minhash/simhash); docs shorter than 2 tokens contribute nothing. */
  def topBigrams(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("__doc", monotonically_increasing_id())
    val w = Window.partitionBy(col("__doc")).orderBy(col("pos"))
    val bigrams = toks
      .select(col("__doc"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("__next", lead(col("tok"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(concat_ws(" ", col("tok"), col("__next")).as("bigram"))
    bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(k)
  }
}
