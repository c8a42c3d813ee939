package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the fastText-style linear classifier
  * pass of a training-data pipeline (CCNet/LLaMA-recipe quality
  * filtering): hash each token into a fixed feature space, average the
  * bucket weights of a trained linear model, keep documents above a
  * threshold.
  *
  * The 100 TB shape is what matters here and is exactly this plan:
  *  - the MODEL is a tiny (dim-row) table broadcast to every executor;
  *  - FEATURIZATION is a map-side hash (md5-derived, engine-portable);
  *  - SCORING is explode → broadcast-hash-join → partial hash
  *    aggregation, so the corpus crosses the network once as (id, sum,
  *    count) partials and the full text never shuffles at all.
  *
  * [[hashedWeights]] derives a deterministic pseudo-random weight table
  * from md5 so the whole path is verifiable against the SQL oracle; a
  * production job loads real trained weights into the same (bucket, w)
  * shape and calls [[scoreWith]] unchanged.
  */
object QualityModel {

  /** Deterministic weight table: `dim` rows of (bucket, w) with
    * w ∈ [-1, 1), derived from md5(bucket ‖ salt).  Stand-in for a
    * trained model with the same schema; md5-derivation keeps it
    * bit-identical across engines and partitionings. */
  def hashedWeights(spark: SparkSession, dim: Int,
                    salt: String = "graft-qm"): DataFrame =
    spark.range(dim.toLong).select(
      col("id").as("bucket"),
      (conv(substring(md5(concat(col("id").cast("string"), lit(salt))),
          1, 8), 16, 10).cast("long") / lit(2147483648.0) - 1.0).as("w"))

  /** Score each document with an explicit (bucket, w) weight table:
    * mean weight of the hashed tokens (+ bias), rounded to 4 decimals,
    * and the keep decision at `threshold`.  `dim` must match the space
    * the weights were trained in. */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                weights: DataFrame, dim: Int, bias: Double = 0.0,
                threshold: Double = 0.0): DataFrame = {
    val bucketed = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("tok"))
      .select(col(idCol),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % dim).as("bucket"))
    val score = round(sum(col("w")) / count(lit(1)) + bias, 4)
    bucketed.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(score.as("score"))
      .withColumn("keep", col("score") > threshold)
  }

  /** [[scoreWith]] over the deterministic [[hashedWeights]] model. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                dim: Int = 1024, bias: Double = 0.0,
                threshold: Double = 0.0): DataFrame =
    scoreWith(docs, idCol, textCol,
      hashedWeights(docs.sparkSession, dim), dim, bias, threshold)
}
