package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a full scan of the corpus; Spark turns this into a
  * narrow map + per-partition top-k + final merge (TakeOrdered), no
  * all-pairs shuffle.
  *
  * Scale path: random-hyperplane LSH — map-side bucket signature per
  * vector, equi-join on bucket, exact re-rank within bucket.  At 100 TB
  * the bucket join replaces the corpus broadcast; recall is tunable by
  * #hyperplanes / #tables.
  *
  * Arithmetic note: dot products fold left-to-right in DOUBLE so scores
  * are deterministic; ranking keys round to 6 decimals and tie-break on
  * id so rank order is stable across engines and partitionings.
  */
object Similarity {

  /** Left-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors.  Ranking key = (round(cos,6) desc, id asc). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = queries.select(col("vec_id").as("q_id"), col("embedding").as("q"))
      .crossJoin(corpus.select(col("vec_id").as("c_id"), col("embedding").as("c")))
      .withColumn("score", round(cosine(col("q"), col("c")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Random-hyperplane signature: bit h = sign of <v, plane_h> where
    * plane components are ±1 derived from md5(h:i) — deterministic,
    * engine-portable, no stored plane matrix. */
  def hyperplaneSig(v: Column, dim: Int, planes: Int): Column =
    concat((0 until planes).map { h =>
      val proj = (0 until dim).map { i =>
        val sign = if (Integer.parseInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$h:$i".getBytes("UTF-8")).take(1).map("%02x".format(_))
            .mkString.substring(0, 1), 16) >= 8) 1.0 else -1.0
        element_at(v, i + 1).cast("double") * sign
      }.reduce(_ + _)
      when(proj >= 0, "1").otherwise("0")
    }: _*)

  /** LSH-bucketed ANN: bucket both sides by hyperplane signature,
    * equi-join on bucket, exact cosine re-rank within bucket.  Misses
    * only neighbors landing in a different bucket (recall measured in
    * the test suite against [[bruteForceTopK]]). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int = 64, planes: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qb = queries.select(col("vec_id").as("q_id"), col("embedding").as("q"),
      hyperplaneSig(col("embedding"), dim, planes).as("bucket"))
    val cb = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c"),
      hyperplaneSig(col("embedding"), dim, planes).as("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    qb.join(cb, "bucket")
      .withColumn("score", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a<b) pairs above a
    * cosine threshold.  Brute-force within the corpus — the embedding
    * analog of [[Dedup.blockedJaccardPairs]]; at scale, block by LSH
    * bucket first (same join shape as [[lshTopK]]). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("score", round(cosine(col("va"), col("vb")), 6))
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), col("score"))
  }
}
