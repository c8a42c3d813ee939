package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's) over an embedding
  * column — the clustering primitive SemDeDup-style curation pipelines
  * run before per-cluster pruning, exposed as a first-class,
  * oracle-checkable operator rather than an index-training detail.
  *
  * [[Similarity.ivfIndexRefined]] already runs Lloyd's to train IVF
  * codebooks, but its [[graft.plans.VectorAvgAgg]] centroid means are
  * deterministic only up to FP associativity — acceptable there
  * because codebook quality steers recall, not answers.  Here the
  * cluster REPORT is the answer, so every step is made exactly
  * replayable by a SQL engine:
  *
  *  - init: centroids = the k lowest-id vectors (distributed top-k,
  *    not a global sort);
  *  - assign: cosine argmax against the broadcast codebook, rounded to
  *    6 decimals, ties to the lowest cell — the skinny
  *    max_by-aggregate shape of `Similarity.assignCells` (vectors
  *    never ride a replicated shuffle);
  *  - update: components quantized to the 2^20 dyadic grid and summed
  *    as LONGS ([[graft.plans.VectorLongSumAgg]], map-side combining)
  *    — exact and order-independent, the
  *    [[QualityModel.trainQualityModel]] discipline — then divided
  *    back once per centroid component;
  *  - report: per-cluster size, inertia as exact integer micro-units
  *    (sum of 1e6·(1−cos) over members), majority label and purity.
  *
  * Scale shape: each iteration is one narrow corpus pass against a
  * broadcast k-row codebook plus a k-row aggregate (map-side partial
  * combine on both), so the exchanged bytes per iteration are
  * O(partitions × k × dim), independent of corpus size.  The final
  * k-row report is collected and returned as a LocalRelation so every
  * pinned intermediate can be released before returning — no
  * session-lifetime cache accumulation (the round-12 rehearsal
  * lesson). */
object Clustering {

  /** 2^20 — the dyadic quantization grid for exact centroid sums. */
  val QuantScale = 1048576L

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold L2 norm (matches DuckDB's in-order list_sum). */
  private def foldNorm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Fixed-dimension expanded dot product — codegen-friendly, same
    * summation order as the left-fold (the Similarity discipline). */
  private def dotExpanded(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  /** Lloyd's k-means report over `embeddings(vec_id, embedding,
    * label)`: one row per surviving cluster —
    * (cell, n_vecs, inertia_micro, top_label, purity). */
  def kmeans(embeddings: DataFrame, k: Int = 8, dim: Int = 64,
             iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import graft.plans.VectorLongSumAgg.vectorLongSum
    // pinned-block bookkeeping: the checkpoint RDDs are not reachable
    // through the public DataFrame API, so diff getPersistentRDDs
    // around the calls (the trainQualityModel pattern)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val v = embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"),
        col("label"))
      .withColumn("v_norm", foldNorm(col("v")))
      .withColumn("vq",
        transform(col("v"), x => round(x * QuantScale).cast("long")))
      .localCheckpoint()

    // corpus→cell cosine argmax; scoring rows stay skinny and the
    // nlist-per-vector candidates collapse map-side before exchange
    def assign(cent: DataFrame): DataFrame =
      v.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cell"),
          round(dotExpanded(col("v"), col("cv"), dim) /
            (col("v_norm") * col("cv_norm")), 6).as("csim"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cell"), col("csim")),
          struct(col("csim"), (-col("cell")).as("nc"))).as("w"))
        .select(col("vec_id"), col("w.cell").as("cell"),
          col("w.csim").as("csim"))

    var cent = v.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cell"), col("v").as("cv"),
        col("v_norm").as("cv_norm"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        cent = v.join(assign(cent), "vec_id")
          .groupBy(col("cell"))
          .agg(vectorLongSum(col("vq")).as("s"), count(lit(1)).as("n"))
          .select(col("cell"), transform(col("s"),
            x => (x.cast("double") / col("n")) / QuantScale).as("cv"))
          .withColumn("cv_norm", foldNorm(col("cv")))
          // empty cells vanish from the groupBy; a degenerate
          // zero-vector centroid (mean of opposing members) would null
          // every cosine against it — drop it like an empty cell
          .filter(col("cv_norm") > 0)
          .localCheckpoint() // k rows; HOF norm is fine off the hot path
      }
      val byLab = v.join(assign(cent), "vec_id")
        .select(col("cell"), col("label"),
          // inertia accumulates as exact integer micro-units: csim is
          // already on the 1e-6 grid, so round(csim·1e6) recovers the
          // exact integer and the sum is order-independent
          (lit(1000000L) - round(col("csim") * 1000000L).cast("long"))
            .as("micro"))
        .groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("cnt"), sum(col("micro")).as("im"))
      val out = byLab.groupBy(col("cell"))
        .agg(sum(col("cnt")).as("n_vecs"),
          sum(col("im")).as("inertia_micro"),
          max_by(col("label"),
            struct(col("cnt"), (-col("label")).as("nl"))).as("top_label"),
          max_by(col("cnt"),
            struct(col("cnt"), (-col("label")).as("nl"))).as("top_cnt"))
        .select(col("cell"), col("n_vecs"), col("inertia_micro"),
          col("top_label"),
          round(col("top_cnt").cast("double") / col("n_vecs"), 6)
            .as("purity"))
      val rows = out.collect() // k rows — the report, not the corpus
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.toSeq.asJava, out.schema)
    } finally spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !pinnedBefore.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
