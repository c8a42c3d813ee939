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
  *    back once per centroid component.
  *
  * Scale shape: each training iteration is one narrow corpus pass
  * against a broadcast k-row codebook plus a k-row aggregate (map-side
  * partial combine on both), so the exchanged bytes per iteration are
  * O(partitions × k × dim), independent of corpus size.  Training is
  * eager by nature (the loop), so [[kmeansCentroids]] collects the
  * k-row codebook into a LocalRelation and releases every block it
  * pinned before returning — downstream consumers ([[kmeans]]'s
  * report, [[clusterPrototypes]]) are then ordinary LAZY plans over
  * the corpus with zero session-lifetime cache footprint (the
  * round-12 rehearsal lesson). */
object Clustering {

  /** 2^20 — the dyadic quantization grid for exact centroid sums. */
  val QuantScale = 1048576L

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold L2 norm via higher-order functions (matches DuckDB's
    * in-order list_sum) — CodegenFallback, so only used on PINNED
    * inputs where it runs once per row (the ivfIndex discipline). */
  private def foldNorm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Fixed-dimension expanded forms — whole-stage-codegen friendly,
    * same left-fold summation order as the HOFs and DuckDB's
    * list_sum, so results are bit-identical (the Similarity
    * discipline). */
  private def dotExpanded(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)
  private def normExpanded(a: Column, dim: Int): Column =
    sqrt((1 to dim).map(i => element_at(a, i) * element_at(a, i))
      .reduce(_ + _))

  /** Train the codebook: `iters` Lloyd's iterations from the k
    * lowest-id seeds.  Returns a k-row LocalRelation
    * (cell, cv: array<double>, cv_norm) — the collected report of an
    * eager loop, so every pinned intermediate is released before
    * returning (getPersistentRDDs diff: checkpoint RDDs are not
    * reachable through the public DataFrame API). */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 8, dim: Int = 64,
                      iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import graft.plans.VectorLongSumAgg.vectorLongSum
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // pinned (v, v_norm, vq): the HOF norm is CodegenFallback and
    // unpinned would collapse into the per-candidate scoring
    // projection — k interpreted folds per corpus vector
    val v = embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("v_norm", foldNorm(col("v")))
      .withColumn("vq",
        transform(col("v"), x => round(x * QuantScale).cast("long")))
      .localCheckpoint()

    // corpus→cell cosine argmax; scoring rows stay skinny and the
    // k-per-vector candidates collapse map-side before exchange
    def assign(cent: DataFrame): DataFrame =
      v.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cell"),
          round(dotExpanded(col("v"), col("cv"), dim) /
            (col("v_norm") * col("cv_norm")), 6).as("csim"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cell"),
          struct(col("csim"), (-col("cell")).as("nc"))).as("cell"))

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
      val out = cent.select(col("cell"), col("cv"), col("cv_norm"))
      val rows = out.collect() // k rows — the codebook, not the corpus
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.toSeq.asJava, out.schema)
    } finally spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !pinnedBefore.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  /** Lazy corpus→cell assignment against a (broadcast) codebook:
    * (vec_id, cell, csim).  Norms use the EXPANDED codegen form, not
    * the HOF fold, so the whole pass — scan, score, max_by partials —
    * stays inside whole-stage codegen with zero pinned state; the two
    * forms share the left-fold summation order, so values are
    * bit-identical. */
  def kmeansAssign(embeddings: DataFrame, centroids: DataFrame,
                   dim: Int = 64): DataFrame =
    embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cell"),
        round(dotExpanded(col("v"), col("cv"), dim) /
          (normExpanded(col("v"), dim) * col("cv_norm")), 6).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell"), col("csim")),
        struct(col("csim"), (-col("cell")).as("nc"))).as("w"))
      .select(col("vec_id"), col("w.cell").as("cell"),
        col("w.csim").as("csim"))

  /** Lloyd's k-means report over `embeddings(vec_id, embedding,
    * label)`: one row per surviving cluster —
    * (cell, n_vecs, inertia_micro, top_label, purity).  Training is
    * eager ([[kmeansCentroids]]); the report itself is a lazy
    * aggregate over [[kmeansAssign]]. */
  def kmeans(embeddings: DataFrame, k: Int = 8, dim: Int = 64,
             iters: Int = 2): DataFrame = {
    val cent = kmeansCentroids(embeddings, k, dim, iters)
    val byLab = embeddings.select(col("vec_id"), col("label"))
      .join(kmeansAssign(embeddings, cent, dim), "vec_id")
      .select(col("cell"), col("label"),
        // inertia accumulates as exact integer micro-units: csim is
        // already on the 1e-6 grid, so round(csim·1e6) recovers the
        // exact integer and the sum is order-independent
        (lit(1000000L) - round(col("csim") * 1000000L).cast("long"))
          .as("micro"))
      .groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("cnt"), sum(col("micro")).as("im"))
    byLab.groupBy(col("cell"))
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
  }

  /** Per-cluster prototype selection: the `perCell` most CENTRAL
    * members of each cluster (highest cosine to their centroid, id
    * tiebreak) — the "keep the representatives" half of
    * cluster-then-thin curation (the complement of x22's SemDeDup
    * prune, which drops redundant members).  Bounded per-partition
    * heaps via the TopKPerKey physical operator — no corpus-wide
    * window, no full sort. */
  def clusterPrototypes(embeddings: DataFrame, k: Int = 8,
                        dim: Int = 64, iters: Int = 2,
                        perCell: Int = 10): DataFrame = {
    val cent = kmeansCentroids(embeddings, k, dim, iters)
    graft.plans.TopKPerKey.topKPerKey(
      kmeansAssign(embeddings, cent, dim),
      Seq(col("cell")), Seq(col("csim").desc, col("vec_id").asc), perCell)
  }
}
