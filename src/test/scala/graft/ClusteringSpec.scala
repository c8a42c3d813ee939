package graft

import org.apache.spark.sql.functions._
import graft.ext.Clustering

/** Deterministic k-means (x100): partition totals, exact replay under
  * repartitioning (the dyadic-grid claim), and pinned-block hygiene. */
class ClusteringSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf0001)

  test("kmeans partitions the corpus and reports sane stats") {
    val total = emb.count()
    val out = Clustering.kmeans(emb, k = 8, dim = 64, iters = 2)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("inertia_micro") >= 0L)
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
    }
    // cells are named by their seed vector — the k lowest ids
    val seeds = emb.orderBy(col("vec_id")).limit(8)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(rows.map(_.getAs[Long]("cell")).toSet.subsetOf(seeds))
  }

  test("kmeans replays bit-identically under repartitioning") {
    val a = Clustering.kmeans(emb, k = 8, dim = 64, iters = 2)
      .collect().map(_.toString).sorted
    val b = Clustering.kmeans(emb.repartition(7), k = 8, dim = 64,
        iters = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("clusterPrototypes equals the window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    val cent = Clustering.kmeansCentroids(emb, k = 8, dim = 64, iters = 2)
    val a = Clustering.kmeansAssign(emb, cent)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("csim").desc, col("vec_id").asc)
    val ref = a.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).drop("rk")
      .collect().map(_.toString).sorted
    val got = Clustering.clusterPrototypes(emb, k = 8, dim = 64,
        iters = 2, perCell = 10)
      .collect().map(_.toString).sorted
    assert(got.sameElements(ref))
  }

  test("the clustering family plans are join-free (kernel assignment)") {
    // the NearestCellExpr contract: assignment is a map-only
    // projection, so NO join node of any kind may enter these plans —
    // a re-join of the corpus by id is the fat-exchange regression the
    // 100x probe measured at ~17 s/stage
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cent = Clustering.kmeansCentroids(emb, k = 4, dim = 64,
        iters = 1)
      val plans = Seq(
        "assign" -> Clustering.kmeansAssign(emb, cent),
        "report" -> Clustering.kmeans(emb, k = 4, dim = 64, iters = 1),
        "protos" -> Clustering.clusterPrototypes(emb, k = 4, dim = 64,
          iters = 1, perCell = 3))
      for ((tag, df) <- plans) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("Join") && !p.contains("CartesianProduct"),
          s"$tag plan contains a join:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("codebook save/load round-trips routing; loader refuses " +
    "non-codebook tables") {
    val cent = Clustering.kmeansCentroids(emb, k = 4, dim = 64, iters = 1)
    val direct = Clustering.kmeansAssign(emb, cent)
      .collect().map(_.toString).sorted
    dropTableFully("g_km_cb")
    Clustering.saveCentroids(cent, "g_km_cb")
    val loaded = Clustering.loadCentroids(spark, "g_km_cb")
    val via = Clustering.kmeansAssign(emb, loaded)
      .collect().map(_.toString).sorted
    assert(via.sameElements(direct))
    dropTableFully("g_km_not")
    emb.limit(1).write.saveAsTable("g_km_not")
    val e = intercept[IllegalArgumentException](
      Clustering.loadCentroids(spark, "g_km_not"))
    assert(e.getMessage.contains("not a graft k-means codebook"))
    dropTableFully("g_km_cb"); dropTableFully("g_km_not")
  }

  test("kmeans releases every block it pins") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Clustering.kmeans(emb, k = 4, dim = 64, iters = 1).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked pinned RDDs: $leaked")
  }

  test("kmeansCentroids leaves a concurrently pinned block alone") {
    // The finally block must unpersist ONLY the checkpoint it created;
    // a session-global diff would evict this bystander's blocks too.
    import spark.implicits._
    val bystander = Seq(1L, 2L, 3L).toDF("x").localCheckpoint()
    val pinned = org.apache.spark.sql.graftbridge.ColumnBridge
      .pinnedRddIds(bystander).toSet
    assert(pinned.nonEmpty)
    Clustering.kmeansCentroids(emb, k = 4, dim = 64, iters = 1).collect()
    val alive = spark.sparkContext.getPersistentRDDs.keySet
    assert(pinned.subsetOf(alive),
      s"kmeansCentroids evicted a concurrent pin: ${pinned -- alive}")
    assert(bystander.count() == 3)
    pinned.foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
  }

  test("ragged input vectors fail loudly, not with truncated cosines") {
    import graft.plans.{Codebook, NearestCell}
    import spark.implicits._
    val cb = Codebook.of(Seq(0L -> Array(1.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0)))
    val bad = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
      .select(NearestCell.nearestCell($"v", cb))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("codebook dim")),
      s"expected a dimension-mismatch error, got: $e")
    // ragged CODEBOOKS are rejected at construction
    val c = intercept[IllegalArgumentException](
      Codebook.of(Seq(0L -> Array(1.0), 1L -> Array(1.0, 2.0))))
    assert(c.getMessage.contains("share one dimension"))
  }

  test("codebook equality is structural (expression canonicalization)") {
    import graft.plans.{Codebook, NearestCellExpr}
    import org.apache.spark.sql.catalyst.expressions.Literal
    def mk() = Codebook.of(Seq(0L -> Array(1.0, 2.0), 5L -> Array(3.0, 4.0)))
    assert(mk() == mk() && mk().hashCode == mk().hashCode)
    val child = Literal.create(Seq(1.0, 0.0),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
    val e1 = NearestCellExpr(child, mk())
    val e2 = NearestCellExpr(child, mk())
    assert(e1 == e2 && e1.semanticEquals(e2),
      "two NearestCellExpr over structurally equal codebooks must " +
        "canonicalize equal (CSE / exchange reuse)")
  }

  test("zero-norm corpus vector: graceful NaN at assignment, the " +
    "documented ANSI throw at the x100 report (oracle-symmetric)") {
    import spark.implicits._
    val base = emb.limit(20)
    val zero = Seq((999999L,
      Seq.fill(64)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    val corpus = base.unionByName(zero)
    // assignment alone stays graceful: NaN csim, lowest cell
    val cent = Clustering.kmeansCentroids(base, k = 2, dim = 64, iters = 1)
    val z = Clustering.kmeansAssign(corpus, cent)
      .filter($"vec_id" === 999999L).head()
    assert(z.getAs[Double]("csim").isNaN)
    // the report quantizes csim and must throw under ANSI — the same
    // row fails DuckDB's CAST(round(...) AS BIGINT) identically
    val e = intercept[Exception](
      Clustering.kmeans(corpus, k = 2, dim = 64, iters = 1).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("CAST_INVALID_INPUT") ||
      m.contains("cannot be cast") || m.contains("NaN")),
      s"expected the documented ANSI cast failure, got: $e")
  }
}
