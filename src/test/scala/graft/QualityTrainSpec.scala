package graft

import graft.ext.QualityModel
import org.apache.spark.sql.functions._

class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Two disjoint vocabularies: "good" docs speak g-words, "bad" docs
    * b-words, so a working trainer must separate them. */
  private def corpus = (
    (0 until 10).map(i => (i.toLong, s"alpha beta gamma tok$i", true)) ++
    (10 until 20).map(i => (i.toLong, s"zeta eta theta tok$i", false))
  ).toDF("doc_id", "text", "y")

  private val DIM = 16

  /** Plain-Scala replay of the documented update rule over collected
    * (doc, bucket, count) features — an independent single-machine
    * oracle for the distributed trainer. */
  private def replay(iters: Int): Array[Double] = {
    val feats = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % DIM).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt,
        r.getLong(2).toDouble))
    val ys = corpus.select(col("doc_id"), col("y").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var w = Array.fill(DIM)(0.0)
    for (_ <- 0 until iters) {
      val z = feats.groupBy(_._1).map { case (d, fs) =>
        d -> fs.map { case (_, b, x) => w(b) * x }.sum
      }
      val p = z.map { case (d, zz) =>
        d -> math.max(0.0, math.min(1.0, zz * 0.25 + 0.5))
      }
      val g = Array.fill(DIM)(0.0)
      feats.foreach { case (d, b, x) => g(b) += (p(d) - ys(d)) * x }
      w = Array.tabulate(DIM) { b =>
        val stepped = w(b) - g(b) / 32768.0
        val quant = math.floor(stepped * 1048576.0 + 0.5) / 1048576.0
        math.max(-8.0, math.min(8.0, quant))
      }
    }
    w
  }

  private def train(df: org.apache.spark.sql.DataFrame, iters: Int) =
    QualityModel.trainQualityModel(df, "doc_id", "text", col("y"),
        dim = DIM, iters = iters)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1))
      .sortBy(_._1).map(_._2)

  test("distributed training equals the plain-Scala replay bit-for-bit," +
    " at 1 and 4 iterations") {
    for (it <- Seq(1, 4)) {
      val got = train(corpus, it)
      val want = replay(it)
      assert(got.toSeq === want.toSeq, s"iters=$it")
    }
  }

  test("weights are invariant under repartitioning (exact-arithmetic " +
    "claim: shuffle order cannot change the model)") {
    val a = train(corpus, 4)
    val b = train(corpus.repartition(7), 4)
    val c = train(corpus.repartition(1), 4)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
  }

  test("every weight sits on the 2^-20 dyadic grid within [-8, 8]") {
    val w = train(corpus, 4)
    w.foreach { v =>
      assert(v.abs <= 8.0)
      val k = v * 1048576.0
      assert(k == math.rint(k), s"$v is off-grid")
    }
  }

  test("trained model separates the classes through the unchanged " +
    "scoreWith path") {
    val model = QualityModel.trainQualityModel(corpus, "doc_id", "text",
      col("y"), dim = DIM, iters = 4)
    val scored = QualityModel.scoreWith(corpus, "doc_id", "text",
        model, dim = DIM)
      .join(corpus.select("doc_id", "y"), "doc_id")
      .select(col("y"), col("score")).collect()
      .map(r => (r.getBoolean(0), r.getDouble(1)))
    val good = scored.filter(_._1).map(_._2)
    val bad = scored.filterNot(_._1).map(_._2)
    assert(good.min > bad.max,
      s"expected separation, got good=${good.toSeq} bad=${bad.toSeq}")
  }

  test("persisted model reloads with its dim and scores identically") {
    val model = QualityModel.trainQualityModel(corpus, "doc_id", "text",
      col("y"), dim = DIM, iters = 2)
    spark.sql("DROP TABLE IF EXISTS qm_model_t")
    QualityModel.saveQualityModel(model, "qm_model_t", dim = DIM)
    val (loaded, dim) = QualityModel.loadQualityModel(spark, "qm_model_t")
    assert(dim === DIM)
    val a = QualityModel.scoreWith(corpus, "doc_id", "text", model, DIM)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = QualityModel.scoreWith(corpus, "doc_id", "text", loaded, dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
    spark.sql("DROP TABLE IF EXISTS qm_model_t")
    // a non-model table is refused
    corpus.limit(1).write.mode("overwrite").saveAsTable("qm_not_model")
    intercept[RuntimeException] {
      QualityModel.loadQualityModel(spark, "qm_not_model")
    }
    spark.sql("DROP TABLE IF EXISTS qm_not_model")
  }

  test("evaluateModel reports a perfect confusion matrix on the " +
    "separable corpus") {
    val model = QualityModel.trainQualityModel(corpus, "doc_id", "text",
      col("y"), dim = DIM, iters = 4)
    val r = QualityModel.evaluateModel(corpus, "doc_id", "text",
      col("y"), model, DIM).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((10L, 0L, 10L, 0L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6))
      === ((1.0, 1.0, 1.0)))
  }

  test("trainer runs at wide feature dims (the broadcast-dimension " +
    "form - an array-literal plan would not)") {
    val w = QualityModel.trainQualityModel(corpus, "doc_id", "text",
        col("y"), dim = 4096, iters = 1)
      .collect()
    assert(w.length === 4096)
    assert(w.exists(_.getDouble(1) != 0.0), "training must move weights")
  }

  test("trainer validates its parameters") {
    intercept[IllegalArgumentException] {
      QualityModel.trainQualityModel(corpus, "doc_id", "text", col("y"),
        dim = 1)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainQualityModel(corpus, "doc_id", "text", col("y"),
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainQualityModel(corpus, "doc_id", "text", col("y"),
        lrShift = 41)
    }
  }
}
