package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-partitioned aggregation on a 16-byte key —
  *    the only full shuffle, and it shuffles *keys*, not documents;
  *  - MinHash signatures are computed map-side (narrow); the LSH band
  *    explode multiplies rows by #bands but each row is (band_key,
  *    doc_id) — tiny — and the candidate self-join is an equi-join on
  *    band_key, so Spark hash-partitions it and only same-bucket docs
  *    ever meet.  Skewed buckets (boilerplate-heavy corpora) are handled
  *    by AQE skew-join splitting;
  *  - the verify step re-joins token sets only for candidate pairs —
  *    O(candidates), not O(n²).
  *
  * All hash functions are md5-derived so results are engine-portable
  * (same answers from Spark and the DuckDB oracle) and stable across
  * runs/partitionings.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint, keep the smallest id —
    * deterministic first-wins (reference analog: station dedup,
    * `cmu.js:143-166`). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles; documents shorter than n collapse to one
    * whole-text shingle. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(toks, i + lit(j))): _*)))

  /** One min-wise hash: lexicographic min of md5(seed || ':' || shingle).
    * md5-as-random-oracle gives an independent permutation per seed and
    * is bit-identical across engines. */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol,
      sh => md5(concat(lit(seed.toString), lit(":"), sh))))

  /** MinHash signature matrix: k hashes as an array column. */
  def signature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(minhash(shingleCol, _)): _*)

  /** docs(id, text) → (id, sig) with a k-hash signature over n-gram
    * shingles.  Narrow (map-side only). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 8): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      signature(shingles(TextAnalysis.tokens(col(textCol)), n), k).as("sig"))

  /** LSH banding: k sigs → k/rows bands, band key = md5(band idx ||
    * joined sigs).  Returns (band_key, doc_id) — the exploded, shuffled
    * unit is this 2-column row, never the document. */
  def lshBands(sigs: DataFrame, rows: Int): DataFrame = {
    val k = sigs.schema("sig").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val _ = k // signature arity checked at runtime by slice bounds
    sigs.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), (size(col("sig")) / rows).cast("int") - 1),
        b => md5(concat(b.cast("string"), lit("|"),
          array_join(slice(col("sig"), b * rows + 1, lit(rows)), ","))))))
      .select(col("doc_id"), col("col").as("band_key"))
  }

  /** Candidate pairs: docs sharing ≥1 band.  Equi self-join on band_key
    * (hash-partitioned, AQE-skew-split), deduped. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band_key"), col("doc_id").as("a"))
    val b = bands.select(col("band_key"), col("doc_id").as("b"))
    a.join(b, "band_key").filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Exact Jaccard over distinct token sets for a pair of token arrays. */
  def jaccard(ta: Column, tb: Column): Column = {
    val da = array_distinct(ta)
    val db = array_distinct(tb)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - inter)
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bands → candidate
    * pairs → exact-Jaccard verification at `threshold`.  Output
    * (a, b, jaccard) — only verified near-dups survive, so LSH recall
    * (not precision) is the only approximation. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 8, bandRows: Int = 2,
                      threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)
    val cands = lshCandidates(lshBands(sigs, bandRows))
    val toks = docs.select(col(idCol).as("doc_id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("toks"))
    cands
      .join(toks.withColumnRenamed("doc_id", "a").withColumnRenamed("toks", "ta"), "a")
      .join(toks.withColumnRenamed("doc_id", "b").withColumnRenamed("toks", "tb"), "b")
      .withColumn("jaccard", jaccard(col("ta"), col("tb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Exact blocked n-gram-Jaccard join: all pairs within a blocking key
    * (language, length bucket, …) scored exactly.  The oracle-checkable
    * ground truth for the LSH path; quadratic only within blocks. */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockCol: String, threshold: Double): DataFrame = {
    val t = docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("toks"))
    val a = t.select(col("blk"), col("id").as("a"), col("toks").as("ta"))
    val b = t.select(col("blk"), col("id").as("b"), col("toks").as("tb"))
    a.join(b, "blk").filter(col("a") < col("b"))
      .withColumn("jaccard", jaccard(col("ta"), col("tb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 16-bit SimHash from md5 nibbles: per bit position b, sum ±1 over
    * tokens by whether hex nibble b of md5(token) has its high bit set;
    * fingerprint bit b = (sum > 0).  Engine-portable ('8' ≤ nibble char
    * compares identically everywhere). */
  def simhash16(toks: Column): Column =
    (0 until 16).map { bit =>
      val contrib = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(substring(md5(t), bit + 1, 1) >= "8", 1).otherwise(-1))
      when(contrib > 0, lit(1 << bit)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Hamming distance between two simhash ints (for near-dup banding on
    * fingerprints). */
  def hamming16(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
