package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge TRAINING — the learning half of the subword
  * stack ([[TextAnalysis.vocabTokenStats]] / the x76 VocabEncode kernel
  * is the applying half): learn the `merges` highest-frequency symbol
  * pair merges from the corpus, Sennrich-style ("Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 — the
  * word-level formulation), with fully deterministic tie-breaking so
  * two engines learn byte-identical merge tables.
  *
  * Scale design (the part that matters at 100 TB): training never
  * iterates over the corpus.  The corpus is folded ONCE into the
  * distinct-word count table — vocabulary-sized, Heaps-law small — and
  * every merge round operates on that table only (count adjacent
  * symbol pairs weighted by word count → argmax → apply the merge).
  * Per round the driver receives exactly ONE row (the argmax pair —
  * the watermark-read class of collect, same discipline as Lloyd's
  * rounds in [[Similarity.ivfIndexRefined]]); the words table is
  * localCheckpointed every round so round r+1 doesn't replay rounds
  * 0..r.
  *
  * Symbol streams are stored as a single string — one leading and
  * trailing space, DOUBLE spaces between symbols (' t  h  e ') — so
  * applying merge (a, b) is one engine-portable
  * `replace(s, ' a  b ', ' ab ')`: left-to-right non-overlapping
  * replacement is exactly BPE's greedy within-round merge ("a a a"
  * under merge (a,a) → "aa a"), and Spark's `replace` and DuckDB's
  * `replace` agree on it byte-for-byte, which is what makes the merge
  * table oracle-checkable without any custom kernel.  Symbols never
  * contain spaces (characters and their concatenations), so the
  * delimiter is unambiguous.  Pair counts follow the classic
  * convention: every ADJACENT occurrence counts, overlaps included.
  * No end-of-word marker symbol — merges cannot cross words because
  * every word is its own stream; add one by appending a sentinel to
  * `word` before calling if Sennrich-exact vocab is needed.
  *
  * Ties break (count desc, sym_a asc, sym_b asc).  Runs `merges`
  * rounds, stopping early when a round has no adjacent pairs left
  * (single-symbol streams only, or an empty corpus) and returning the
  * merges learned so far — the fixed-round unrolled oracle replays the
  * stop exactly, because an empty round-r argmax empties every later
  * round's CTE too.
  *
  * Output: (round, sym_a, sym_b, merged, pair_count) — `merges` rows,
  * round 0-based in learning order.
  */
object Bpe {

  /** One corpus pass → (word, cnt), the vocabulary-sized table all
    * rounds run on. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    bpeTrainOnWords(wordCounts(docs, textCol), merges)

  /** Train on a precomputed (word, cnt) table. */
  def bpeTrainOnWords(words: DataFrame, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1 (got $merges)")
    val spark = words.sparkSession
    // char symbols, doubled-space encoded; vocab-sized, pinned
    var cur = words.select(
        concat(lit(" "),
          array_join(split(col("word"), ""), "  "),
          lit(" ")).as("s"),
        col("cnt"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    var exhausted = false
    for (r <- 0 until merges if !exhausted) {
      // adjacent pairs from the doubled-space stream, weighted by cnt.
      // Single-symbol streams contribute none — and must be guarded
      // explicitly: Spark's sequence(1, 0) counts DOWN ([1, 0]), it is
      // not empty.
      val syms = split(trim(col("s")), "  ")
      val pairsOf = when(size(syms) >= 2, transform(
          sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("a"),
            element_at(syms, i + lit(1)).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val best = cur
        .select(col("cnt"), explode(pairsOf).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // ONE argmax row per round (see scaladoc)
      if (best.isEmpty) exhausted = true // no pairs left: stop learning
      else {
        val Row(a: String, b: String, c: Long) = best(0)
        learned += ((r, a, b, a + b, c))
        // literal (non-regex) replace — codegen'd StringReplace, same
        // left-to-right non-overlap semantics as the oracle's replace
        cur = cur.withColumn("s", call_function("replace",
            col("s"), lit(s" $a  $b "), lit(s" ${a + b} ")))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    learned.result()
      .toDF("round", "sym_a", "sym_b", "merged", "pair_count")
  }

  /** Flatten a learned merge table into the vocab [[
    * TextAnalysis.vocabTokenStats]] / the VocabEncode kernel consume —
    * the bridge from BPE TRAINING (x81) to greedy longest-match APPLY
    * (x76): base characters observed in the corpus (sorted, so ids are
    * stable) followed by the merged symbols in learning order.  Note
    * the two apply modes differ by construction — VocabEncode is
    * greedy longest-match (WordPiece-style) while [[bpeEncodeCounts]]
    * replays merges in learned order (BPE-style); both are standard,
    * and this vocab makes the trained symbols available to the former.
    * Driver-side result (vocabulary-sized, the merge table is k rows). */
  def mergeVocab(docs: DataFrame, textCol: String,
                 merges: Int): Seq[String] = {
    val merged = bpeTrain(docs, textCol, merges)
      .orderBy(col("round")).select(col("merged")).collect()
      .map(_.getString(0))
    val chars = wordCounts(docs, textCol)
      .select(explode(split(col("word"), "")).as("ch"))
      .distinct().orderBy(col("ch")).collect().map(_.getString(0))
    (chars ++ merged).distinct.toSeq
  }

  /** Apply a learned merge sequence and count the resulting subword
    * tokens per document — the trained-tokenizer token meter (x76's
    * vocab meter with merges learned from THIS corpus instead of a
    * frozen vocab; every token-denominated knob — mixture weights,
    * budget select, pack budgets — can now run on learned-BPE counts).
    *
    * Scale shape: the merge chain (a `merges`-step nested literal
    * replace, fully codegen'd) runs over the DISTINCT-word table —
    * vocabulary-sized — never over the corpus; per-doc counts come from
    * one exploded (doc_id, word) pass joined to that broadcast
    * word→n_syms dimension.  Merges are collected driver-side first
    * (`merges` rows, the watermark-read class).
    *
    * Output: (doc_id, n_words, bpe_tokens). */
  def bpeEncodeCounts(docs: DataFrame, idCol: String, textCol: String,
                      merges: Int): DataFrame = {
    val learned = bpeTrain(docs, textCol, merges)
      .orderBy(col("round")).select(col("sym_a"), col("sym_b")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val words = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val start = concat(lit(" "),
      array_join(split(col("word"), ""), "  "), lit(" "))
    val encoded = learned.foldLeft(start) { case (e, (a, b)) =>
      call_function("replace", e, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    val wordSyms = words.select(col("word")).distinct()
      .select(col("word"),
        size(split(trim(encoded), "  ")).cast("long").as("__n_syms"))
    words.join(broadcast(wordSyms), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n_syms")).as("bpe_tokens"))
  }
}
