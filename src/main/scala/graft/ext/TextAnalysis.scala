package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All pure `Column` expressions — narrow, codegen-friendly, no shuffle;
  * at 100 TB these run map-side at scan speed and are the cheap first
  * pass before any dedup/similarity shuffle.
  */
object TextAnalysis {

  /** Tokenization.  Two modes, selected by the session conf
    * `spark.graft.tokenizer`:
    *
    *  - `unicode` (default since round 8): real-corpus tokenization —
    *    tokens are maximal runs of non-punctuation non-whitespace
    *    (`(?U)[^\p{P}\s]+`), so Unicode punctuation breaks tokens and
    *    Unicode whitespace (NBSP, em/en spaces, ideographic space, …)
    *    separates them.  Contractions split ("don't" → "don t"); that
    *    is the standard cheap-tokenizer trade.  ONE codegen'd
    *    `regexp_extract_all` pass — round 8 ran two `regexp_replace`
    *    passes plus a regex split, which taxed every token-path query
    *    1.2–1.4×; extracting token runs folds the punctuation strip
    *    and the edge trim into the single scan.  (Divergence from the
    *    3-pass version: a text of ONLY punctuation/whitespace now
    *    yields an empty array instead of a lone `""` token — the
    *    empty token was an artifact, not a semantic.)
    *  - `simple`: split on the literal `sep` (single space) — the
    *    oracle-parity fallback.
    *
    * Oracle parity under the unicode default: the synthetic corpus is
    * single-spaced lowercase ASCII with no punctuation (verified:
    * distinct charset is exactly `[a-z ]`, zero double/leading/
    * trailing spaces), so both modes produce byte-identical token
    * arrays on the test tables and the DuckDB oracles keep their plain
    * `string_split(text, ' ')` — TextAnalysisSpec pins the
    * equivalence on ASCII and the divergence on messy text.
    *
    * An EXPLICIT non-default `sep` always wins (callers that pass one
    * are pinning semantics, e.g. tests and the oracle queries). */
  def tokens(text: Column, sep: String = " "): Column = {
    val mode =
      try org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.tokenizer", "unicode")
      catch { case _: IllegalStateException => "unicode" } // no session yet
    if (mode == "unicode" && sep == " ")
      regexp_extract_all(text, lit("(?U)[^\\p{P}\\s]+"), lit(0))
    else split(text, sep)
  }

  /** n-gram language-ID heuristic: marker-stopword hit counts per
    * language, argmax with deterministic preference order, `und` when no
    * marker fires.  (A production build swaps the marker sets for
    * char-n-gram profiles; the operator shape — per-row scoring over a
    * token array — is identical.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is"),
    "es" -> Seq("el", "los", "una"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "les", "une"))

  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  def langId(toks: Column): Column = {
    val hits = langMarkers.map { case (l, m) => l -> markerHits(toks, m) }
    val best = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(best > 0 && h === best, l).otherwise(acc)
    }
  }

  /** Quality scoring: token count, byte count, mean token length,
    * stopword ratio, non-alpha ratio — the usual cheap quality gates. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "is", "and", "to", "in")

  def nTokens(toks: Column): Column = size(toks)

  def stopwordRatio(toks: Column): Column =
    markerHits(toks, stopwords).cast("double") / size(toks)

  def meanTokenLen(text: Column, toks: Column): Column =
    (length(text) - (size(toks) - 1)).cast("double") / size(toks)

  def qualityOk(toks: Column, minTokens: Int = 10, maxTokens: Int = 100000,
                minStopRatio: Double = 0.0): Column =
    size(toks).between(minTokens, maxTokens) &&
      stopwordRatio(toks) >= minStopRatio

  /** Language ID over whole documents via the explode + codegen'd
    * conditional-sum plan: tokens explode map-side, per-language marker
    * hits partial-aggregate before the (id, 4×int) shuffle, argmax runs
    * post-agg.  Same numbers as [[langId]] (whose `filter` higher-order
    * lambdas evaluate interpreted, outside whole-stage codegen) — the
    * same rewrite that bought ~10× on minhash/simhash. */
  def langIdByDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("tok"))
    val hitCols = langMarkers.map { case (l, m) =>
      sum(when(col("tok").isin(m: _*), 1).otherwise(0)).as(s"h_$l")
    }
    val agged = ex.groupBy(col(idCol)).agg(hitCols.head, hitCols.tail: _*)
    val best = greatest(langMarkers.map { case (l, _) => col(s"h_$l") }: _*)
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
      when(best > 0 && col(s"h_$l") === best, l).otherwise(acc)
    }
    agged.select(col(idCol), pred.as("lang_pred"))
  }

  /** [[langIdByDoc]] plus the CONFIDENCE the bare argmax hides: how
    * decisively the winning language won (margin = top hits − runner-up
    * hits) and whether more than one language's markers fired at all
    * (`mixed`) — the code-switching / concatenated-page signal that a
    * hard label cannot carry.  Low-margin or mixed docs are the ones a
    * pipeline routes to a heavier classifier or drops.  Same explode +
    * codegen conditional-sum shape as langIdByDoc; the ranking is an
    * array_sort over #languages values per row — constant work. */
  def langIdMargin(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val ex = docs.select(col(idCol),
      explode(tokens(col(textCol))).as("tok"))
    val hitCols = langMarkers.map { case (l, m) =>
      sum(when(col("tok").isin(m: _*), 1).otherwise(0)).as(s"h_$l")
    }
    val agged = ex.groupBy(col(idCol)).agg(hitCols.head, hitCols.tail: _*)
    val best = greatest(langMarkers.map { case (l, _) => col(s"h_$l") }: _*)
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), acc) =>
      when(best > 0 && col(s"h_$l") === best, l).otherwise(acc)
    }
    val sorted = array_sort(array(
      langMarkers.map { case (l, _) => col(s"h_$l") }: _*))
    val n = langMarkers.size
    val top = element_at(sorted, n)
    val second = element_at(sorted, n - 1)
    agged.select(col(idCol), pred.as("lang_pred"),
      top.cast("long").as("top_hits"),
      second.cast("long").as("second_hits"),
      (top - second).cast("long").as("margin"),
      (second > 0).as("mixed"))
  }

  /** Quality metrics over whole documents, explode + codegen'd
    * conditional sums (no interpreted HOF).  Column contract matches the
    * [[stopwordRatio]]/[[meanTokenLen]]/[[qualityOk]] expression forms:
    * (id, n_tokens:int, stop_ratio, mean_token_len, quality_ok). */
  def qualityByDoc(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Int, maxTokens: Int,
                   minStopRatio: Double): DataFrame = {
    val ex = docs.select(col(idCol), length(col(textCol)).as("__len"),
      explode(tokens(col(textCol))).as("tok"))
    val n = count(lit(1))
    val stops = sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0))
    val ratio = stops.cast("double") / n
    ex.groupBy(col(idCol)).agg(
      n.cast("int").as("n_tokens"),
      ratio.as("stop_ratio"),
      ((max(col("__len")) - (n - lit(1))).cast("double") / n)
        .as("mean_token_len"),
      (n.between(minTokens, maxTokens) && ratio >= minStopRatio)
        .as("quality_ok"))
  }

  /** Token counting: whitespace count plus a BPE-ish regex count
    * (letter runs / digit runs / single non-alnum marks — a cheap proxy
    * for subword vocabularies). */
  val bpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Deterministic toy subword vocabulary for the oracle-checked
    * vocab-apply path ([[vocabTokenStats]] / x76): 24 single letters
    * (`q` and `z` deliberately absent so the UNK path is live on real
    * text) + frequent English bigrams + a few whole merges.  Index =
    * token id, the [[graft.plans.VocabEncode]] contract.  A deployment
    * swaps in its trained vocab; every downstream number
    * (token budgets, mixture weights, curriculum) then counts in REAL
    * tokens — the hashedWeights pattern (QualityModel) applied to
    * tokenization. */
  val toyVocab: Seq[String] =
    ("abcdefghijklmnoprstuvwxy".map(_.toString)) ++
      Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
        "ti", "es", "or", "the", "and", "ing", "ion", "tion", "ent")

  /** Exact per-document token stats under a frozen subword vocab:
    * (doc_id, n_tokens, n_unk) via one [[graft.plans.VocabEncode]]
    * kernel call per row (greedy longest-match; unknown chars count as
    * UNK).  The companion to the regex proxy in x11 — same operator
    * shape (scan → project, no shuffle), real denominator. */
  def vocabTokenStats(docs: DataFrame, idCol: String, textCol: String,
                      vocab: Seq[String]): DataFrame = {
    val ids = graft.plans.VocabEncode.vocabEncode(col(textCol), vocab)
    docs.select(col(idCol).as("doc_id"), ids.as("__ids"))
      .select(col("doc_id"),
        size(col("__ids")).cast("long").as("n_tokens"),
        size(filter(col("__ids"), x => x === lit(-1)))
          .cast("long").as("n_unk"))
  }

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the exact-dedup key. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Per-document character-distribution Shannon entropy
    * `−Σ (c/n)·ln(c/n)` over the document's characters — the
    * encoding-garbage detector the token-level signals miss: mojibake,
    * base64/hex blobs, and key-mash text sit at pathological entropy
    * (too high for natural language, or too low for repeated-character
    * padding), while natural-language text clusters tightly per
    * language.  Standard cheap quality gate next to the Gopher
    * repetition rules.
    *
    * Plan shape: explode to (doc, char) — bounded by text bytes — one
    * codegen'd two-level hash agg to char counts, one more to the
    * per-doc sum; `n` is `length(text)` so no second pass or window
    * computes the denominator.  `c/n` is an exact-int division both
    * engines perform identically; the Σ rounds to 6 decimals (the
    * cross-engine float-sum idiom every divergence-scored query here
    * uses). */
  def charEntropy(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol)).as("n"),
        explode(split(col(textCol), "")).as("ch"))
      .groupBy(col("doc_id"), col("n"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(-sum((col("c") / col("n")) *
        log(col("c") / col("n"))), 6).as("entropy"))

  /** Per-document repetition signals (the Gopher-rule family of
    * repetition quality filters): what fraction of the document is its
    * single most frequent token / bigram, and how diverse the
    * vocabulary is.  High top-fractions or a low distinct ratio flag
    * templated, boilerplate, or looping text for removal from training
    * corpora — the repetition axis the length/stopword signals of
    * [[qualityByDoc]] can't see.
    *
    * Plan shape: explode + two-level hash agg per signal (all
    * codegen'd, map-side partial aggregation), bigrams via the narrow
    * `Dedup.assembleNgrams` path, one skinny (doc_id-keyed) join to
    * combine — no windows, no per-doc state, nothing driver-side.
    * Ratios are raw integer-over-integer doubles: bit-identical across
    * engines with no rounding step. */
  def repetitionByDoc(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val tokStats = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_c"),
        count(lit(1)).as("n_distinct"))
    val biStats = Dedup.assembleNgrams(toks, 2)
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bc"))
    tokStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("top_c") / col("n_tokens")).as("top_token_frac"),
        (col("n_distinct") / col("n_tokens")).as("distinct_ratio"),
        coalesce(col("top_bc") / col("n_bigrams"), lit(0.0))
          .as("top_bigram_frac"))
  }

  /** Rolling (Karp-Rabin) content hash over tokens, for shift-tolerant
    * chunk fingerprints: fold h = (h*B + tokenHash) mod M.  M = 2^31-1 and
    * B = 131 keep every intermediate < 2^39 — no Long overflow even under
    * ANSI arithmetic. */
  /** Per-document top-k TF-IDF terms — the classic keyword/topic
    * signal (feeds topic balancing and near-dup explanation).
    * idf = ln(N/df) on raw counts; ranking key = (round(score,6) desc,
    * term asc) so the cut is deterministic cross-engine.
    *
    * Scale shape: ONE corpus-sized (doc, token) count shuffle
    * (checkpointed — document frequencies and the scoring join both
    * derive from it, not from a re-scan); df is vocabulary-sized; the
    * single-row N rides a broadcast cross join (x23-class); the top-k
    * window partitions by doc_id — per-partition work is one
    * document's vocabulary, never corpus-sized. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok").as("term"),
        round(col("tf") * log(col("__n").cast("double") / col("__df")), 6)
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def rollingHash(toks: Column, b: Long = 131L,
                  m: Long = 2147483647L): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * b + pmod(crc32(t.cast("binary")), lit(m)),
        lit(m)))
}
