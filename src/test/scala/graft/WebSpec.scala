package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextClean, Web}

/** Web-provenance family: URL canonicalization algebra, keep-best URL
  * dedup, domain blocklist rollup — plus the structural-unit text
  * passes that ship alongside them (paragraph-dup fraction, C4 line
  * filter) and pre-filter ANN semantics. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(url: String): String =
    Seq(url).toDF("u").select(Web.canonicalUrl(col("u"))).head.getString(0)

  test("canonicalUrl applies every rule: fragment, case, www, " +
    "default ports, tracking params, trailing slash") {
    // rule 1+2: fragment dropped, scheme/host lowered, path case kept
    assert(canonOf("HTTP://EXAMPLE.com/Path#frag") ===
      "http://example.com/Path")
    // rule 3: www label stripped
    assert(canonOf("https://www.example.com/a") === "https://example.com/a")
    // rule 4: default port stripped per scheme; non-default survives
    assert(canonOf("http://example.com:80/a") === "http://example.com/a")
    assert(canonOf("https://example.com:443/a") === "https://example.com/a")
    assert(canonOf("http://example.com:8080/a") ===
      "http://example.com:8080/a")
    // :443 is NOT http's default — it must survive on http
    assert(canonOf("http://example.com:443/a") === "http://example.com:443/a")
    // rule 5: tracking params drop from first/middle/last position
    assert(canonOf("http://e.com/a?utm_source=x&id=1") ===
      "http://e.com/a?id=1")
    assert(canonOf("http://e.com/a?id=1&utm_campaign=y") ===
      "http://e.com/a?id=1")
    assert(canonOf("http://e.com/a?p=1&gclid=g&q=2") ===
      "http://e.com/a?p=1&q=2")
    // all params tracking → query gone entirely
    assert(canonOf("http://e.com/a?utm_a=1&fbclid=2") === "http://e.com/a")
    // rule 6: trailing slash runs collapse; bare root prints as /
    assert(canonOf("http://e.com/a/") === "http://e.com/a")
    assert(canonOf("http://e.com") === "http://e.com/")
    assert(canonOf("http://e.com/") === "http://e.com/")
  }

  test("malformed URLs canonicalize to NULL, never the constant ':///'") {
    // scheme-less, relative, and garbage URLs all have no scheme —
    // a non-null result would merge them into one dedup family
    Seq("example.com/path", "/relative/only", "", "not a url at all",
      "://missing.scheme", "mailto.broken").foreach { u =>
      val r = Seq(u).toDF("u")
        .select(Web.canonicalUrl(col("u"))).head
      assert(r.isNullAt(0), s"'$u' must canonicalize to NULL")
    }
    // and NULL in → NULL out (idempotence over the malformed branch)
    val rn = Seq(Option.empty[String]).toDF("u")
      .select(Web.canonicalUrl(col("u"))).head
    assert(rn.isNullAt(0))
  }

  test("tracking params drop case-insensitively on the NAME, values " +
    "keep their case") {
    assert(canonOf("http://e.com/a?UTM_SOURCE=x&id=1") ===
      "http://e.com/a?id=1")
    assert(canonOf("http://e.com/a?id=1&Fbclid=Zz") === "http://e.com/a?id=1")
    assert(canonOf("http://e.com/a?GCLID=g&Utm_Campaign=Y") ===
      "http://e.com/a")
    // a non-tracking param VALUE keeps its case untouched
    assert(canonOf("http://e.com/a?q=MixedCase") ===
      "http://e.com/a?q=MixedCase")
  }

  test("urlDedupKeepBest passes malformed (NULL-canonical) docs " +
    "through as singleton families instead of merging them") {
    val docs = Seq(
      (1L, "http://a.com/x", 100L),
      (2L, "relative/one", 50L),   // malformed: no scheme
      (3L, "garbage", 70L),        // malformed: no scheme
      (4L, "http://www.a.com/x", 40L)
    ).toDF("doc_id", "url", "n_chars")
    val out = Web.urlDedupKeepBest(docs, "doc_id", "url", "n_chars")
      .collect().map(r => ((if (r.isNullAt(0)) null else r.getString(0)),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1+4 merge under the canonical URL; 2 and 3 each survive
    assert(out.toSet === Set(
      ("http://a.com/x", 1L, 100L, 2L),
      (null, 2L, 50L, 1L),
      (null, 3L, 70L, 1L)))
  }

  test("urlDedupKeepBest refuses non-integral id/weight columns at " +
    "plan build (a UUID id would cast to NULL and corrupt max_by)") {
    val docs = Seq(("u-1", "http://a.com/x", 10L))
      .toDF("doc_id", "url", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Web.urlDedupKeepBest(docs, "doc_id", "url", "n_chars")
    }
    assert(e.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      Web.urlDedupKeepBest(
        Seq((1L, "http://a.com/x", 1.5)).toDF("doc_id", "url", "w"),
        "doc_id", "url", "w")
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("urlNoveltyGate reports malformed (NULL-canonical) incoming " +
    "URLs as novel — never silently skipped") {
    val existing = Seq((1L, "http://a.com/x")).toDF("doc_id", "url")
    val incoming = Seq((2L, "http://a.com/x"), (3L, "not a url"))
      .toDF("doc_id", "url")
    val index = Web.urlIndex(existing, "url")
    val out = Web.urlNoveltyGate(index, incoming, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(2L -> false, 3L -> true))
    // and the index itself never holds a NULL key
    assert(index.urls.filter(col("url_canon").isNull).count() === 0)
  }

  test("urlDedupKeepBest keeps the longest capture, ties to lowest id") {
    val docs = Seq(
      (1L, "http://a.com/x", 100L),
      (2L, "https://WWW.A.com:443/x".replace("a.com", "a.com"), 50L),
      (3L, "http://www.a.com/x?utm_source=z", 100L),
      (4L, "http://b.com/y", 10L)
    ).toDF("doc_id", "url", "n_chars")
    val out = Web.urlDedupKeepBest(docs, "doc_id", "url", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 1 and 3 share http://a.com/x (100 chars each) → keeper 1;
    // doc 2 canonicalizes to https://a.com/x — a DIFFERENT url (scheme)
    assert(out("http://a.com/x") === ((1L, 100L, 2L)))
    assert(out("https://a.com/x") === ((2L, 50L, 1L)))
    assert(out("http://b.com/y") === ((4L, 10L, 1L)))
  }

  test("domainReport rolls up per canonical host and drops blocked " +
    "domains via broadcast anti-join") {
    val docs = Seq(
      (1L, "http://www.good.com/a", 10L, "s1"),
      (2L, "https://good.com:443/b", 20L, "s2"),
      (3L, "http://evil.com/c", 30L, "s1")
    ).toDF("doc_id", "url", "n_chars", "source")
    val out = Web.domainReport(docs, "url", col("n_chars"), "source",
        Seq("evil.com"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(("good.com", 2L, 30L, 2L)))
    // and the blocklist join is a broadcast, not a shuffle
    val plan = Web.domainReport(docs, "url", col("n_chars"), "source",
      Seq("evil.com")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("paragraphDupStats: cross-doc duplicated paragraphs raise " +
    "dup_frac; unique docs keep") {
    val boiler = "subscribe now"
    val docs = Seq(
      (1L, s"alpha body one\n\n$boiler"),
      (2L, s"beta body two\n\n$boiler"),
      (3L, "gamma body three"),
      (4L, s"$boiler")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDupStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) === ((2L, 1L, 0.5, true)))
    assert(out(2L) === ((2L, 1L, 0.5, true)))
    assert(out(3L) === ((1L, 0L, 0.0, true)))
    assert(out(4L) === ((1L, 1L, 1.0, false))) // all boilerplate → drop
  }

  test("c4LineFilter keeps ≥5-word terminal-punctuated lines and " +
    "drops javascript/cookie/short lines; empty docs flagged") {
    val docs = Seq(
      (1L, "This sentence has enough words to keep.\nclick here\n" +
        "Enable JavaScript to continue viewing.\n" +
        "We use cookies on this site always.\n" +
        "Another genuinely useful line survives here!"),
      (2L, "short\nno punct at all")
    ).toDF("doc_id", "text")
    val out = TextClean.c4LineFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getBoolean(4))))
      .toMap
    assert(out(1L)._1 === 5)
    assert(out(1L)._2 === 2)
    assert(out(1L)._3 ===
      "This sentence has enough words to keep.\n" +
        "Another genuinely useful line survives here!")
    assert(out(1L)._4 === true)
    assert(out(2L) === ((2, 0, "", false)))
  }

  test("robotsReport blocks on (host, path-prefix) match only — " +
    "prefix semantics, per-doc verdict over multiple rules") {
    val docs = Seq(
      (1L, "http://a.com/Articles/12"), // prefix /Articles/1 matches
      (2L, "http://a.com/Articles/2"),  // different prefix → allowed
      (3L, "http://b.com/Articles/12"), // other host → allowed
      (4L, "http://a.com/Other/1")      // other path → allowed
    ).toDF("doc_id", "url")
    val out = Web.robotsReport(docs, "doc_id", "url",
        Seq(("a.com", "/Articles/1"), ("a.com", "/Private")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("urlSpamScore: soft weights sum once per distinct term, hard " +
    "terms block instantly, threshold gates the soft sum") {
    def score(url: String): (Double, Boolean) = {
      val w = Web.urlSpamScore(col("u"),
        Seq("free" -> 0.5, "download" -> 0.4, "click" -> 0.3),
        Seq("adult"), threshold = 1.0)
      val r = Seq(url).toDF("u")
        .select(w.getField("score"), w.getField("blocked")).head
      (r.getDouble(0), r.getBoolean(1))
    }
    assert(score("https://ok.com/page") === ((0.0, false)))
    assert(score("https://ok.com/download") === ((0.4, false)))
    assert(score("https://ok.com/free-download-click") === ((1.2, true)))
    // hard term blocks regardless of soft score
    assert(score("https://ok.com/adult") === ((0.0, true)))
    // terms matched in host count too; case-insensitive
    assert(score("https://FREE-download.com/x") === ((0.9, false)))
  }

  test("thresholdSweep: cells partition the corpus at every " +
    "threshold, and tp/fp are non-increasing in the threshold") {
    val docs = Tables.documents(spark, sf0001)
    val model = graft.ext.QualityModel.trainQualityModel(docs,
      "doc_id", "text", col("lang") === "en")
    val tau = graft.ext.QualityModel.corpusMeanScore(docs, "text",
      model, 64)
    val n = docs.count()
    val rows = graft.ext.QualityModel.thresholdSweep(docs, "doc_id",
        "text", col("lang") === "en", model, dim = 64, center = tau)
      .orderBy(col("threshold"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length === 9)
    rows.foreach { case (_, tp, fp, tn, fn) =>
      assert(tp + fp + tn + fn === n) }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2, "tp must not grow as the threshold rises")
      assert(hi._3 <= lo._3, "fp must not grow as the threshold rises")
    }
  }

  test("streaming URL novelty gate equals the batch answer, extend is " +
    "O(batch)-equivalent to a fresh build, persistence round-trips") {
    import graft.ext.Web
    val docs = Tables.documents(spark, sf0001)
      .withColumn("url", concat(lit("http://h"),
        // %21 ids (all incoming) get a UNIQUE host → guaranteed novel;
        // the rest share a (mod 40, mod 25) lattice → mostly seen
        when(col("doc_id") % 21 === 0, col("doc_id"))
          .otherwise(col("doc_id") % 40).cast("string"),
        lit(".com/p/"), (col("doc_id") % 25).cast("string")))
    val existing = docs.filter(col("doc_id") % 7 =!= 0)
    val incoming = docs.filter(col("doc_id") % 7 === 0)
    val index = Web.urlIndex(existing, "url")
    val batchAnswer = Web.urlNoveltyGate(index, incoming, "doc_id", "url")
      .as[(Long, String, Boolean)].collect().toSet
    assert(batchAnswer.exists(_._3) && batchAnswer.exists(!_._3),
      "fixture must exercise both novel and seen outcomes")
    // micro-batched delivery through foreachBatch == one-shot batch
    val dir = java.nio.file.Files.createTempDirectory("graft_url_").toString
    incoming.filter(col("doc_id") % 2 === 0).select("doc_id", "url")
      .write.mode("append").parquet(dir)
    incoming.filter(col("doc_id") % 2 =!= 0).select("doc_id", "url")
      .write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val seen = scala.collection.mutable.Set[(Long, String, Boolean)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= Web.urlNoveltyGate(index, df, "doc_id", "url")
          .as[(Long, String, Boolean)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.toSet === batchAnswer)
    // extend with an accepted batch ≡ fresh build over the union
    val extended = Web.extendUrlIndex(index, incoming, "url")
    val fresh = Web.urlIndex(docs, "url")
    assert(extended.urls.as[String].collect().toSet ===
      fresh.urls.as[String].collect().toSet)
    // persistence: bucketed save/load round-trip; non-index refused
    dropTableFully("g_url_idx")
    Web.saveUrlIndex(extended, "g_url_idx")
    val reopened = Web.loadUrlIndex(spark, "g_url_idx")
    assert(reopened.urls.as[String].collect().toSet ===
      extended.urls.as[String].collect().toSet)
    dropTableFully("g_not_url_idx")
    docs.select("doc_id").limit(2).write
      .format("parquet").saveAsTable("g_not_url_idx")
    intercept[IllegalArgumentException] {
      Web.loadUrlIndex(spark, "g_not_url_idx")
    }
    ()
  }

  test("a long-running gate's UrlIndex auto-compacts: 100+ extends " +
    "keep plan depth bounded and novelty verdicts unchanged") {
    val mkBatch = (i: Int) => Seq(
      (i * 10L, s"http://h$i.com/p/0"),
      (i * 10L + 1, s"http://h${i % 7}.com/p/1"), // mostly re-seen
      (i * 10L + 2, s"http://h$i.com/p/2")
    ).toDF("doc_id", "url")
    var index = Web.urlIndex(mkBatch(0), "url")
    (1 to 110).foreach { i => index = Web.extendUrlIndex(index, mkBatch(i), "url") }
    // bounded depth: the union chain never exceeds the compaction
    // threshold in pinned legs (leaves of the analyzed plan)
    val leaves = index.urls.queryExecution.analyzed.collectLeaves().size
    assert(leaves <= Web.CompactLegs,
      s"UrlIndex plan depth unbounded: $leaves legs after 110 extends")
    // verdicts equal a fresh one-shot build over the same corpus
    val all = (0 to 110).map(mkBatch).reduce(_ unionByName _)
    val fresh = Web.urlIndex(all, "url")
    val probe = Seq((900L, "http://h3.com/p/1"), (901L, "http://new.com/x"))
      .toDF("doc_id", "url")
    val viaExtended = Web.urlNoveltyGate(index, probe, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val viaFresh = Web.urlNoveltyGate(fresh, probe, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(viaExtended === viaFresh)
    assert(viaExtended === Map(900L -> false, 901L -> true))
    // and the two indexes hold the same key set
    assert(index.urls.as[String].collect().toSet ===
      fresh.urls.as[String].collect().toSet)
  }

  test("bruteForceTopK and hardNegatives refuse corpus-sized " +
    "query/anchor sets, naming ivfTopK as the scale path") {
    val e = Tables.embeddings(spark, sf0001)
    val eBig = e // any df over the cap triggers the guard
    val g1 = intercept[IllegalArgumentException] {
      graft.ext.Similarity.bruteForceTopK(eBig, e, k = 5, dim = 64,
        maxQueries = 3)
    }
    assert(g1.getMessage.contains("ivfTopK"))
    val g2 = intercept[IllegalArgumentException] {
      graft.ext.Similarity.hardNegatives(eBig, e, k = 5, dim = 64,
        maxAnchors = 3)
    }
    assert(g2.getMessage.contains("ivfTopK"))
    ()
  }

  test("hardNegatives returns only different-label vectors and equals " +
    "brute-force top-k over the label-mismatched candidate set") {
    val e = Tables.embeddings(spark, sf0001)
    val anchors = e.filter(col("vec_id") < 8)
    val corpus = e.filter(col("vec_id") >= 8)
    val labels = e.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val hn = graft.ext.Similarity.hardNegatives(anchors, corpus, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(hn.nonEmpty)
    hn.foreach { case (qId, cId, _) =>
      assert(labels(qId) !== labels(cId),
        s"hard negative $cId shares anchor $qId's label") }
    // per-anchor equivalence to brute-force over that anchor's own
    // mismatched candidates (the anchor-dependent predicate is the
    // difference from x107's fixed pre-filter)
    anchors.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().foreach { case (qId, ql) =>
        val mine = hn.filter(_._1 == qId).map(_._2).toSet
        val exact = graft.ext.Similarity.bruteForceTopK(
            anchors.filter(col("vec_id") === qId),
            corpus.filter(col("label") =!= ql), k = 10)
          .collect().map(_.getLong(1)).toSet
        assert(mine === exact, s"anchor $qId")
      }
  }

  test("filtered ANN is PRE-filter: every hit satisfies the predicate " +
    "and matches brute-force top-k over the filtered corpus") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 8)
    val cand = e.filter(col("vec_id") >= 8 && col("label") % 3 === 0)
    val eligible = cand.select("vec_id").as[Long].collect().toSet
    val ivf = graft.ext.Similarity.ivfTopK(q, cand, k = 10, dim = 64,
        nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (_, c) => eligible.contains(c) })
    // nprobe = nlist probes every cell — IVF degenerates to exhaustive
    // search with exact re-rank, so it must EQUAL brute-force top-k
    // over the same filtered corpus (shared score grid + tie rule)
    val exhaustive = graft.ext.Similarity.ivfTopK(q, cand, k = 10,
        dim = 64, nlist = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.ext.Similarity.bruteForceTopK(q, cand, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive === exact)
  }

  test("robotsRules parses RFC-9309-subset grammar: multi-agent " +
    "groups, blank-line group breaks, comments inside runs, CRLF, " +
    "case-insensitive keys, empty-Disallow idiom") {
    def rules(txt: String, agent: String): Set[String] =
      Web.robotsRules(Seq(("h.com", txt)).toDF("host", "txt"),
          "host", "txt", agent)
        .collect().map(_.getString(1)).toSet
    val txt =
      "# policy\r\n" +
      "User-agent: evilbot\n" +
      "Disallow: /\n" +
      "\n" +
      "User-agent: alpha\n" +
      "# comment inside the run must NOT break the group\n" +
      "USER-AGENT: beta\n" +
      "disallow: /a\n" +
      "Disallow:\n" +          // empty = allow-all idiom, no rule
      "Disallow: /b\n" +
      "\n" +
      "User-agent: gamma\n" +
      "Disallow: /g\n"
    // both agents of the shared run get BOTH rules
    assert(rules(txt, "alpha") === Set("/a", "/b"))
    assert(rules(txt, "beta") === Set("/a", "/b"))
    // gamma's group is its own (the blank line broke the run)
    assert(rules(txt, "gamma") === Set("/g"))
    // an unknown agent matches nothing here (no * group)
    assert(rules(txt, "nobody") === Set.empty[String])
    // a * group applies to everyone
    assert(rules("User-agent: *\nDisallow: /x\n", "anyone") ===
      Set("/x"))
    // blank line between UA lines separates groups (RFC group break)
    assert(rules("User-agent: a\n\nUser-agent: b\nDisallow: /y\n",
      "a") === Set.empty[String])
    assert(rules("User-agent: a\n\nUser-agent: b\nDisallow: /y\n",
      "b") === Set("/y"))
  }

  test("parse -> filter composition: robotsRules output drives the " +
    "DataFrame robotsReport and verdicts equal the Seq-based form") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /Articles/1\nDisallow: /Private\n"),
      ("b.com", "User-agent: evilbot\nDisallow: /\n") // no * group
    ).toDF("host", "txt")
    val rules = Web.robotsRules(robots, "host", "txt")
    val docs = Seq(
      (1L, "http://a.com/Articles/12"),
      (2L, "http://a.com/Articles/2"),
      (3L, "http://b.com/Articles/12"),
      (4L, "http://a.com/Private/x")
    ).toDF("doc_id", "url")
    val viaDf = Web.robotsReport(docs, "doc_id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(viaDf === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true))
    val viaSeq = Web.robotsReport(docs, "doc_id", "url",
        Seq(("a.com", "/Articles/1"), ("a.com", "/Private")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(viaDf === viaSeq)
  }

  test("robotsRules parses Allow directives (allow=true), drops " +
    "empty Allow, and never emits Crawl-delay/Sitemap as rules") {
    val txt =
      "User-agent: *\n" +
      "Disallow: /a\n" +
      "ALLOW: /a/pub\n" +
      "Allow:\n" +            // empty Allow: no rule (mirror of empty Disallow)
      "Crawl-delay: 5\n" +
      "Sitemap: http://h.com/sm.xml\n"
    val rules = Web.robotsRules(Seq(("h.com", txt)).toDF("host", "txt"),
        "host", "txt")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    assert(rules === Set("/a" -> false, "/a/pub" -> true))
  }

  test("RFC 9309 longest-match: an Allow rescues a Disallow-prefixed " +
    "path, wildcard/$ patterns match, equal-length ties resolve to " +
    "Allow, and regex metacharacters in patterns stay literal") {
    val robots = Seq(("h.com",
      "User-agent: *\n" +
      "Disallow: /a\n" +
      "Allow: /a/pub\n" +
      "Disallow: /*.zip$\n" +
      "Disallow: /tt\n" +
      "Allow: /tt\n" +
      "Disallow: /q+x\n"   // '+' is literal in RFC patterns, not regex
    )).toDF("host", "txt")
    val rules = Web.robotsRules(robots, "host", "txt")
    val docs = Seq(
      (1L, "http://h.com/a/x"),        // Disallow /a → blocked
      (2L, "http://h.com/a/pub/x"),    // Allow /a/pub (len 6) rescues
      (3L, "http://h.com/b/file.zip"), // anchored wildcard → blocked
      (4L, "http://h.com/b/file.zipX"),// $ anchor: .zipX does NOT match
      (5L, "http://h.com/tt/z"),       // tie /tt vs /tt → Allow wins
      (6L, "http://h.com/ok"),         // no rule matches → allowed
      (7L, "http://h.com/q+x/y"),      // literal '+' matches itself
      (8L, "http://h.com/qqx/y")       // and ONLY itself (no regex q+)
    ).toDF("doc_id", "url")
    val got = Web.robotsReport(docs, "doc_id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> false, 6L -> false, 7L -> true, 8L -> false))
  }

  test("RFC 9309 group selection is exclusive: a named-agent group " +
    "drops the * groups, so a *-group Disallow cannot override the " +
    "named group's Allow") {
    val txt =
      "User-agent: graftbot\nAllow: /a\nDisallow: /b\n\n" +
      "User-agent: *\nDisallow: /a\nDisallow: /c\n"
    def ruleSet(agent: String): Set[(String, Boolean)] =
      Web.robotsRules(Seq(("h.com", txt)).toDF("host", "txt"),
          "host", "txt", agent)
        .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    // the named agent sees ONLY its group — the * Disallows drop
    assert(ruleSet("graftbot") === Set("/a" -> true, "/b" -> false))
    // everyone else sees the * group
    assert(ruleSet("other") === Set("/a" -> false, "/c" -> false))
    // verdict level: /a/x allowed for graftbot, blocked for others
    val docs = Seq((1L, "http://h.com/a/x"), (2L, "http://h.com/b/x"),
      (3L, "http://h.com/c/x")).toDF("doc_id", "url")
    def verdicts(agent: String): Map[Long, Boolean] =
      Web.robotsReport(docs, "doc_id", "url",
          Web.robotsRules(Seq(("h.com", txt)).toDF("host", "txt"),
            "host", "txt", agent))
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts("graftbot") ===
      Map(1L -> false, 2L -> true, 3L -> false))
    assert(verdicts("other") === Map(1L -> true, 2L -> false, 3L -> true))
    // two groups naming the SAME agent still merge (the combine rule)
    val merged = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: graftbot\nDisallow: /y\n\nUser-agent: *\nDisallow: /z\n"
    assert(Web.robotsRules(Seq(("h.com", merged)).toDF("host", "txt"),
        "host", "txt", "graftbot")
      .collect().map(_.getString(1)).toSet === Set("/x", "/y"))
    // a single RUN naming both agent and * is one group — selected
    // exactly, and being exact it drops a LATER standalone * group
    val run = "User-agent: graftbot\nUser-agent: *\nDisallow: /r\n\n" +
      "User-agent: *\nDisallow: /s\n"
    assert(Web.robotsRules(Seq(("h.com", run)).toDF("host", "txt"),
        "host", "txt", "graftbot")
      .collect().map(_.getString(1)).toSet === Set("/r"))
    // crawl-delay rides the same selection: the named group's delay
    // applies alone even when the * group asks for more
    val delayTxt = "User-agent: graftbot\nCrawl-delay: 2\n\n" +
      "User-agent: *\nCrawl-delay: 50\n"
    val d = Web.robotsCrawlDelay(
        Seq(("h.com", delayTxt)).toDF("host", "txt"),
        "host", "txt", agent = "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d === Map("h.com" -> 2.0))
  }

  test("robots matching targets the RAW path+query: Disallow /dir/ " +
    "blocks /dir/ itself, query-pattern rules match, $ does not reach " +
    "past the query, tracking params stay visible to rules") {
    val robots = Seq(("h.com",
      "User-agent: *\n" +
      "Disallow: /dir/\n" +
      "Disallow: /*?session=\n" +
      "Disallow: /*.zip$\n" +
      "Disallow: /*&admin=1\n"
    )).toDF("host", "txt")
    val rules = Web.robotsRules(robots, "host", "txt")
    val docs = Seq(
      // raw /dir/ must block even though it canonicalizes to /dir
      (1L, "http://h.com/dir/"),
      (2L, "http://h.com/dir"),            // /dir does NOT match /dir/
      (3L, "http://h.com/x?session=9"),    // query rule matches
      (4L, "http://h.com/x?id=1"),         // other query → allowed
      (5L, "http://h.com/f.zip"),          // anchored → blocked
      (6L, "http://h.com/f.zip?id=1"),     // $ stops at end of TARGET
      // tracking params are NOT stripped on the robots side
      (7L, "http://h.com/y?utm_source=a&admin=1"),
      (8L, "http://h.com/y#frag?session=9") // '?' in fragment: no query
    ).toDF("doc_id", "url")
    val got = Web.robotsReport(docs, "doc_id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true, 8L -> false))
    // and the match-target column itself reports the raw form
    val tgt = Seq("http://h.com/dir/", "http://h.com",
      "http://h.com/a?utm_x=1#f").toDF("u")
      .select(Web.robotsMatchTarget(col("u"))).collect().map(_.getString(0))
    assert(tgt.toSeq === Seq("/dir/", "/", "/a?utm_x=1"))
  }

  test("a rules frame without an allow column keeps the historical " +
    "all-Disallow reading") {
    val rules = Seq(("h.com", "/a")).toDF("host", "path_prefix")
    val docs = Seq((1L, "http://h.com/a/x"), (2L, "http://h.com/b"))
      .toDF("doc_id", "url")
    val got = Web.robotsReport(docs, "doc_id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("robotsIgnored surfaces the directives the parser does not " +
    "consume, per (host, lowercased key), and nothing else") {
    val robots = Seq(
      ("h.com",
        "# comment\n" +
        "User-agent: *\nDisallow: /a\nAllow: /b\n" +
        "Crawl-delay: 5\nCRAWL-DELAY: 10\n" +
        "Sitemap: http://h.com/sm.xml\n" +
        "garbage line without colon\n"),
      ("i.com", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "txt")
    val got = Web.robotsIgnored(robots, "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("h.com", "crawl-delay") -> 2L,
      ("h.com", "sitemap") -> 1L,
      ("h.com", "<no-colon>") -> 1L))
  }

  test("robotsCrawlDelay honors group semantics: unmatched groups' " +
    "delays ignored, max of matched wins, unparseable/negative drop") {
    import graft.ext.Web
    val txt =
      "User-agent: evilbot\nCrawl-delay: 99\n\n" +
      "User-agent: graftbot\nCrawl-delay: 2.5\nCrawl-delay: 7\n" +
      "Crawl-delay: soon\nCrawl-delay: -3\n\n" +
      "User-agent: other\nCrawl-delay: 50\n"
    val got = Web.robotsCrawlDelay(
        Seq(("h.com", txt), ("nodelay.com", "User-agent: *\nDisallow: /x\n"))
          .toDF("host", "txt"), "host", "txt", agent = "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // only the graftbot group's parseable, non-negative delays count;
    // max(2.5, 7) = 7; a host with no directive emits NO row
    assert(got === Map("h.com" -> 7.0))
  }

  test("politenessSchedule: per-host cap binds, slots dense from 0 by " +
    "ascending id, eta = slot x delay, absent delay -> default, " +
    "hostless (malformed) candidates excluded") {
    import graft.ext.Web
    val delays = Seq(("slow.com", 2.0)).toDF("host", "delay_sec")
    val cand = Seq(
      (5L, "http://slow.com/e"), (1L, "http://slow.com/a"),
      (3L, "http://slow.com/c"), (4L, "http://slow.com/d"),
      (2L, "http://fast.com/x"), (6L, "http://fast.com/y"),
      (7L, "not a url")
    ).toDF("doc_id", "url")
    val got = Web.politenessSchedule(cand, delays, "doc_id", "url",
        maxPerHost = 3, defaultDelaySec = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got === Set(
      // slow.com: 4 candidates capped to the 3 smallest ids
      (1L, "slow.com", 0, 2.0, 0.0),
      (3L, "slow.com", 1, 2.0, 2.0),
      (4L, "slow.com", 2, 2.0, 4.0),
      // fast.com: no directive -> default delay
      (2L, "fast.com", 0, 0.5, 0.0),
      (6L, "fast.com", 1, 0.5, 0.5)))
    // doc 7 (no parseable host) must not be scheduled at all
    assert(!got.exists(_._1 == 7L))
  }

  test("robotsSitemaps: Sitemap directives are global (group " +
    "structure ignored), case-insensitive, deduped; empty values drop") {
    import graft.ext.Web
    val txt =
      "Sitemap: http://h.com/top.xml\n" +           // before any group
      "User-agent: evilbot\nDisallow: /\n" +
      "SITEMAP: http://h.com/inside-evil.xml\n" +   // inside a non-* group: still counts
      "\nUser-agent: *\nDisallow: /a\n" +
      "sitemap: http://h.com/top.xml\n" +           // duplicate → collapses
      "Sitemap:\n"                                  // empty → drops
    val got = Web.robotsSitemaps(
        Seq(("h.com", txt)).toDF("host", "txt"), "host", "txt")
      .collect().map(_.getString(1)).toSet
    assert(got === Set("http://h.com/top.xml", "http://h.com/inside-evil.xml"))
  }

  test("sitemapEntries: urlset rows with decoded/trimmed locs and " +
    "optional lastmod, sitemapindex rows point at child sitemaps, " +
    "unknown documents surface one kind=unknown row, blank locs drop") {
    import graft.ext.Web
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> http://h.com/p?a=1&amp;b=2 </loc>
        |  <lastmod>2026-03-01</lastmod></url>
        |<url><loc>http://h.com/q</loc></url>
        |<url><loc>  </loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>http://h.com/sm1.xml</loc>
        |<lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc>http://h.com/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Web.sitemapEntries(
        Seq(("http://h.com/sitemap.xml", urlset),
          ("http://h.com/smi.xml", index),
          ("http://h.com/garbage.xml", "not xml at all"))
          .toDF("u", "xml"), "u", "xml")
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)))).toSet
    assert(got === Set(
      ("http://h.com/sitemap.xml", "urlset",
        Some("http://h.com/p?a=1&b=2"), Some("2026-03-01")),
      ("http://h.com/sitemap.xml", "urlset", Some("http://h.com/q"), None),
      ("http://h.com/smi.xml", "index", Some("http://h.com/sm1.xml"),
        Some("2026-01-01")),
      ("http://h.com/smi.xml", "index", Some("http://h.com/sm2.xml"), None),
      // a fetched-but-unparseable document is a visible parse failure,
      // not a vanished row (round-16 ADVICE)
      ("http://h.com/garbage.xml", "unknown", None, None)))
  }

  test("frontierGate: fetch = novel AND robots-allowed, all four " +
    "quadrants exercised, micro-batched foreachBatch equals the " +
    "one-shot batch answer") {
    import graft.ext.Web
    val robots = Seq(("h.com",
      "User-agent: *\nDisallow: /priv\nAllow: /priv/pub\n"))
      .toDF("host", "txt")
    val rules = Web.robotsRules(robots, "host", "txt")
    val seen = Seq((100L, "http://h.com/old"), (101L, "http://h.com/priv/x"))
      .toDF("doc_id", "url")
    val index = Web.urlIndex(seen, "url")
    val incoming = Seq(
      (1L, "http://h.com/new"),        // novel + allowed  → fetch
      (2L, "http://h.com/old"),        // seen + allowed   → skip
      (3L, "http://h.com/priv/y"),     // novel + blocked  → skip
      (4L, "http://h.com/priv/x"),     // seen + blocked   → skip
      (5L, "http://h.com/priv/pub/z")  // novel + Allow-rescued → fetch
    ).toDF("doc_id", "url")
    val batch = Web.frontierGate(index, rules, incoming, "doc_id", "url")
      .select("doc_id", "novel", "blocked", "fetch")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSet
    assert(batch === Set(
      (1L, true, false, true), (2L, false, false, false),
      (3L, true, true, false), (4L, false, true, false),
      (5L, true, false, true)))
    // micro-batched delivery through foreachBatch == one-shot batch
    val dir =
      java.nio.file.Files.createTempDirectory("graft_frontier_").toString
    incoming.filter(col("doc_id") <= 2).write.mode("append").parquet(dir)
    incoming.filter(col("doc_id") > 2).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = scala.collection.mutable.Set[(Long, Boolean, Boolean, Boolean)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= Web.frontierGate(index, rules, df, "doc_id", "url")
          .select("doc_id", "novel", "blocked", "fetch")
          .as[(Long, Boolean, Boolean, Boolean)].collect()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.toSet === batch)
  }

  test("resolveSitemaps: depth-2 index tree resolves end-to-end, a " +
    "cyclic index is fetched exactly once, unresolved depth overflow " +
    "stays visible, unknown docs surface") {
    import org.apache.spark.sql.DataFrame
    // fixture tree: idx.xml -> [set.xml, idx2.xml, idx.xml (CYCLE)]
    //               idx2.xml -> [set2.xml]
    //               set.xml -> /p1 /p2 ; set2.xml -> /deep ; junk -> html
    val fetch: DataFrame => DataFrame = { f =>
      val u = col("sitemap_url")
      val xml = when(u.endsWith("/idx.xml"), lit(
        "<sitemapindex><sitemap><loc>http://h.com/set.xml</loc></sitemap>" +
          "<sitemap><loc>http://h.com/idx2.xml</loc></sitemap>" +
          "<sitemap><loc>http://h.com/idx.xml</loc></sitemap>" +
          "</sitemapindex>"))
        .when(u.endsWith("/idx2.xml"), lit(
          "<sitemapindex><sitemap><loc>http://h.com/set2.xml</loc>" +
            "</sitemap></sitemapindex>"))
        .when(u.endsWith("/set.xml"), lit(
          "<urlset><url><loc>http://h.com/p1</loc>" +
            "<lastmod>2026-01-01</lastmod></url>" +
            "<url><loc>http://h.com/p2</loc></url></urlset>"))
        .when(u.endsWith("/set2.xml"), lit(
          "<urlset><url><loc>http://h.com/deep</loc></url></urlset>"))
        .otherwise(lit("<html>404</html>"))
      f.select(u, xml.as("xml"))
    }
    val seeds = Seq("http://h.com/idx.xml", "http://h.com/junk.xml")
      .toDF("sitemap_url")
    val rows = Web.resolveSitemaps(seeds, "sitemap_url", fetch, maxDepth = 5)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getInt(4)))
    // the cycle back-edge appears as a row (observability) but is
    // fetched once: idx.xml's three children appear exactly once
    assert(rows.count(_._1 == "http://h.com/idx.xml") === 3)
    // depth-2 pages resolved
    assert(rows.toSet.contains(("http://h.com/set2.xml", "urlset",
      Some("http://h.com/deep"), None, 2)))
    // depth-1 urlset pages
    assert(rows.toSet.contains(("http://h.com/set.xml", "urlset",
      Some("http://h.com/p1"), Some("2026-01-01"), 1)))
    // the unparseable seed surfaces as unknown at depth 0
    assert(rows.toSet.contains(("http://h.com/junk.xml", "unknown",
      None, None, 0)))
    // total fetches: idx+junk (d0), set+idx2 (d1), set2 (d2) — idx
    // NOT refetched despite the cycle: exactly these source urls
    assert(rows.map(_._1).distinct.sorted === Seq(
      "http://h.com/idx.xml", "http://h.com/idx2.xml",
      "http://h.com/junk.xml", "http://h.com/set.xml",
      "http://h.com/set2.xml"))
    // maxDepth truncation: at depth 1 the idx2 row remains an
    // unresolved kind=index row and set2's pages never appear
    val shallow = Web.resolveSitemaps(
        Seq("http://h.com/idx.xml").toDF("sitemap_url"),
        "sitemap_url", fetch, maxDepth = 2)
      .collect().map(r => (r.getString(1), Option(r.getString(2))))
    assert(shallow.contains(("index", Some("http://h.com/idx2.xml"))))
    assert(!shallow.exists(_._2.contains("http://h.com/deep")))
  }

  test("recrawlGate: fetch = novel OR updated; NULL mods are " +
    "conservative; extendUrlModIndex re-pins an updated URL") {
    val corpus = Seq(
      (1L, "http://h.com/a", "2026-01-05"),
      (2L, "http://h.com/a", "2026-01-03"), // older dup — max wins
      (3L, "http://h.com/b", null),          // seen, unknown freshness
      (4L, "http://h.com/c", "2026-01-01")
    ).toDF("doc_id", "url", "mod")
    val idx = Web.urlModIndex(corpus, "url", "mod")
    val incoming = Seq(
      (10L, "http://h.com/a", "2026-01-04"), // seen, older → skip
      (11L, "http://h.com/a", "2026-01-06"), // seen, newer → updated
      (12L, "http://h.com/b", "2026-02-01"), // seen mod NULL → updated
      (13L, "http://h.com/b", null),         // no evidence → skip
      (14L, "http://h.com/new", null),       // novel → fetch
      (15L, "http://h.com/c", "2026-01-01")  // equal → skip
    ).toDF("doc_id", "url", "mod")
    def verdicts(i: Web.UrlModIndex) =
      Web.recrawlGate(i, incoming, "doc_id", "url", "mod")
        .select("doc_id", "novel", "updated", "fetch")
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSet
    assert(verdicts(idx) === Set(
      (10L, false, false, false), (11L, false, true, true),
      (12L, false, true, true), (13L, false, false, false),
      (14L, true, false, true), (15L, false, false, false)))
    // extend with the accepted batch: the updated URLs re-pin — the
    // same candidates now all read seen-and-current
    val idx2 = Web.extendUrlModIndex(idx,
      incoming.filter(col("doc_id").isin(11L, 12L, 14L)), "url", "mod")
    assert(verdicts(idx2) === Set(
      (10L, false, false, false), (11L, false, false, false),
      (12L, false, false, false), (13L, false, false, false),
      (14L, false, false, false), (15L, false, false, false)))
    // persistence: bucketed save/load round-trip compacts to one
    // max-mod row per URL; non-index tables refused
    dropTableFully("g_urlmod_idx")
    Web.saveUrlModIndex(idx2, "g_urlmod_idx")
    val reopened = Web.loadUrlModIndex(spark, "g_urlmod_idx")
    assert(verdicts(reopened) === verdicts(idx2))
    assert(reopened.urls.count() ===
      idx2.urls.select("url_canon").distinct().count())
    dropTableFully("g_not_urlmod_idx")
    corpus.select("doc_id").limit(2).write
      .format("parquet").saveAsTable("g_not_urlmod_idx")
    intercept[IllegalArgumentException] {
      Web.loadUrlModIndex(spark, "g_not_urlmod_idx")
    }
    // compaction keeps answers identical (legs fold to max-mod rows);
    // after CompactLegs extensions at least one compaction must have
    // reset the chain, so the final leg count sits below the threshold
    val compacted = (1 to Web.CompactLegs).foldLeft(idx2)((i, k) =>
      Web.extendUrlModIndex(i,
        Seq((100L + k, s"http://h.com/x$k", "2026-03-01"))
          .toDF("doc_id", "url", "mod"), "url", "mod"))
    assert(compacted.legs < Web.CompactLegs)
    assert(verdicts(compacted) === verdicts(idx2))
    // streaming lifecycle: micro-batched delivery through foreachBatch,
    // extending the index with each accepted batch, equals the batch
    // answer on the first delivery and re-pins on the second (the
    // st15/st16/st17 discipline at the freshness grain)
    val dir =
      java.nio.file.Files.createTempDirectory("graft_recrawl_").toString
    // one FILE per delivery (maxFilesPerTrigger=1 ⇒ one trigger per
    // file); the same batch lands twice — the 2nd pass must re-pin
    incoming.coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    incoming.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var live = idx
    val seen = scala.collection.mutable.ListBuffer[Map[Long, Boolean]]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val gated = Web.recrawlGate(live, df, "doc_id", "url", "mod")
          .localCheckpoint()
        seen += gated.select("doc_id", "fetch")
          .as[(Long, Boolean)].collect().toMap
        live = Web.extendUrlModIndex(live,
          df.join(gated.filter(col("fetch")).select("doc_id"),
            Seq("doc_id"), "left_semi"), "url", "mod")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.size === 2)
    // first delivery == the batch verdicts; second sees everything
    // pinned current (novel 14 was accepted, updated 11/12 re-pinned)
    assert(seen.head === Map(10L -> false, 11L -> true, 12L -> true,
      13L -> false, 14L -> true, 15L -> false))
    assert(seen(1).forall(!_._2))
  }

  test("extractLinks: RFC 3986-subset resolution (absolute, " +
    "scheme-relative, root-relative, dot-segments), entity decode, " +
    "fragment strip, dropped schemes, anchor markup stripped") {
    val html =
      """<a href="http://x.com/a">A</a>
        |<a href='//cdn.com/p?u=1&amp;v=2'>B</a>
        |<a href="/root">C</a>
        |<a class="k" href="sib.html#frag">D <i>it</i> E</a>
        |<a href="./same.html">dot</a>
        |<a href="../one/up.html">F</a>
        |<a href="../../two.html">G</a>
        |<a href="a/b/../c.html">H</a>
        |<a href="JavaScript:void(0)">no</a>
        |<a href="mailto:x@y.z">no</a>
        |<a href="">no</a>
        |<a href="img.html"><img src="i.png"></a>""".stripMargin
    val got = Web.extractLinks(
        Seq((1L, "http://h.com/d1/d2/page.html", html))
          .toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .select("link_url", "anchor").as[(String, String)].collect().toSet
    assert(got === Set(
      ("http://x.com/a", "A"),
      ("http://cdn.com/p?u=1&v=2", "B"),
      ("http://h.com/root", "C"),
      ("http://h.com/d1/d2/sib.html", "D it E"),
      ("http://h.com/d1/d2/same.html", "dot"),
      ("http://h.com/d1/one/up.html", "F"),
      ("http://h.com/two.html", "G"),
      ("http://h.com/d1/d2/a/c.html", "H"),
      ("http://h.com/d1/d2/img.html", "")))
    // over-popping ../ keeps its residue (bounded normalization —
    // browsers clamp, crawlers surface): still one row, never dropped
    val over = Web.extractLinks(
        Seq((1L, "http://h.com/p.html",
          "<a href=\"../../x.html\">o</a>")).toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .select("link_url").as[String].collect()
    assert(over.length === 1 && over.head.endsWith("x.html"))
    // a base URL with no directory resolves relatives at the root
    val rootBase = Web.extractLinks(
        Seq((1L, "http://h.com", "<a href=\"a.html\">r</a>"))
          .toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .select("link_url").as[String].head()
    assert(rootBase === "http://h.com/a.html")
  }

  test("ResolveHref kernel ≡ the retired column-algebra form on the " +
    "full resolution lattice (absolute, scheme/root/directory-" +
    "relative, dot segments, entities, fragments, dropped schemes, " +
    "whitespace, overlong ../ chains, empties)") {
    val hrefs = Seq(
      "http://x.com/abs", "HTTPS://X.com/UP?q=1#f", "//cdn.com/c",
      "/root/p", "rel.html", "./same/./x", "../up", "../../twice",
      "../../../../../over", "a/b/../c/./d", "  spaced  ",
      "q?a=1&amp;b=2&lt;3&gt;4&quot;5&apos;6", "#fragonly", "",
      "javascript:void(0)", "MAILTO:x@y.z", "tel:123", "data:text/x,1",
      "javascript2:ok", "x#f1#f2", "weird:::", "//", "/", "...",
      "/a//b/../c", "..", "p/..", "ftp://h/p", "custom+x.y-1:thing")
    val bases = Seq(
      "http://a.com/d/p.html", "https://b.com:8080/x/y/z?k=v",
      "http://c.com", "http://d.com/", "not a url", "")
    import spark.implicits._
    val rows = for { h <- hrefs; b <- bases } yield (h, b)
    val df = rows.toDF("h", "b")
    val got = df.select(
      graft.plans.ResolveHref.resolveHref(col("h"), col("b")).as("k"),
      Web.resolveHrefAlgebra(col("h"), col("b")).as("a"),
      col("h"), col("b")).collect()
    got.foreach { r =>
      assert(Option(r.getString(0)) === Option(r.getString(1)),
        s"kernel/algebra split on href='${r.getString(2)}' " +
          s"base='${r.getString(3)}': " +
          s"${Option(r.getString(0))} vs ${Option(r.getString(1))}")
    }
    assert(got.length === hrefs.size * bases.size)
  }

  test("two-cycle crawl replay: cycle 1 gates/schedules and extends " +
    "the freshness index + politeness state; cycle 2's gate skips " +
    "what cycle 1 pinned and its etas start where cycle 1's promises " +
    "end") {
    val delays = Seq(("a.com", 2.0)).toDF("host", "delay_sec")
    // prior state: a.com/p1 was fetched with mod 2026-01-05
    var idx = Web.urlModIndex(
      Seq(("http://a.com/p1", "2026-01-05")).toDF("url", "mod"),
      "url", "mod")
    // cycle 1: p1 republished NEWER (updated), p2 and b.com/x novel
    val c1 = Seq(
      ("http://a.com/p1", "2026-01-10"),
      ("http://a.com/p2", null),
      ("http://b.com/x", null)
    ).toDF("url", "lm")
    val g1 = Web.recrawlGate(idx, c1, "url", "url", "lm")
      .filter(col("fetch"))
    assert(g1.count() === 3)
    val s1 = Web.politenessSchedule(
      g1.select(col("url_canon").as("url"), col("url_canon").as("u2")),
      delays, "url", "u2")
    val state1 = Web.politenessStateAfter(s1)
    // the fetches observed mods: pin them
    idx = Web.extendUrlModIndex(idx,
      Seq(("http://a.com/p1", "2026-01-10"),
        ("http://a.com/p2", "2026-01-11"),
        ("http://b.com/x", null.asInstanceOf[String]))
        .toDF("url", "mod"), "url", "mod")
    // cycle 2: p1 at the SAME lm (pinned → skip), b.com/x again with
    // no freshness evidence (skip), p3 novel (fetch)
    val c2 = Seq(
      ("http://a.com/p1", "2026-01-10"),
      ("http://a.com/p3", null),
      ("http://b.com/x", null)
    ).toDF("url", "lm")
    val g2 = Web.recrawlGate(idx, c2, "url", "url", "lm")
      .filter(col("fetch"))
    assert(g2.select(col("url_canon")).as[String].collect().toSeq ===
      Seq("http://a.com/p3"))
    val s2 = Web.politenessScheduleResume(
      g2.select(col("url_canon").as("url"), col("url_canon").as("u2")),
      delays, state1, "url", "u2")
      .collect().map(r => (r.getString(2), r.getDouble(5)))
    // cycle 1 on a.com: slots 0,1 → etas 0,2; promise = 2 + 2 = 4;
    // cycle 2's first a.com fetch starts exactly there
    assert(s2.toSeq === Seq(("a.com", 4.0)))
    // composed ordering: across BOTH cycles a.com never schedules
    // closer than its 2 s delay
    val etas = s1.filter(col("host") === "a.com")
      .select(col("eta_sec")).as[Double].collect().toSeq :+ 4.0
    etas.sorted.sliding(2).foreach {
      case Seq(e1, e2) => assert(e2 - e1 >= 2.0 - 1e-9)
      case _ => ()
    }
  }

  test("politeness across cycles: two consecutive batches against one " +
    "host never schedule closer than delay_sec, idle hosts' promises " +
    "carry forward") {
    val delays = Seq(("slow.com", 2.0)).toDF("host", "delay_sec")
    val b1 = Seq(
      (1L, "http://slow.com/a"), (2L, "http://slow.com/b"),
      (3L, "http://idle.com/x")).toDF("doc_id", "url")
    val b2 = Seq(
      (4L, "http://slow.com/c"), (5L, "http://slow.com/d"),
      (6L, "http://fresh.com/y")).toDF("doc_id", "url")
    val s1 = Web.politenessSchedule(b1, delays, "doc_id", "url",
      defaultDelaySec = 1.0)
    val st1 = Web.politenessStateAfter(s1)
    val s2 = Web.politenessScheduleResume(b2, delays, st1, "doc_id",
      "url", defaultDelaySec = 1.0)
    val etas = (s1.unionByName(s2))
      .select("host", "eta_sec", "delay_sec")
      .as[(String, Double, Double)].collect()
      .groupBy(_._1).map { case (h, rows) =>
        h -> rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq }
    // every consecutive pair on one host is >= delay apart
    etas.foreach { case (_, seq) =>
      seq.sliding(2).foreach {
        case Seq((e1, d), (e2, _)) => assert(e2 - e1 >= d - 1e-9)
        case _ => ()
      }
    }
    // slow.com cycle 2 starts at 4.0 (cycle 1 etas 0,2 → next 4)
    val slow2 = s2.filter(col("host") === "slow.com")
      .select("eta_sec").as[Double].collect().sorted
    assert(slow2 === Array(4.0, 6.0))
    // a host with no prior state starts at 0
    assert(s2.filter(col("host") === "fresh.com")
      .select("eta_sec").as[Double].head() === 0.0)
    // idle.com's promise carries forward through the next state
    val st2 = Web.politenessStateAfter(s2, prior = Some(st1))
    val m = st2.as[(String, Double)].collect().toMap
    assert(m("idle.com") === 1.0) // one fetch at 0 + default delay 1
    assert(m("slow.com") === 8.0) // last eta 6 + delay 2
    // persistence: the state snapshot survives a restart; non-state
    // tables refused
    dropTableFully("g_host_state")
    Web.saveHostState(st2, "g_host_state")
    val back = Web.loadHostState(spark, "g_host_state")
      .as[(String, Double)].collect().toMap
    assert(back === m)
    dropTableFully("g_not_host_state")
    delays.write.format("parquet").saveAsTable("g_not_host_state")
    intercept[IllegalArgumentException] {
      Web.loadHostState(spark, "g_not_host_state")
    }
    // streaming lifecycle: the same two batches micro-batched through
    // foreachBatch with the state threaded between triggers produce
    // the same per-host gap guarantee as the batch-composed answer
    val dir =
      java.nio.file.Files.createTempDirectory("graft_polite_").toString
    b1.write.mode("append").parquet(dir)
    b2.write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val got = scala.collection.mutable.ListBuffer[(String, Double, Double)]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val sched = state match {
          case None => Web.politenessSchedule(df, delays, "doc_id", "url",
            defaultDelaySec = 1.0)
          case Some(st) => Web.politenessScheduleResume(df, delays, st,
            "doc_id", "url", defaultDelaySec = 1.0)
        }
        val pinned = sched.localCheckpoint()
        got ++= pinned.select("host", "eta_sec", "delay_sec")
          .as[(String, Double, Double)].collect()
        state = Some(Web.politenessStateAfter(pinned,
          prior = state).localCheckpoint())
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq.sliding(2).foreach {
        case Seq((e1, d), (e2, _)) => assert(e2 - e1 >= d - 1e-9)
        case _ => ()
      }
    }
    ()
  }

  test("urlTrapScore: one exploding template trips the trap, hex " +
    "session tokens fold to H (duplicate URLs count once), a benign " +
    "host stays false") {
    val urls = Seq(
      "http://a.com/cal/1", "http://a.com/cal/2", "http://a.com/cal/3",
      "http://a.com/about",
      "http://b.com/s/deadbeefcafe1", "http://b.com/s/deadbeefcafe1",
      "http://b.com/p"
    ).toDF("url")
    val got = Web.urlTrapScore(urls, "url", threshold = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // a.com: /cal/N explodes to 3 paths (worst=3 trips threshold 3),
    // /about is its own template
    assert(got("a.com") === ((4L, 2L, 3L, true)))
    // b.com: the 13-hex session folds to /s/H, the dup URL deduped
    assert(got("b.com") === ((2L, 2L, 1L, false)))
  }

  test("urlTrapScore session-token fold: uppercase/mixed-case GUIDs " +
    "fold to H like lowercase ones, pure digit runs of any length " +
    "fold to N (one logical template never splits)") {
    val urls = Seq(
      // one session template in four casings/compositions
      "http://c.com/s/DEADBEEFCAFE12",   // uppercase hex
      "http://c.com/s/deadbeefcafe34",   // lowercase hex
      "http://c.com/s/DeAdBeEf99ff00",   // mixed case
      "http://c.com/s/12345678abc",      // letter only after 8 digits
      // one digit template in two lengths — both fold to N, not
      // (short→N, ≥8→H)
      "http://d.com/n/1234567890123", "http://d.com/n/42",
      // a 7-char hex token is too short for the session fold: the
      // letters survive, digits fold → two DIFFERENT templates
      "http://e.com/s/beef123", "http://e.com/s/cafe456x7890abcd"
    ).toDF("url")
    val got = Web.urlTrapScore(urls, "url", threshold = 100)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("c.com") === ((4L, 1L, 4L)), s"c.com: ${got("c.com")}")
    assert(got("d.com") === ((2L, 1L, 2L)), s"d.com: ${got("d.com")}")
    assert(got("e.com") === ((2L, 2L, 1L)), s"e.com: ${got("e.com")}")
  }

  test("resolveRedirects and recrawlBackoff are partitioning-" +
    "invariant (min-dst dedup and (ts,hash)-max make them " +
    "order-free)") {
    val ed = Seq(("u1", "u2"), ("u2", "u3"), ("u1", "zzz"), ("a", "b"),
      ("b", "a")).toDF("src", "dst")
    def rr(df: org.apache.spark.sql.DataFrame) =
      Web.resolveRedirects(df, "src", "dst", maxHops = 4)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getBoolean(3))).toSet
    assert(rr(ed.coalesce(1)) === rr(ed.repartition(16)))
    val hist = Seq(("u1", 1.0, "A"), ("u1", 2.0, "B"), ("u1", 3.0, "B"))
      .toDF("url", "sec", "h")
      .select(col("url"), timestamp_seconds(col("sec")).as("ts"), col("h"))
    def rb(df: org.apache.spark.sql.DataFrame) =
      Web.recrawlBackoff(df, "url", "ts", "h")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2))).toSet
    assert(rb(hist.coalesce(1)) === rb(hist.repartition(16)))
  }

  test("extractLinkUrls emits exactly extractLinks' link_url column " +
    "(the anchor leg is the only thing dropped)") {
    val pages = Seq(
      (1L, "http://a.com/d/p.html",
        "<a href=\"http://b.com/x\">B</a><a href='/r/1'>R</a>" +
          "<a href=\"../up/2#f\">Up <b>b</b></a>" +
          "<a href=\"javascript:void(0)\">j</a>" +
          "<a href=\"//cdn.com/c?a=1&amp;b=2\"></a>")
    ).toDF("doc_id", "url", "html")
    val urlsOnly = Web.extractLinkUrls(pages, "url", "html")
      .collect().map(_.getString(0)).sorted.toSeq
    val full = Web.extractLinks(pages, "doc_id", "url", "html")
      .select(col("link_url")).collect().map(_.getString(0)).sorted.toSeq
    assert(urlsOnly === full)
    assert(urlsOnly.contains("http://cdn.com/c?a=1&b=2"))
  }

  test("extractLinkUrlsPolicy emits exactly extractLinksPolicy minus " +
    "the anchor column") {
    val pages = Seq((1L, "http://a.com/d/p.html",
      "<a href=\"/x\" rel=\"nofollow\">X</a>" +
        "<a rel=\"ugc nofollow\" href=\"/y\">Y</a>" +
        "<a href=\"/z\" rel=\"noreferrer nofollower\">Z</a>" +
        "<a href=\"/w\">W</a>")).toDF("doc_id", "url", "html")
    val slim = Web.extractLinkUrlsPolicy(pages, "doc_id", "url", "html")
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
    val full = Web.extractLinksPolicy(pages, "doc_id", "url", "html")
      .collect().map(r => (r.getString(1), r.getBoolean(3))).toSet
    assert(slim === full)
  }

  test("politenessAudit: sub-delay gaps count as violations, " +
    "unlisted hosts audit against the default, single-fetch hosts " +
    "report NULL min gap") {
    val fetches = Seq(
      (1L, "a.com", 1000.0), (2L, "a.com", 1001.5), (3L, "a.com", 1004.0),
      (4L, "b.com", 2000.0), (5L, "b.com", 2000.5),
      (6L, "c.com", 3000.0)
    ).toDF("event_id", "host", "sec")
      .select(col("event_id"), col("host"),
        timestamp_seconds(col("sec")).as("ts"))
    val delays = Seq(("a.com", 2.0)).toDF("host", "delay_sec")
    val got = Web.politenessAudit(fetches, delays, "event_id", "host",
      "ts").collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // a.com: gaps 1.5s (violation at delay 2) and 2.5s (ok)
    assert(got("a.com") === ((2.0, 3L, 1L, 1500000L)))
    // b.com rides the 1.0 default: the 0.5s gap violates
    assert(got("b.com") === ((1.0, 2L, 1L, 500000L)))
    assert(got("c.com") === ((1.0, 1L, 0L, -1L)))
  }

  test("recrawlBackoff: streak counts fetches since the last content " +
    "change, interval doubles per unchanged revisit and caps at " +
    "2^maxExp; flip-flops reset") {
    val hist = Seq(
      ("u1", 1.0, "A"), ("u1", 2.0, "A"), ("u1", 3.0, "B"),
      ("u1", 4.0, "B"), ("u1", 5.0, "B"),
      ("u2", 1.0, "C"),
      ("u3", 1.0, "A"), ("u3", 2.0, "B"), ("u3", 3.0, "A")
    ) ++ (1 to 9).map(i => ("u4", i.toDouble, "Z"))
    val df = hist.toDF("url", "sec", "h")
      .select(col("url"), timestamp_seconds(col("sec")).as("ts"), col("h"))
    val got = Web.recrawlBackoff(df, "url", "ts", "h",
      baseSec = 3600L, maxExp = 6).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("u1") === ((3L, 14400L)))   // 3 unchanged → 3600·2²
    assert(got("u2") === ((1L, 3600L)))    // first sighting → base
    assert(got("u3") === ((1L, 3600L)))    // flip-flop resets to 1
    assert(got("u4") === ((9L, 230400L)))  // streak 9 capped at 2⁶
  }

  test("pageDirectives: meta robots token boundaries, attribute order " +
    "freedom, canonical resolution (root- and directory-relative), " +
    "decoy metas ignored") {
    val pages = Seq(
      (1L, "http://a.com/d/p.html",
        "<meta name=\"viewport\" content=\"w\">" +
          "<meta name=\"robots\" content=\"noindex, nofollow\">" +
          "<link rel=\"canonical\" href=\"/master\">"),
      (2L, "http://a.com/x", "<meta content=\"nofollow\" name=\"robots\">"),
      (3L, "http://a.com/x", "<meta name=\"robots\" content=\"nofollowme\">"),
      (4L, "http://a.com/x", "<body>none</body>"),
      (5L, "http://a.com/a/b", "<link href=\"c2\" rel=\"canonical\">"),
      // SEPARATE noindex and nofollow metas: directives OR across all
      // robots tags, not just the first
      (6L, "http://a.com/x",
        "<meta name=\"robots\" content=\"noindex\">" +
          "<meta name=\"robots\" content=\"nofollow\">"),
      // a CMS-injected duplicate of the same tag stays idempotent
      (7L, "http://a.com/x",
        "<meta name=\"robots\" content=\"nofollow\">" +
          "<meta name=\"robots\" content=\"nofollow\">")
    ).toDF("doc_id", "url", "html")
    val got = Web.pageDirectives(pages, "doc_id", "url", "html").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(got(1L) === ((true, true, Some("http://a.com/master"))))
    assert(got(2L) === ((false, true, None)))
    assert(got(3L) === ((false, false, None)))
    assert(got(4L) === ((false, false, None)))
    assert(got(5L) === ((false, false, Some("http://a.com/a/c2"))))
    assert(got(6L) === ((true, true, None)))
    assert(got(7L) === ((false, true, None)))
  }

  test("extractLinksPolicy: rel before/after href, 'nofollower' fails " +
    "the token boundary, no-rel defaults false") {
    val pages = Seq((1L, "http://a.com/d/p.html",
      "<a href=\"/x\" rel=\"nofollow\">X</a>" +
        "<a rel=\"ugc nofollow\" href=\"/y\">Y</a>" +
        "<a href=\"/z\" rel=\"noreferrer nofollower\">Z</a>" +
        "<a href=\"/w\">W</a>")).toDF("doc_id", "url", "html")
    val got = Web.extractLinksPolicy(pages, "doc_id", "url", "html")
      .collect().map(r => r.getString(1) -> r.getBoolean(3)).toMap
    assert(got === Map("http://a.com/x" -> true, "http://a.com/y" -> true,
      "http://a.com/z" -> false, "http://a.com/w" -> false))
  }

  test("canonicalKeepers: declared canonical groups pages under the " +
    "publisher's keeper; (max weight, min id) picks within a key; a " +
    "www/default-port/tracking-param VARIANT of the declared target " +
    "groups with the master page keyed on its own canonical form") {
    val pages = Seq(
      (1L, "http://a.com/p1?utm_source=t",
        "<link rel=\"canonical\" href=\"/m\">", 10L),
      (2L, "http://a.com/p2", "<link rel=\"canonical\" href=\"/m\">", 30L),
      (3L, "http://a.com/p3", "", 20L),
      (4L, "http://a.com/p3", "", 20L),
      // declares the SAME target as 1/2, spelled dirty — must join
      // their cluster (and wins it on weight)
      (5L, "http://a.com/p5",
        "<link rel=\"canonical\" " +
          "href=\"http://www.a.com:80/m?utm_source=x\">", 40L),
      // the master page itself: keys on its own canonical URL /m
      (6L, "http://www.a.com/m", "", 5L)
    ).toDF("doc_id", "url", "html", "n_chars")
    val got = Web.canonicalKeepers(pages, "doc_id", "url", "html",
      "n_chars").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === (("http://a.com/m", 5L, false)))
    assert(got(2L) === (("http://a.com/m", 5L, false)))
    assert(got(3L) === (("http://a.com/p3", 3L, true)))
    assert(got(4L) === (("http://a.com/p3", 3L, false)))
    assert(got(5L) === (("http://a.com/m", 5L, true)))
    assert(got(6L) === (("http://a.com/m", 5L, false)))
  }

  test("crawlBudget: window/delay slot algebra, default delay for " +
    "unlisted hosts, deferred remainder") {
    val frontier = Seq(
      "http://a.com/1", "http://a.com/2", "http://a.com/3",
      "http://b.com/1", "http://b.com/2", "http://b.com/3",
      "http://b.com/4", "http://b.com/5", "http://b.com/6",
      "http://b.com/7", "http://b.com/8", "http://b.com/9",
      "http://b.com/10"
    ).toDF("url")
    val delays = Seq(("a.com", 2.0)).toDF("host", "delay_sec")
    val got = Web.crawlBudget(frontier, delays, "url", windowSec = 5.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // a.com: slots at 0/2/4 → capacity 3, queue 3 fits exactly
    assert(got("a.com") === ((3L, 2.0, 3L, 3L, 0L)))
    // b.com rides the 1.0 default: capacity 6, 4 deferred
    assert(got("b.com") === ((10L, 1.0, 6L, 6L, 4L)))
  }

  test("applyBudget: the budget is a brake — a mega-host's overflow " +
    "loses its ETA, comes out deferred_next, and cycle 2's resumed " +
    "schedule actually fetches the carry") {
    // b.com queues 10 URLs into a 5 s window at the 1.0 default delay
    // → capacity 6; a.com's 2 fit under its capacity 3
    val c1 = Seq(
      "http://a.com/1", "http://a.com/2",
      "http://b.com/1", "http://b.com/2", "http://b.com/3",
      "http://b.com/4", "http://b.com/5", "http://b.com/6",
      "http://b.com/7", "http://b.com/8", "http://b.com/9",
      "http://b.com/10"
    ).toDF("url").select(col("url"), col("url").as("u2"))
    val delays = Seq(("a.com", 2.0)).toDF("host", "delay_sec")
    val sched1 = Web.politenessSchedule(c1, delays, "url", "u2")
    val budget = Web.crawlBudget(c1.select(col("url")), delays, "url",
      windowSec = 5.0)
    val split = Web.applyBudget(sched1, budget)
    val rows = split.collect().map(r => r.getAs[String]("url_canon") ->
      ((r.getAs[Int]("slot"), Option(r.getAs[java.lang.Double]("eta_sec")),
        r.getAs[Boolean]("deferred_next")))).toMap
    // within-allocation rows keep their ETAs (slots order by URL
    // STRING, so b.com's slot order is /1, /10, /2, …, /9)
    assert(rows("http://a.com/1") === ((0, Some(0.0), false)))
    assert(rows("http://b.com/10") === ((1, Some(1.0), false)))
    assert(rows("http://b.com/5") === ((5, Some(5.0), false)))
    // the overflow (slots 6..9 on b.com) is deferred with NO eta
    val deferred = rows.filter(_._2._3)
    assert(deferred.keySet ===
      Set("http://b.com/6", "http://b.com/7", "http://b.com/8",
        "http://b.com/9"))
    assert(deferred.values.forall(_._2.isEmpty))
    // cycle 2: the carry re-enters as candidates against the state
    // cycle 1 left — the resumed schedule fetches every deferred URL
    // at ETAs past cycle 1's horizon for that host
    val fetched1 = split.filter(!col("deferred_next"))
      .select(col("url_canon").as("url"), col("host"), col("slot"),
        col("delay_sec"), col("eta_sec"))
    val state = Web.politenessStateAfter(fetched1)
    val c2 = split.filter(col("deferred_next"))
      .select(col("url_canon").as("url"), col("url_canon").as("u2"))
    val sched2 = Web.politenessScheduleResume(c2, delays, state,
      "url", "u2")
    val got2 = sched2.collect().map(r => r.getAs[String]("url_canon") ->
      r.getAs[Double]("eta_sec")).toMap
    assert(got2.keySet === deferred.keySet)
    // cycle 1's b.com horizon: max eta 5.0 + delay 1.0 = 6.0
    assert(got2("http://b.com/6") === 6.0)
    assert(got2("http://b.com/9") === 9.0)
  }

  test("resolveRedirects: chains resolve with hop counts, a 2-cycle " +
    "pins at maxHops unresolved, conflicting edges keep min-dst, " +
    "maxHops=1 stops after the first hop") {
    val ed = Seq(("u1", "u2"), ("u2", "u3"), ("a", "b"), ("b", "a"),
      ("u1", "zzz")).toDF("src", "dst")
    val got = Web.resolveRedirects(ed, "src", "dst", maxHops = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    // min("u2","zzz") keeps the chain edge for u1
    assert(got("u1") === (("u3", 2, true)))
    assert(got("u2") === (("u3", 1, true)))
    // the 2-cycle walks to maxHops and reports unresolved
    assert(got("a")._2 === 4 && !got("a")._3)
    assert(got("b")._2 === 4 && !got("b")._3)
    val one = Web.resolveRedirects(ed, "src", "dst", maxHops = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    // one hop: u1 lands on u2, which still redirects → unresolved
    assert(one("u1") === (("u2", 1, false)))
    assert(one("u2") === (("u3", 1, true)))
  }
}
