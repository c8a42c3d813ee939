package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/boilerplate stripping — the first preprocessing stage of a
  * web-crawl corpus (C4-style: markup out, entities decoded, whitespace
  * normalized) before tokenization or any quality/dedup pass sees the
  * text.
  *
  * Pure codegen'd `regexp_replace`/`replace` chains, shuffle-free, and
  * — like [[Pii]] — deliberately inside the RE2-compatible regex subset
  * (no backreferences: script and style blocks get separate patterns
  * instead of a `</\1>` backref) so the exact same pipeline replays on
  * the SQL oracle and any downstream engine.
  *
  * Order is part of the contract: container blocks (script/style,
  * whose CONTENT must vanish) → comments → tags (content kept) →
  * entity decode → whitespace collapse.  Entities decode AFTER tag
  * stripping so a literal `&lt;p&gt;` in prose cannot turn into a
  * strippable tag.
  */
object TextClean {

  /** Tag-like blocks whose inner content is removed wholesale. */
  val blockPatterns: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** Any remaining tag (content kept). */
  val tagPattern: String = "(?s)<[^>]+>"

  /** Minimal entity set (the long tail needs an ICU pass; these cover
    * the overwhelming bulk of crawl text). */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'")

  /** The full scrub as one column expression. */
  def stripHtml(text: Column): Column = {
    val noBlocks = blockPatterns.foldLeft(text)(regexp_replace(_, _, " "))
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val decoded = entities.foldLeft(noTags) { case (t, (e, r)) =>
      regexp_replace(t, java.util.regex.Pattern.quote(e), r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document cleaning audit: cleaned text, sizes, and the removed
    * fraction (markup mass — a strong boilerplate signal on crawls).
    * One narrow projection; fuses into the scan at any scale. */
  def cleanByDoc(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol), stripHtml(t).as("text_clean"),
        length(t).as("n_chars_raw"))
      .withColumn("n_chars_clean", length(col("text_clean")))
      .withColumn("removed_frac",
        (col("n_chars_raw") - col("n_chars_clean")).cast("double")
          / col("n_chars_raw"))
  }

  /** C4's line-level keep rule: a retained line has at least
    * [[c4MinWords]] words, ends in terminal punctuation, and carries
    * none of the boilerplate markers ("javascript" / "cookie" /
    * "lorem ipsum" — case-insensitive). */
  val c4MinWords = 5

  /** Lowercased substrings that disqualify a line (C4 §2.2). */
  val c4BadMarkers: Seq[String] = Seq("javascript", "cookie", "lorem ipsum")

  /** True iff `line` survives the C4 line rules. */
  def c4KeepLine(line: Column): Column = {
    val t = trim(line)
    val lc = lower(t)
    (size(split(t, " +")) >= c4MinWords) &&
      t.rlike("[.!?\"]$") &&
      c4BadMarkers.map(m => !lc.contains(m)).reduce(_ && _)
  }

  /** C4 line-level cleanup: split on newlines, keep only lines passing
    * [[c4KeepLine]], re-join, and flag documents left with no content.
    * Pure array higher-order functions over one row — shuffle-free,
    * fuses with the scan and the [[stripHtml]] pass at any scale. */
  def c4LineFilter(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => c4KeepLine(l))
    docs.select(col(idCol),
        size(lines).as("n_lines"),
        size(kept).as("n_lines_kept"),
        array_join(kept, "\n").as("text_clean"))
      .withColumn("keep_doc", col("n_lines_kept") >= 1)
  }
}
