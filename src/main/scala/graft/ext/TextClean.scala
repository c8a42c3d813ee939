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
}
