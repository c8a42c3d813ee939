package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks natively: the
  * backward as-of join (attach the most recent right-side row at or
  * before each left timestamp) and the bounded range join (pair rows
  * whose timestamps fall within a fixed gap).
  *
  * Both are expressed so the physical plan stays a single hash
  * exchange + linear pass at any scale:
  *
  *  - [[asOfJoin]] is the union-then-window formulation: tag both
  *    sides, union, and carry the matched right row forward as ONE
  *    struct with `last(..., ignoreNulls)` over a running row frame
  *    (a single struct, not per-column carries, so a null payload in
  *    the matched row stays null instead of backfilling from an older
  *    row).  One shuffle
  *    on the join keys, one ordered scan per key — never a per-row
  *    range probe, never a BroadcastNestedLoopJoin, and no state blow-up
  *    when one left row matches a million-old right history (the frame
  *    is O(1) amortized per row).
  *  - [[rangeJoinBanded]] replaces the inequality join (which Spark
  *    plans as BNLJ/cartesian) with an equi-join on coarse time
  *    buckets sized to the gap: each left row joins exactly two
  *    bucket keys, so the shuffle is keyed and AQE-sizable, and the
  *    exact range predicate filters inside the joined stream.
  *
  * Reference behavior (what to compute): the fetchers repeatedly align
  * a reading with the latest preceding station/config state and window
  * readings into bounded lookback ranges (`airgradient.js:101-141`,
  * `cmu.js:118-160`); these are those alignments as reusable relational
  * operators.
  */
object Temporal {

  private val Reserved =
    Seq("__asof_side", "__asof_ts", "__asof_tb", "__asof_pack")

  /** Backward as-of join: for every `left` row, attach `payload`
    * columns from the `right` row with the greatest `rightTs <=
    * leftTs` (or `< leftTs` when `inclusive = false`) within the same
    * `keys` group; left rows with no predecessor keep null payloads
    * (left-outer semantics).
    *
    * Ties on `rightTs` resolve to the greatest `tiebreak` value, so
    * results are deterministic on real data where timestamps collide.
    * The matched right timestamp is exposed as `matchedTsAs` — callers
    * wanting a tolerance (max match age) filter on it afterwards, which
    * keeps this operator one window pass.
    *
    * `direction = "forward"` flips the match to the EARLIEST right row
    * at-or-after (`> ` when strict) each left timestamp — the "next
    * state change" lookup; same plan, the window just orders descending.
    *
    * Scale shape: one exchange on `keys`, one sort, one running-frame
    * window carrying the matched row as a single struct column.
    * No join node at all — as-of over a 100 TB history costs the same
    * plan as over a day.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               tiebreak: Option[String] = None, inclusive: Boolean = true,
               matchedTsAs: String = "matched_ts",
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    val outCols = matchedTsAs +: payload
    val clash = left.columns.toSeq.intersect(outCols) ++
      (left.columns ++ right.columns).toSeq.intersect(Reserved)
    require(clash.isEmpty,
      s"asOfJoin reserved/output column collision: ${clash.mkString(", ")}")

    val rSchema = right.schema
    def rType(c: String) = rSchema(c).dataType
    val tbType = tiebreak.map(rType).getOrElse(
      org.apache.spark.sql.types.IntegerType)

    // The matched row travels as ONE struct, non-null exactly on right
    // rows. A single last(ignoreNulls) over the struct then returns the
    // matched row's values atomically — nulls in individual payload
    // columns included. (Carrying each payload column independently
    // would backfill a matched row's null payload from an OLDER right
    // row, producing a chimera of two right rows.)
    val packType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        matchedTsAs, rType(rightTs)) +:
        payload.map(c => org.apache.spark.sql.types.StructField(c, rType(c))))

    val leftCols = left.columns.toSeq
    val l2 = left
      .withColumn("__asof_pack", lit(null).cast(packType))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_tb", lit(null).cast(tbType))

    // Right rows with a null timestamp can never be "the most recent
    // at-or-before" anything — drop them before the union (null sorts
    // first and would otherwise leak payloads onto every left row).
    val r2base = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__asof_pack", struct(
        (col(rightTs).as(matchedTsAs) +: payload.map(col)): _*))
      .withColumn("__asof_side", lit(0))
      .withColumn("__asof_ts", col(rightTs))
      .withColumn("__asof_tb",
        tiebreak.map(col).getOrElse(lit(null).cast(tbType)))
    // left-only columns ride as nulls on right rows
    val lSchema = left.schema
    val r2 = leftCols.filterNot(c => keys.contains(c))
      .foldLeft(r2base)((df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(lSchema(c).dataType)))

    val unionCols = leftCols ++ Reserved
    val unioned = l2.select(unionCols.map(col): _*)
      .unionByName(r2.select(unionCols.map(col): _*))

    // At equal timestamps: inclusive → right rows sort first (left
    // sees them); strict → left rows sort first (left does not).
    // Forward mode scans time in reverse: the running frame then
    // carries the EARLIEST at-or-after right row.
    val sideOrder =
      if (inclusive) col("__asof_side").asc else col("__asof_side").desc
    val tsOrder =
      if (direction == "backward") col("__asof_ts").asc
      else col("__asof_ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, sideOrder, col("__asof_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = unioned.withColumn("__asof_pack",
      last(col("__asof_pack"), ignoreNulls = true).over(w))

    carried.filter(col("__asof_side") === 1)
      .select(leftCols.map(col) ++
        outCols.map(c => col("__asof_pack").getField(c).as(c)): _*)
  }

  /** Tolerance-bounded backward as-of join, banded for skew: the
    * answer of [[asOfJoin]] restricted to matches at most
    * `toleranceSeconds` old (older-than-tolerance matches become
    * null-payload rows, left-outer style).
    *
    * Why it exists: [[asOfJoin]]'s running window partitions by `keys`
    * alone, so ONE pathological key (a monster provider, a default
    * device id) serializes its entire history into one task — pinned
    * by `SkewStressSpec`.  When the caller can bound the match age,
    * this variant joins on `(keys, time-band)` instead: timestamps
    * floor to tolerance-wide bands, right rows replicate onto
    * `(band, band + 1)`, and every in-tolerance pair shares exactly
    * one band key.  The monster key's work spreads over its time
    * bands — the shuffle is keyed and AQE/salting-amenable like any
    * equi-join — and the per-left-row "latest match" pick windows by
    * a synthetic unique row id assigned before the join, which is
    * skew-free by construction and safe under duplicate business
    * keys (every left row keeps its own match, like [[asOfJoin]]).
    * Unbounded-lookback as-of cannot band this way (a match may be
    * arbitrarily old); that is what [[asOfJoin]] remains for.
    *
    * Semantics pinned by test: equals `asOfJoin(...)` followed by
    * nulling payloads where `leftTs − matched_ts > tolerance`
    * (if the overall-latest match is out of tolerance, no in-tolerance
    * match exists).  Ties on `rightTs` resolve to the greatest
    * `tiebreak`, matching [[asOfJoin]].
    */
  def asOfJoinBanded(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     payload: Seq[String], toleranceSeconds: Long,
                     tiebreak: Option[String] = None,
                     inclusive: Boolean = true,
                     matchedTsAs: String = "matched_ts"): DataFrame = {
    require(keys.nonEmpty, "asOfJoinBanded needs at least one key column")
    require(toleranceSeconds > 0, "asOfJoinBanded needs a positive tolerance")
    val outCols = matchedTsAs +: payload
    val abReserved = Seq("__ab_b", "__ab_tb", "__ab_ok", "__ab_rn", "__ab_rid")
    val clash = left.columns.toSeq.intersect(outCols) ++
      (left.columns ++ right.columns).filter(abReserved.contains)
    require(clash.isEmpty,
      s"asOfJoinBanded reserved/output column collision: ${clash.mkString(", ")}")

    val gapUs = toleranceSeconds * 1000000L
    def bandOf(ts: String) = expr(s"unix_micros(`$ts`) div ${gapUs}L")
    val leftCols = left.columns.toSeq
    // unique per-left-row key for the rank window: assigned BEFORE the
    // band join, so every joined candidate of a left row carries the
    // same id and no two left rows share one — duplicate business keys
    // can no longer collapse to a single output row
    val l2 = left.withColumn("__ab_rid", monotonically_increasing_id())
      .withColumn("__ab_b", bandOf(leftTs))
    // right side projected to exactly what the output needs (keys,
    // match ts, payload, tiebreak) — no accidental column collisions
    val tbCol = "__ab_tb"
    val r2 = right
      .filter(col(rightTs).isNotNull)
      .select((keys.map(col) :+ col(rightTs).as(matchedTsAs)) ++
        payload.map(col) ++
        tiebreak.map(c => col(c).as(tbCol)).toSeq: _*)
      .withColumn("__ab_b",
        explode(array(expr(s"unix_micros(`$matchedTsAs`) div ${gapUs}L"),
          expr(s"unix_micros(`$matchedTsAs`) div ${gapUs}L") + 1)))

    val delta = unix_micros(col(leftTs)) - unix_micros(col(matchedTsAs))
    val lower = if (inclusive) delta >= 0 else delta > 0
    // out-of-range joined rows must not WIN the rank-1 pick, but the
    // left row must still survive if nothing is in range — blank the
    // right-side columns instead of filtering the row
    val joined = l2.join(r2, keys :+ "__ab_b", "left_outer")
      .withColumn("__ab_ok", lower && delta <= gapUs)
    val blanked = (outCols :+ tbCol).foldLeft(joined)((df, c) =>
      if (df.columns.contains(c))
        df.withColumn(c, when(col("__ab_ok"), col(c)))
      else df)
    val ord = col(matchedTsAs).desc_nulls_last +:
      tiebreak.map(_ => col(tbCol).desc_nulls_last).toSeq
    val w = Window.partitionBy(col("__ab_rid")).orderBy(ord: _*)
    blanked
      .withColumn("__ab_rn", row_number().over(w))
      .filter(col("__ab_rn") === 1)
      .select((leftCols ++ outCols).map(col(_)): _*)
  }

  /** Bounded range join: inner-join pairs `(l, r)` on `keys` where
    * `l.leftTs < r.rightTs <= l.leftTs + maxGapSeconds` (the lower
    * bound becomes inclusive with `strictLower = false`).
    *
    * Implementation is the bucketed band join: timestamps floor to
    * `maxGapSeconds`-wide buckets, the left side duplicates onto
    * `(bucket, bucket + 1)`, and the join is a plain equi-join on
    * `keys :+ bucket` — any in-range pair shares a key by
    * construction, each pair matches exactly one bucket key (no
    * dedup needed), and the exact predicate runs on the joined
    * stream.  Catalyst plans a shuffled hash/sort-merge join keyed by
    * `(keys, bucket)`: AQE can size and skew-split it, which an
    * inequality-only join (BNLJ) never allows.  Left-side row count
    * grows 2×, not gap×.
    */
  def rangeJoinBanded(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, maxGapSeconds: Long,
                      strictLower: Boolean = true): DataFrame = {
    require(maxGapSeconds > 0, "rangeJoinBanded needs a positive gap")
    require(keys.nonEmpty, "rangeJoinBanded needs at least one key column")
    val clash = (left.columns ++ right.columns).filter(_ == "__rj_b")
    require(clash.isEmpty, "rangeJoinBanded reserved column __rj_b present")
    require(leftTs != rightTs,
      "rangeJoinBanded needs distinct left/right timestamp column names")

    val gapUs = maxGapSeconds * 1000000L
    // exact integer division (truncated `div` keeps the two-band
    // adjacency guarantee for every sign; a double `floor` could flip
    // at exact gap multiples once epochs outgrow the mantissa)
    def bandOf(ts: String) = expr(s"unix_micros(`$ts`) div ${gapUs}L")
    val l2 = left.withColumn("__rj_b",
      explode(array(bandOf(leftTs), bandOf(leftTs) + 1)))
    val r2 = right.withColumn("__rj_b", bandOf(rightTs))

    val gap = unix_micros(col(rightTs)) - unix_micros(col(leftTs))
    val lower = if (strictLower) gap > 0 else gap >= 0
    l2.join(r2, keys :+ "__rj_b")
      .filter(lower && gap <= gapUs)
      .drop("__rj_b")
  }
}
