package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, TimestampType}

/** Engine extensions, registered via `spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  *  1. [[PushNanosEquivFilter]] — optimizer rule restoring filter
  *     pushdown through the nanos→micros timestamp normalization;
  *  2. SQL registration of the custom expression/aggregate surface:
  *     `sorted_intersect_size(a, b)`, `point_in_polygon(px, py, xs,
  *     ys)`, `minhash_union(sig)`, `minhash_sig(toks, n, k)`,
  *     `simhash_sig(toks)`, `token_set_encode(toks)`, `pii_redact(text)`,
  *     `bloom_agg(hash64, numBits, numHashes)`,
  *     `bloom_might_contain(filter, hash64)`, `url_canonicalize(url)`,
  *     `hll_agg(value)`, `hll_singleton(value)`, `hll_union(sketch)`,
  *     `hll_est(sketch)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushNanosEquivFilter)
    // rewrite naive bounded time-range joins (would plan as BNLJ) into
    // banded equi-joins — see plans/BandTimeRangeJoin.scala
    e.injectOptimizerRule(_ => BandTimeRangeJoin)
    // whole-operator extension: per-key top-k via bounded heaps
    // (logical node + physical operator — see plans/TopKPerKey.scala)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // whole-operator extension: in-partition prefix sum over
    // InternalRows (round-20 — replaces globalCumSum's external-Row
    // mapPartitions; see plans/PartitionPrefixSum.scala)
    e.injectPlannerStrategy(_ => PartitionPrefixSumStrategy)
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("point_in_polygon"),
      new ExpressionInfo(classOf[PointInPolygon].getName,
        "point_in_polygon"),
      (exprs: Seq[Expression]) =>
        PointInPolygon(exprs(0), exprs(1), exprs(2), exprs(3))))
    // aggregate: the analyzer wraps a bare AggregateFunction in its
    // AggregateExpression during resolution
    e.injectFunction((
      new FunctionIdentifier("minhash_union"),
      new ExpressionInfo(classOf[MinHashUnionAgg].getName,
        "minhash_union"),
      (exprs: Seq[Expression]) => MinHashUnionAgg(exprs(0))))
    // the sketch/encoding kernels, for SQL-only users:
    //   minhash_sig(tokens, n, k), simhash_sig(tokens),
    //   token_set_encode(tokens)
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        def lit(i: Int): Int = exprs(i) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig argument ${i + 1} must be an integer literal, " +
              s"got $other")
        }
        MinHashSig(exprs.head, lit(1), lit(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_sig64"),
      new ExpressionInfo(classOf[SimHashSig64].getName, "simhash_sig64"),
      (exprs: Seq[Expression]) => SimHashSig64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("token_set_encode"),
      new ExpressionInfo(classOf[TokenSetEncode].getName,
        "token_set_encode"),
      (exprs: Seq[Expression]) => TokenSetEncode(exprs.head)))
    // vocab_encode(text, array('a','ab',…)): greedy longest-match
    // subword encode; the vocab must fold to an array<string> constant
    // (it is a dimension of the expression, not a per-row column)
    e.injectFunction((
      new FunctionIdentifier("vocab_encode"),
      new ExpressionInfo(classOf[VocabEncode].getName, "vocab_encode"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case v if v.foldable &&
            v.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
          val arr = v.eval()
            .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          val vocab = (0 until arr.numElements())
            .map(i => arr.getUTF8String(i).toString)
          VocabEncode(exprs.head, vocab)
        case other => throw new IllegalArgumentException(
          "vocab_encode argument 2 must be a foldable array<string> " +
            s"literal, got $other")
      }))
    // the Bloom pair: bloom_agg(hash64, numBits, numHashes) builds
    // filter bytes; bloom_might_contain(filterBytes, hash64) probes
    // them (first argument must fold to a BINARY constant — the filter
    // is a driver-side value, never a per-row column)
    e.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (exprs: Seq[Expression]) => {
        def intLit(i: Int): Int = exprs(i) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bloom_agg argument ${i + 1} must be an integer literal, " +
              s"got $other")
        }
        BloomFilterAgg(exprs.head, intLit(1), intLit(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => exprs.head match {
        case f if f.foldable && f.dataType == BinaryType =>
          // builder runs on the driver mid-analysis: fold the bytes,
          // broadcast them, hand the expression only the handle
          val bytes = f.eval().asInstanceOf[Array[Byte]]
          val (m, k, _) = BloomKernel.deserialize(bytes)
          BloomMightContain(BloomMightContain.broadcastBloom(bytes), m, k,
            exprs(1))
        case other => throw new IllegalArgumentException(
          "bloom_might_contain first argument must be a foldable BINARY " +
            s"Bloom filter (from bloom_agg), got $other")
      }))
    // the Count-Min pair (frequency sibling of the Bloom pair):
    // cms_agg(hash64, depth, width) builds sketch bytes;
    // cms_estimate(sketchBytes, hash64) reads them (first argument
    // must fold to a BINARY constant, same contract as the Bloom probe)
    e.injectFunction((
      new FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_agg"),
      (exprs: Seq[Expression]) => {
        def intLit(i: Int): Int = exprs(i) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"cms_agg argument ${i + 1} must be an integer literal, " +
              s"got $other")
        }
        CountMinAgg(exprs.head, intLit(1), intLit(2))
      }))
    e.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[Expression]) => exprs.head match {
        case f if f.foldable && f.dataType == BinaryType =>
          val bytes = f.eval().asInstanceOf[Array[Byte]]
          val (d, w, _) = CmsKernel.deserialize(bytes)
          CmsEstimate(CmsEstimate.broadcastCms(bytes), d, w, exprs(1))
        case other => throw new IllegalArgumentException(
          "cms_estimate first argument must be a foldable BINARY " +
            s"Count-Min sketch (from cms_agg), got $other")
      }))
    // hll_agg(value): md5-deterministic HyperLogLog distinct count —
    // the cardinality sibling of the Bloom/CMS pair (oracle-replayable,
    // unlike approx_count_distinct's internal xxhash sketch)
    e.injectFunction((
      new FunctionIdentifier("hll_agg"),
      new ExpressionInfo(classOf[HllAgg].getName, "hll_agg"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"hll_agg takes exactly 1 argument (the value to count " +
            s"distinct), got ${exprs.length}")
        HllAgg(exprs.head)
      }))
    // the sketch-VALUED HLL trio (the HyperBall surface, round-19 —
    // family discipline: every kernel with a Column API gets a SQL
    // twin): hll_singleton(value) → 256-byte sketch of one value,
    // hll_union(sketch) → register-max merge aggregate,
    // hll_est(sketch) → the cardinality read-out
    e.injectFunction((
      new FunctionIdentifier("hll_singleton"),
      new ExpressionInfo(classOf[HllSingleton].getName, "hll_singleton"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"hll_singleton takes exactly 1 argument, got ${exprs.length}")
        HllSingleton(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("hll_union"),
      new ExpressionInfo(classOf[HllUnionAgg].getName, "hll_union"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"hll_union takes exactly 1 argument (the sketch column), " +
            s"got ${exprs.length}")
        HllUnionAgg(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("hll_est"),
      new ExpressionInfo(classOf[HllEst].getName, "hll_est"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"hll_est takes exactly 1 argument (the sketch column), " +
            s"got ${exprs.length}")
        HllEst(exprs.head)
      }))
    // pii_redact(text): the privacy scrub as a SQL function.  The
    // builder runs mid-analysis, so it must emit RESOLVED Catalyst
    // nodes — the RegExpReplace chain is built directly from the same
    // [[graft.ext.Pii.patterns]] the DataFrame API folds over (a
    // Column→Expression bridge here would smuggle in unresolved
    // function nodes the analyzer no longer visits).
    e.injectFunction((
      new FunctionIdentifier("pii_redact"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "pii_redact"),
      (exprs: Seq[Expression]) =>
        graft.ext.Pii.patterns.foldLeft(exprs.head) {
          case (acc, (_, re, tok)) =>
            RegExpReplace(acc, Literal(re), Literal(tok))
        }))
    // url_canonicalize(url): the Web canonicalization rules as a SQL
    // function — same resolved-node discipline as pii_redact; the
    // expression twin lives next to the Column chain in ext.Web and
    // PropertySpec pins the two bit-for-bit.
    e.injectFunction((
      new FunctionIdentifier("url_canonicalize"),
      new ExpressionInfo(classOf[GraftExtensions].getName,
        "url_canonicalize"),
      (exprs: Seq[Expression]) => graft.ext.Web.canonicalUrlExpr(exprs.head)))
  }
}

/** Filter-pushdown restoration for nano-timestamp columns.
  *
  * Parquet TIMESTAMP(NANOS) columns are read as raw longs and
  * normalized with `timestamp_micros(ts DIV 1000)`
  * ([[graft.Tables]]).  A range predicate on the normalized column
  * can't reach the parquet reader — the scan would be full at any
  * scale.  Since micros(ts) = floor(ns/1000) is monotone, every
  * comparison against a literal has an exact raw-long equivalent:
  *
  *   floor(ns/1000) ≥ M  ⟺  ns ≥ M·1000
  *   floor(ns/1000) > M  ⟺  ns ≥ (M+1)·1000
  *   floor(ns/1000) ≤ M  ⟺  ns ≤ M·1000 + 999
  *   floor(ns/1000) < M  ⟺  ns < M·1000
  *
  * The rule ADDS the raw conjunct (keeping the original predicate, so
  * correctness never depends on the rewrite) and the data source then
  * pushes it into the scan: row groups outside the range are skipped
  * via parquet min/max stats.
  */
object PushNanosEquivFilter extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(attr DIV 1000) over a long attr. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(a: Attribute, Literal(d, _), _))
          if a.dataType == LongType && d == 1000L => Some(a)
      case _ => None
    }
  }

  private def nanosLit(micros: Long, plus: Long): Option[Literal] = {
    val ns = try Math.addExact(Math.multiplyExact(micros, 1000L), plus)
    catch { case _: ArithmeticException => return None }
    Some(Literal(ns, LongType))
  }

  private def equivalent(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(MicrosOfNanos(a), Literal(m: Long, TimestampType)) =>
      nanosLit(m, 0).map(GreaterThanOrEqual(a, _))
    case GreaterThan(MicrosOfNanos(a), Literal(m: Long, TimestampType)) =>
      nanosLit(m + 1, 0).map(GreaterThanOrEqual(a, _))
    case LessThanOrEqual(MicrosOfNanos(a), Literal(m: Long, TimestampType)) =>
      nanosLit(m, 999).map(LessThanOrEqual(a, _))
    case LessThan(MicrosOfNanos(a), Literal(m: Long, TimestampType)) =>
      nanosLit(m, 0).map(LessThan(a, _))
    case EqualTo(MicrosOfNanos(a), Literal(m: Long, TimestampType)) =>
      for (lo <- nanosLit(m, 0); hi <- nanosLit(m, 999))
        yield And(GreaterThanOrEqual(a, lo), LessThanOrEqual(a, hi))
    // literal-on-the-left orientations
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), r) =>
      equivalent(LessThanOrEqual(r, l))
    case GreaterThan(l @ Literal(_, TimestampType), r) =>
      equivalent(LessThan(r, l))
    case LessThanOrEqual(l @ Literal(_, TimestampType), r) =>
      equivalent(GreaterThanOrEqual(r, l))
    case LessThan(l @ Literal(_, TimestampType), r) =>
      equivalent(GreaterThan(r, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(equivalent)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
