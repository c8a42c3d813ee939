package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A collected k-means/IVF codebook: cell ids, centroid vectors, and
  * their precomputed L2 norms, sorted by cell id (ascending) so the
  * kernel's first-wins argmax tie-break IS the lowest-cell rule.  K×dim
  * doubles — rides the expression as one task-serialized reference
  * object (never k·dim plan literals: the x95 width lesson). */
case class Codebook(cells: Array[Long], vecs: Array[Array[Double]],
                    norms: Array[Double]) {
  require(cells.length == vecs.length && cells.length == norms.length &&
    cells.nonEmpty, "codebook arrays must align and be non-empty")
  require((1 until cells.length).forall(i => cells(i - 1) < cells(i)),
    "codebook must be sorted by cell id (argmax tie-break contract)")
  require(vecs.forall(_.length == vecs(0).length),
    "codebook centroids must share one dimension")

  /** The codebook's (uniform) centroid dimension — the kernel rejects
    * input vectors of any other length, so a ragged corpus fails
    * loudly instead of producing silently truncated cosines. */
  val dim: Int = vecs(0).length

  // Case-class equality on raw arrays is reference equality, which
  // defeats Catalyst canonicalization / common-subexpression
  // elimination for two NearestCellExpr instances built from the same
  // centroids (e.g. assign + report over one codebook).  Structural
  // equality restores semanticEquals there.
  override def equals(other: Any): Boolean = other match {
    case o: Codebook =>
      java.util.Arrays.equals(cells, o.cells) &&
        java.util.Arrays.equals(norms, o.norms) &&
        vecs.length == o.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), o.vecs(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = java.util.Arrays.hashCode(cells)
    h = 31 * h + java.util.Arrays.hashCode(norms)
    vecs.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v))
    h
  }
}

object Codebook {

  /** Ascending-order L2 norm — the shared fold order of the kernel,
    * Catalyst's expanded sum, the HOF fold, and DuckDB's list_sum, so
    * norms are bit-identical everywhere. */
  def normOf(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  /** Build from (cell, vector) pairs — sorts by cell (the tie-break
    * contract) and computes norms. */
  def of(cents: Seq[(Long, Array[Double])]): Codebook = {
    val sorted = cents.sortBy(_._1)
    Codebook(sorted.map(_._1).toArray, sorted.map(_._2).toArray,
      sorted.map(c => normOf(c._2)).toArray)
  }

  /** Collect a (small, bounded-by-construction) centroid frame into a
    * codebook; None on an empty frame — the empty-corpus degenerate
    * every consumer must pass through as zero rows rather than a
    * throw. */
  def fromFrame(cent: org.apache.spark.sql.DataFrame, cellCol: String,
                vecCol: String): Option[Codebook] = {
    import org.apache.spark.sql.functions.col
    val rows = cent.select(col(cellCol), col(vecCol)).collect()
    if (rows.isEmpty) None
    else Some(of(rows.toSeq.map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray))))
  }
}

/** Nearest-centroid assignment as a native codegen expression:
  * array<double> → struct(cell: bigint, csim: double) — the cosine
  * argmax against a broadcast-sized codebook in ONE tight JVM loop per
  * row (the [[EnvelopeFpExpr]] static-kernel discipline).
  *
  * This replaces the crossJoin(broadcast(cent)) → per-candidate
  * projection → max_by aggregate formulation: same answer, but the
  * k-per-row candidate space never materializes, no
  * BroadcastNestedLoopJoin enters the plan, and — decisive at scale —
  * assignment becomes a MAP-ONLY pass, so a Lloyd's iteration's only
  * exchange is the k-row partial-sum aggregate (measured on the 100×
  * rehearsal corpus: the fat-row exchanges the join formulation forced
  * were 3 of its 4 dominant stages, ~17 s each).
  *
  * Bit-parity contract (pinned by ClusteringSpec): dot and norm
  * accumulate in ascending element order (the shared left-fold /
  * DuckDB list_sum order); csim = round-half-up to 6 decimals via
  * BigDecimal — exactly Spark's `round(x, 6)`; candidate comparison
  * uses SQL ordering semantics (`==` short-circuit, then
  * Double.compare: NaN greatest, NaN == NaN, ±0.0 equal) with ties
  * keeping the lowest cell.  Elements must be non-null (the prepared
  * corpus contract). */
case class NearestCellExpr(child: Expression, cb: Codebook)
    extends UnaryExpression {

  override def dataType: DataType = NearestCell.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"NearestCellExpr expects array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCellKernel.assign(v.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cb, classOf[Codebook].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NearestCellKernel.assign($c, $cbRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCellExpr = copy(child = newChild)
}

object NearestCell {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val outType: StructType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("csim", DoubleType, nullable = false)))

  /** Column-API entry point. */
  def nearestCell(vec: Column, cb: Codebook): Column =
    ColumnBridge.column(NearestCellExpr(ColumnBridge.expression(vec), cb))
}

/** The per-row JVM kernel behind [[NearestCellExpr]] — a plain static
  * method so generated code calls it directly. */
object NearestCellKernel {

  /** Spark's `round(x, 6)` on doubles: BigDecimal half-up (NaN/Inf
    * pass through — BigDecimal.valueOf would throw). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** SQL ordering for doubles (SQLOrderingUtil semantics): primitive
    * equality first (±0.0 equal), then Double.compare (NaN greatest,
    * NaN equal to itself). */
  private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  def assign(arr: ArrayData, cb: Codebook): InternalRow = {
    val n = arr.numElements()
    // Dimension check once per row: a ragged/wrong-dimension vector
    // must throw (like the expanded-sum ANSI formulation would), not
    // silently truncate the dot product against a full-length norm.
    if (n != cb.dim) throw new IllegalArgumentException(
      s"NearestCell: input vector has $n elements, codebook dim ${cb.dim}")
    var s = 0.0
    var i = 0
    while (i < n) { val x = arr.getDouble(i); s += x * x; i += 1 }
    val vn = math.sqrt(s)
    var bestCell = 0L
    var bestCsim = 0.0
    var first = true
    var j = 0
    while (j < cb.cells.length) {
      val cv = cb.vecs(j)
      var d = 0.0
      var t = 0
      while (t < n) { d += arr.getDouble(t) * cv(t); t += 1 }
      val csim = round6(d / (vn * cb.norms(j)))
      // ascending-cell iteration + strictly-greater replacement =
      // ties keep the lowest cell (the max_by(csim, -cell) rule)
      if (first || cmp(csim, bestCsim) > 0) {
        bestCell = cb.cells(j); bestCsim = csim; first = false
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCell, bestCsim))
  }
}
