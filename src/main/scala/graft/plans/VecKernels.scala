package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense-vector scalar kernels — the [[NearestCellExpr]] static-kernel
  * discipline applied to the similarity family's inner loops.  The
  * declarative twins they replace were EXPRESSION-TREE BOMBS: a
  * 64-term expanded dot is 64 `element_at × +` nodes per use, and the
  * 16×64 random-projection is 1024 nodes — per-plan ANALYSIS and
  * codegen of those trees measured 2-3 s of DRIVER time per x40 run
  * (the stages themselves were milliseconds).  Each kernel is one
  * expression node calling one tight JVM loop.
  *
  * Bit-parity contract (pinned by SimilaritySpec/PropertySpec and the
  * DuckDB oracle): every accumulation runs in ascending element order,
  * the exact left-fold order of the expanded `reduce(_ + _)` trees and
  * the `aggregate(transform(v, x*x))` HOF they replace — results are
  * IEEE-identical, so every declared query replays unchanged.
  * Elements must be non-null (the prepared-vector contract shared with
  * [[NearestCellExpr]]); a too-short vector throws, like the expanded
  * form's ANSI `element_at` would.
  */
case class VecDotExpr(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"VecDotExpr expects two array<double>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VecKernels.dot($a, $b, $dim);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Sum of squares over the WHOLE array (runtime length) — the norm
  * kernel; callers wrap in `sqrt`. */
case class VecSumSqExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"VecSumSqExpr expects array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    VecKernels.sumSq(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.VecKernels.sumSq($v);")

  override protected def withNewChildInternal(
      newChild: Expression): VecSumSqExpr = copy(child = newChild)
}

/** A sign matrix with STRUCTURAL equality (the Codebook lesson: raw
  * arrays in a case class compare by reference, which defeats Catalyst
  * canonicalization / CSE for two projections built from the same
  * seed). */
case class SignMatrix(rows: Array[Array[Double]]) {
  require(rows.nonEmpty && rows.forall(_.length == rows(0).length),
    "sign matrix must be rectangular and non-empty")
  val rDim: Int = rows.length
  val dim: Int = rows(0).length

  override def equals(other: Any): Boolean = other match {
    case o: SignMatrix => rows.length == o.rows.length &&
      rows.indices.forall(i => java.util.Arrays.equals(rows(i), o.rows(i)))
    case _ => false
  }
  override def hashCode(): Int =
    rows.foldLeft(17)((h, r) => 31 * h + java.util.Arrays.hashCode(r))
}

/** Random projection: array<double>(dim) → array<double>(rDim), row r
  * = ascending-order dot of the input against `signs.rows(r)`. */
case class RpProjectExpr(child: Expression, signs: SignMatrix)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"RpProjectExpr expects array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    VecKernels.rpProject(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, classOf[SignMatrix].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.VecKernels.rpProject($v, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RpProjectExpr = copy(child = newChild)
}

object VecKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def vecDot(a: Column, b: Column, dim: Int): Column =
    ColumnBridge.column(VecDotExpr(ColumnBridge.expression(a),
      ColumnBridge.expression(b), dim))

  def vecSumSq(v: Column): Column =
    ColumnBridge.column(VecSumSqExpr(ColumnBridge.expression(v)))

  def rpProject(v: Column, signs: SignMatrix): Column =
    ColumnBridge.column(RpProjectExpr(ColumnBridge.expression(v), signs))

  /** Ascending-order dot over the first `dim` elements; throws on a
    * too-short vector (the expanded form's ANSI element_at contract —
    * silent truncation was the NearestCell advice bug). */
  def dot(a: ArrayData, b: ArrayData, dim: Int): Double = {
    if (a.numElements() < dim || b.numElements() < dim)
      throw new IllegalArgumentException(
        s"VecDot: need $dim elements, got ${a.numElements()} and " +
          s"${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < dim) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Ascending-order sum of squares over the whole array — the
    * left-fold of `aggregate(transform(v, x → x·x), 0.0, +)`. */
  def sumSq(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    s
  }

  def rpProject(v: ArrayData, signs: SignMatrix): ArrayData = {
    if (v.numElements() < signs.dim)
      throw new IllegalArgumentException(
        s"RpProject: need ${signs.dim} elements, got ${v.numElements()}")
    val out = new Array[Any](signs.rDim)
    var r = 0
    while (r < signs.rDim) {
      val row = signs.rows(r)
      var s = 0.0
      var i = 0
      while (i < signs.dim) { s += v.getDouble(i) * row(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }
}
