package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Windowed energy-envelope fingerprint over a numeric-array column as
  * a native codegen expression — the fast form of
  * [[graft.ext.WavAudioCodec.envelopeFp]].
  *
  * The declarative `transform`/`filter`/`aggregate` composition has the
  * right SHAPE (zero shuffle, zero explode) but Spark's higher-order
  * functions are CodegenFallback: every lambda step is an interpreted
  * expression tree, and the W·n lambda evaluations per row measured
  * ~8 ms/row at dim-64/W-9 — the round-13 rehearsal recorded the x99
  * scan at 16 s for 2 000 rows, linear but two orders slower than a
  * scan should be.  This expression computes the identical fingerprint
  * in one tight JVM loop per row inside whole-stage codegen
  * (scan → project stays one fused stage), the [[MinHashSig]]
  * discipline applied to the signal kernel.
  *
  * Bit-parity contract (pinned by AudioCodecSpec against both the HOF
  * form and a plain-Scala reference): window of element i =
  * floor(i·W/n); energy = mean of x² accumulated in ascending index
  * order (doubles, so the fold order matters and is preserved); bit w
  * set iff energy(w+1) > energy(w) with Spark's comparison semantics —
  * a null element poisons its window's energy to NULL (comparisons
  * yield no bit), an empty window (n < W) divides 0.0 by zero into NaN
  * (NaN compares greater than any non-NaN, equal to itself).
  */
case class EnvelopeFpExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 2 && w <= 64,
    s"EnvelopeFpExpr needs 2 <= W <= 64 windows, got $w")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"EnvelopeFpExpr expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    EnvelopeFpKernel.fp(v.asInstanceOf[ArrayData], w, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} =
            graft.plans.EnvelopeFpKernel.fp(${childGen.value}, $w, $isFloat);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(
      newChild: Expression): EnvelopeFpExpr = copy(child = newChild)
}

object EnvelopeFp {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def envelopeFp(emb: Column, w: Int): Column =
    ColumnBridge.column(EnvelopeFpExpr(ColumnBridge.expression(emb), w))
}

/** The per-row JVM kernel behind [[EnvelopeFpExpr]] — a plain static
  * method so generated code calls it directly. */
object EnvelopeFpKernel {

  /** Fingerprint of one array; see [[EnvelopeFpExpr]] for the exact
    * semantics this must preserve against the HOF form. */
  def fp(arr: ArrayData, w: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    val sums = new Array[Double](w)
    val counts = new Array[Int](w)
    val poisoned = new Array[Boolean](w)
    var i = 0
    while (i < n) {
      val win = ((i.toLong * w) / n).toInt
      if (arr.isNullAt(i)) poisoned(win) = true
      else if (!poisoned(win)) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        sums(win) += v * v
        counts(win) += 1
      }
      i += 1
    }
    // Spark semantics for the odd corners: a null element makes the
    // HOF fold NULL from that point (here: the whole window's energy,
    // since + is total over the fold); an empty window divides into
    // NaN, and Spark orders NaN above every non-NaN value.
    def energyValid(k: Int): Boolean = !poisoned(k)
    def energy(k: Int): Double =
      if (counts(k) == 0) Double.NaN else sums(k) / counts(k)
    def gt(a: Double, b: Double): Boolean =
      if (a.isNaN) !b.isNaN else if (b.isNaN) false else a > b
    var fp = 0L
    var b = 0
    while (b < w - 1) {
      if (energyValid(b) && energyValid(b + 1) &&
        gt(energy(b + 1), energy(b))) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
