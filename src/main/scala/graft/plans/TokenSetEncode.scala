package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `sort_array(array_distinct(transform(toks, t => xxhash64(t))))` as
  * ONE codegen'd kernel call — the token-set encoding every pairwise
  * dedup verification consumes ([[graft.ext.Dedup]]).
  *
  * The composed form evaluates its `transform` lambda interpreted
  * (per-element closure dispatch outside whole-stage codegen) and
  * allocates three intermediate arrays per document; the kernel hashes,
  * dedups, and sorts in a single primitive-array pass.  Hash values are
  * BIT-IDENTICAL to `xxhash64(token)` (same XXH64, same seed 42), so
  * encodings from either path interoperate — pinned by DedupSpec's
  * equivalence test and the x3/x4 oracles. */
case class TokenSetEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TokenSetEncode expects array<string> tokens, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TokenSetEncodeKernel.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TokenSetEncodeKernel.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenSetEncode =
    copy(child = newChild)
}

object TokenSetEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def tokenSetEncode(toks: Column): Column =
    ColumnBridge.column(TokenSetEncode(ColumnBridge.expression(toks)))
}

/** Static per-row kernel behind [[TokenSetEncode]]. */
object TokenSetEncodeKernel {

  private final val Seed = 42L // xxhash64's default seed

  /** hash → sort → dedup in place; null elements contribute nothing
    * (split() never produces them — defensive parity with the composed
    * form, where xxhash64(null) = null and array_distinct keeps one
    * null that sort_array orders first — callers never feed nulls). */
  def encode(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val hashes = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        hashes(m) = XXH64.hashUnsafeBytes(
          t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hashes, 0, m)
    var w = 0
    i = 0
    while (i < m) {
      if (i == 0 || hashes(i) != hashes(i - 1)) {
        hashes(w) = hashes(i)
        w += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}
