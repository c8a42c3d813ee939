package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Whole-document 16-bit SimHash as a single narrow expression — the
  * [[MinHashSig]] treatment applied to the other sketch family
  * (`spark.graft.simhashImpl=kernel`, the default).
  *
  * Replaces the exploded plan (one row per token OCCURRENCE, 16
  * codegen'd CASE columns, partial+final sum aggregate and its
  * exchange) with one static-kernel call per document row: md5 per
  * token, ±1 nibble votes accumulated in a 16-int array, threshold to
  * the fingerprint — zero intermediate rows, zero shuffle.
  *
  * Bit-identical to the exploded strategy (equivalence test + x5/x5b
  * oracle replays): bit b votes +1 iff hex digit b of md5(token) is
  * >= '8' (the nibble's high bit), multiplicity COUNTS (unlike MinHash,
  * SimHash weights repeated tokens), and an empty token array yields
  * NULL (the exploded plan emits no row). */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SimHashSig expects array<string> tokens, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SimHashKernel.sig(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        int ${ev.value} = 0;
        if (!${ev.isNull}) {
          java.lang.Integer $boxed =
            graft.plans.SimHashKernel.sig(${childGen.value});
          if ($boxed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $boxed.intValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def simhashSig(toks: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(toks)))
}

/** Static per-row kernel behind [[SimHashSig]]. */
object SimHashKernel {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 16-bit fingerprint over the token MULTISET; null for an empty
    * array.  A null element votes −1 on every bit, matching the
    * exploded plan's `otherwise(-1)` on a null digest (split() never
    * produces one — defensive parity only). */
  def sig(toks: ArrayData): java.lang.Integer = {
    val len = toks.numElements()
    if (len == 0) return null
    val md = md5Local.get()
    val counts = new Array[Int](16)
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      if (t == null) {
        var b = 0
        while (b < 16) { counts(b) -= 1; b += 1 }
      } else {
        md.reset()
        val d = md.digest(t.getBytes)
        var b = 0
        while (b < 16) {
          val nibble =
            if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
          counts(b) += (if (nibble >= 8) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) out |= 1 << b
      b += 1
    }
    java.lang.Integer.valueOf(out)
  }
}
