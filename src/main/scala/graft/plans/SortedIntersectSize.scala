package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED int/long arrays via merge-count.
  *
  * `array_intersect` builds a hash set per invocation — an allocation
  * per pair, which dominates verification cost in pairwise dedup where
  * millions of candidate pairs are scored.  Token sets hash-encoded to
  * sorted integer arrays admit an allocation-free two-pointer merge;
  * this expression implements it with full whole-stage-codegen support
  * (the generated code is a single while loop, no boxing).  Both inputs
  * must share one element type: `array<int>` or `array<long>` (the
  * latter carries xxhash64-derived token ids — see
  * [[graft.ext.Dedup]]).
  *
  * Example of the custom-Expression extension point (SURVEY §7.3) —
  * used by [[graft.ext.Dedup]]'s Jaccard verification.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SortedIntersectSize expects two array<int> or two array<bigint> " +
            s"inputs, got ${left.dataType.catalogString} / " +
            s"${right.dataType.catalogString}")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val na = a.numElements(); val nb = b.numElements()
    if (isLong) {
      while (i < na && j < nb) {
        val av = a.getLong(i); val bv = b.getLong(j)
        if (av == bv) { c += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val av = a.getInt(i); val bv = b.getInt(j)
        if (av == bv) { c += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (jt, get) = if (isLong) ("long", "getLong") else ("int", "getInt")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      s"""
         |int $i = 0, $j = 0;
         |${ev.value} = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  $jt $av = $a.$get($i);
         |  $jt $bv = $b.$get($j);
         |  if ($av == $bv) { ${ev.value}++; $i++; $j++; }
         |  else if ($av < $bv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
