package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Ray-casting point-in-polygon test: `(px, py)` against a polygon given
  * as parallel vertex arrays `xs`/`ys` (closed implicitly; vertices in
  * ring order, convex or concave, no self-intersection).
  *
  * Crossing rule per edge (current vertex i, previous vertex j):
  * `((y_i > py) != (y_j > py)) && px < (x_j - x_i)·(py - y_i)/(y_j - y_i) + x_i`
  * — odd crossing count = inside.  The operand ORDER is part of the
  * contract: the SQL oracle replays the identical float expression, so
  * results are bit-identical across engines.  Horizontal edges
  * (`y_i == y_j`) are skipped by the first conjunct before the division
  * (codegen `&&` short-circuits); polygon dims should still avoid them
  * so non-short-circuiting engines replay safely.
  *
  * The geo-tz operator (`senstate.js:67` uses a polygon-lookup library)
  * builds on this: broadcast zone-polygon dim, grid-cell equi-join,
  * exact test per candidate — see [[graft.functions.GeoTz]].
  */
case class PointInPolygon(px: Expression, py: Expression,
                          xs: Expression, ys: Expression)
    extends QuaternaryExpression {

  override def first: Expression = px
  override def second: Expression = py
  override def third: Expression = xs
  override def fourth: Expression = ys

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (px.dataType, py.dataType) == (DoubleType, DoubleType) &&
      Seq(xs.dataType, ys.dataType).forall {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"point_in_polygon expects (double, double, array<double>, " +
        s"array<double>), got (${px.dataType.catalogString}, " +
        s"${py.dataType.catalogString}, ${xs.dataType.catalogString}, " +
        s"${ys.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val pxv = a.asInstanceOf[Double]; val pyv = b.asInstanceOf[Double]
    val xsv = c.asInstanceOf[ArrayData]; val ysv = d.asInstanceOf[ArrayData]
    val n = xsv.numElements()
    var in = false
    var i = 0; var j = n - 1
    while (i < n) {
      val xi = xsv.getDouble(i); val yi = ysv.getDouble(i)
      val xj = xsv.getDouble(j); val yj = ysv.getDouble(j)
      if (((yi > pyv) != (yj > pyv)) &&
        pxv < (xj - xi) * (pyv - yi) / (yj - yi) + xi) in = !in
      j = i; i += 1
    }
    in
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pxv, pyv, xsv, ysv) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      s"""
         |int $n = $xsv.numElements();
         |${ev.value} = false;
         |int $j = $n - 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $xsv.getDouble($i); double $yi = $ysv.getDouble($i);
         |  double $xj = $xsv.getDouble($j); double $yj = $ysv.getDouble($j);
         |  if ((($yi > $pyv) != ($yj > $pyv)) &&
         |      $pxv < ($xj - $xi) * ($pyv - $yi) / ($yj - $yi) + $xi) {
         |    ${ev.value} = !${ev.value};
         |  }
         |  $j = $i;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PointInPolygon =
    copy(px = newFirst, py = newSecond, xs = newThird, ys = newFourth)
}

object PointInPolygon {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def pointInPolygon(px: Column, py: Column, xs: Column, ys: Column): Column =
    ColumnBridge.column(PointInPolygon(
      ColumnBridge.expression(px), ColumnBridge.expression(py),
      ColumnBridge.expression(xs), ColumnBridge.expression(ys)))
}
