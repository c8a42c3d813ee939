package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw href → fetchable absolute URL as ONE codegen kernel call — the
  * RFC 3986 §5 resolution subset documented on
  * [[graft.ext.Web.extractLinks]] (trim → XML-unescape → fragment
  * strop → absolute/scheme-relative/root-relative/directory-relative
  * join against the base → bounded dot-segment normalization →
  * NULL for empty/non-fetchable schemes).
  *
  * The column-algebra form of this resolution (nested `regexp_*` over
  * the extraction's exploded rows) is semantically identical but
  * CODEGEN-HOSTILE: fused into the link extractors' projection it
  * blew the JVM's 64 KB method limit, so the hot extraction stage of
  * st21/st25/x127 — three of the suite's five most expensive
  * queries — silently ran INTERPRETED (ERROR CodeGenerator + fallback
  * on every execution).  As a kernel the generated projection is one
  * static call over precompiled patterns, the stage stays inside
  * whole-stage codegen, and each pattern compiles once per JVM
  * instead of per codegen attempt.  Bit-equality with the algebra
  * form is pinned by WebSpec over the documented resolution lattice
  * (the [[MinHashSig]]/[[TokenSetEncode]] kernel discipline).
  *
  * Returns NULL for empty hrefs and javascript:/mailto:/tel:/data:
  * schemes — the extractors' drop contract. */
case class ResolveHref(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"ResolveHref expects (string href, string base), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(h: Any, b: Any): Any =
    ResolveHref.resolve(h.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) => {
      val kernel = ResolveHref.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $kernel.resolve($h, $b);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResolveHref =
    copy(left = newLeft, right = newRight)
}

object ResolveHref {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  // The EXACT patterns of the algebra form, compiled once per JVM.
  // java.util.regex semantics match Spark's regexp_* (same engine, no
  // flags), so find/group/replaceAll below reproduce
  // regexp_extract ("" on no match) and regexp_replace (replace-all).
  private val pFrag = Pattern.compile("#.*$")
  private val pScheme = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*):")
  private val pHost = Pattern.compile("^[^:/?#]+://([^/?#]*)")
  private val pBasePath =
    Pattern.compile("^[^:/?#]+://[^/?#]*([^?#]*)")
  private val pLastSlash = Pattern.compile("^(.*/)")
  private val pAbs = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")
  private val pHead =
    Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
  private val pAuthority =
    Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*")
  private val pDot = Pattern.compile("/\\.(?=/|$)")
  private val pUp = Pattern.compile("/[^/]+/\\.\\.(?=/|$)")
  private val pDropped =
    Pattern.compile("^(javascript|mailto|tel|data):")

  private def group1(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g }
    else ""
  }

  /** The resolution kernel — bit-identical to the retired
    * column-algebra form (WebSpec pins it on the resolution lattice).
    * Null result = dropped href. */
  def resolve(hrefU: UTF8String, baseU: UTF8String): UTF8String = {
    // functions.trim trims ASCII spaces only — UTF8String.trim matches
    val href = hrefU.trim().toString
    val base = baseU.toString
    val unescaped = href
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
    val noFrag = pFrag.matcher(unescaped).replaceAll("")
    if (noFrag.isEmpty ||
        pDropped.matcher(noFrag.toLowerCase(java.util.Locale.ROOT))
          .find())
      return null
    val joined =
      if (pAbs.matcher(noFrag).find()) noFrag
      else {
        val scheme = group1(pScheme, base)
        val hostPart = group1(pHost, base)
        if (noFrag.startsWith("//")) scheme + ":" + noFrag
        else if (noFrag.startsWith("/"))
          scheme + "://" + hostPart + noFrag
        else {
          val basePath = group1(pBasePath, base)
          val lastSlash = group1(pLastSlash, basePath)
          val baseDir = if (lastSlash.isEmpty) "/" else lastSlash
          scheme + "://" + hostPart + baseDir + noFrag
        }
      }
    val head = group1(pHead, joined)
    val tail = pAuthority.matcher(joined).replaceAll("")
    var path = pDot.matcher(tail).replaceAll("")
    var i = 0
    while (i < 4) { path = pUp.matcher(path).replaceAll(""); i += 1 }
    UTF8String.fromString(head + path)
  }

  /** Column-API entry point (Spark 4 Column↔Expression bridge). */
  def resolveHref(href: Column, base: Column): Column =
    ColumnBridge.column(ResolveHref(
      ColumnBridge.expression(href), ColumnBridge.expression(base)))
}
