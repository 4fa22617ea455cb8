package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-call kernels for the URL family ([[graft.operators.Urls]]).
  *
  * The original `Column` formulations are correct but COMPOSE badly:
  * `normalizeUrl` references its argument ~20 times through derived
  * sub-columns and `resolveUrl` likewise, so the nested
  * `normalizeUrl(resolveUrl(base, href))` the outlink/frontier/redirect
  * queries build becomes a multiplicatively-duplicated Catalyst tree
  * (tens of thousands of nodes) whose ANALYSIS + CODEGEN dominate the
  * queries — a flat ~13 s of driver-side fixed overhead per frontier
  * plan, independent of data size. Each kernel here is ONE expression
  * node executing the SAME java.util.regex operations sequentially:
  * Spark's `regexp_extract`/`regexp_replace`/`rlike` run on
  * java.util.regex and `lower`/string sorting on UTF8String, so every
  * step below is the exact operation the Column version performed —
  * the DuckDB oracles that pinned the Column rules pin these kernels
  * unchanged. `UrlSpec` additionally cross-checks kernel vs Column
  * formulation on the fixture and the RFC 3986 §5.4 vectors.
  */
object UrlKernel {

  private val SchemeCap = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val SchemeStrip = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://")
  private val AuthorityCap = Pattern.compile("^([^/?#]*)")
  private val UserinfoCap = Pattern.compile("^([^@]*)@")
  private val UserinfoStrip = Pattern.compile("^[^@]*@")
  private val BracketHostCap = Pattern.compile("^(\\[[^\\]]*\\])")
  private val PlainHostCap = Pattern.compile("^([^:]*)")
  private val BracketPortCap = Pattern.compile("\\]:([0-9]+)$")
  private val PlainPortCap = Pattern.compile("^[^:]*:([0-9]+)$")
  private val AuthStrip = Pattern.compile("^[^/?#]*")
  private val FragStrip = Pattern.compile("#.*")
  private val PathCap = Pattern.compile("^([^?]*)")
  private val QueryCap = Pattern.compile("\\?(.*)")
  private val Tracking = Pattern.compile(graft.operators.Urls.TrackingParamRe)

  private val BaseSchemeCap = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*):")
  private val OriginCap = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
  private val OriginStrip = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*")
  private val PathQCap = Pattern.compile("^([^?#]*)")
  private val PathQStrip = Pattern.compile("^[^?#]*")
  private val LastSegStrip = Pattern.compile("[^/]*$")
  private val RefAuthStrip = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*")
  private val RefAbsOriginCap = Pattern.compile("^(([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*)")
  private val AbsRef = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://")
  private val SchemedRef = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*:")
  private val DirTail = Pattern.compile("/(\\.{1,2})?$")
  private val AccPop = Pattern.compile("/[^/]*$")

  /** `regexp_extract(s, p, 1)` semantics: first find, group 1, "" when
    * no match (or a non-participating group).
    */
  private def ex(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g }
    else ""
  }

  private def strip(p: Pattern, s: String): String = p.matcher(s).replaceAll("")

  /** Spark `lower`: UTF8String's locale-independent lowercase. */
  private def low(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  def normalize(u: UTF8String): UTF8String =
    UTF8String.fromString(normalize(u.toString))

  def normalize(u: String): String = {
    val scheme = low(ex(SchemeCap, u))
    val afterScheme = strip(SchemeStrip, u)
    val authority = ex(AuthorityCap, afterScheme)
    val userinfo = ex(UserinfoCap, authority)
    val userPrefix = if (userinfo.isEmpty) "" else userinfo + "@"
    val hostport = strip(UserinfoStrip, authority)
    val host = low(
      if (hostport.startsWith("[")) ex(BracketHostCap, hostport)
      else ex(PlainHostCap, hostport)
    )
    val port =
      if (hostport.startsWith("[")) ex(BracketPortCap, hostport)
      else ex(PlainPortCap, hostport)
    val keepPort =
      if (port.isEmpty) ""
      else if (scheme == "https" && port == "443") ""
      else if (scheme == "http" && port == "80") ""
      else ":" + port
    val prefrag = strip(FragStrip, strip(AuthStrip, afterScheme))
    val path0 = ex(PathCap, prefrag)
    val path = if (path0.isEmpty) "/" else path0
    val query = ex(QueryCap, prefrag)
    // split keeps trailing empties (Spark split limit = -1); the filter
    // drops them with the tracking params; sort is UTF8String-binary,
    // Spark's string ordering
    val kept = query
      .split("&", -1)
      .filter(p => p.nonEmpty && !Tracking.matcher(p).find())
      .sortWith((a, b) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    val qNorm = if (kept.nonEmpty) "?" + kept.mkString("&") else ""
    scheme + "://" + userPrefix + host + keepPort + path + qNorm
  }

  def removeDotSegments(p: String): String = {
    var acc = ""
    p.split("/", -1).foreach { s =>
      if (s.nonEmpty) {
        if (s == ".") ()
        else if (s == "..") acc = strip(AccPop, acc)
        else acc = acc + "/" + s
      }
    }
    val trail = if (DirTail.matcher(p).find() && acc.nonEmpty) "/" else ""
    if (acc.isEmpty) "/" else acc + trail
  }

  def resolve(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(resolve(base.toString, ref.toString))

  /** Null semantics mirroring the `Column` spec ([[graft.operators.Urls
    * .resolveUrlCols]]) exactly: a null `ref` is null; a null `base`
    * yields the branches that never reference the base — an absolute
    * `scheme://` ref resolves ref-only, an opaque schemed ref
    * (`mailto:x`) passes through verbatim — and null for every
    * base-referencing branch (network-path, empty, fragment, query,
    * absolute-path, relative refs), because there `concat(null, …)` is
    * null in the Column formulation. Pinned by the UrlSpec null-base
    * grid so a nullable-base call site cannot silently diverge.
    */
  def resolveNullable(base: UTF8String, ref: UTF8String): UTF8String = {
    if (ref == null) null
    else if (base != null) resolve(base, ref)
    else {
      val r = ref.toString
      if (AbsRef.matcher(r).find()) UTF8String.fromString(resolve("", r))
      else if (SchemedRef.matcher(r).find()) ref
      else null
    }
  }

  def resolve(base: String, ref: String): String = {
    if (AbsRef.matcher(ref).find() || ref.startsWith("//")) {
      val refAfterAuth = strip(RefAuthStrip, ref)
      val refAbsOrigin = ex(RefAbsOriginCap, ref)
      val refAbsPath = ex(PathQCap, refAfterAuth)
      val refAbsTail = strip(PathQStrip, refAfterAuth)
      val absPathNorm = if (refAbsPath.isEmpty) "" else removeDotSegments(refAbsPath)
      if (ref.startsWith("//"))
        ex(BaseSchemeCap, base) + ":" + refAbsOrigin + absPathNorm + refAbsTail
      else refAbsOrigin + absPathNorm + refAbsTail
    } else if (SchemedRef.matcher(ref).find()) ref
    else if (ref.isEmpty) strip(FragStrip, base)
    else if (ref.startsWith("#")) strip(FragStrip, base) + ref
    else {
      val origin = ex(OriginCap, base)
      val basePath = ex(PathQCap, strip(OriginStrip, base))
      if (ref.startsWith("?")) origin + basePath + ref
      else {
        val refPath = ex(PathQCap, ref)
        val refTail = strip(PathQStrip, ref)
        if (ref.startsWith("/")) origin + removeDotSegments(refPath) + refTail
        else {
          val baseDir = strip(LastSegStrip, basePath)
          origin + removeDotSegments(baseDir + refPath) + refTail
        }
      }
    }
  }
}

/** [[graft.operators.Urls.normalizeUrl]] as one codegen'd kernel call. */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"url_normalize requires a string argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    UrlKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[graft.operators.Urls.resolveUrl]] as one codegen'd kernel call.
  * Null semantics are the Column formulation's, bit-for-bit — see
  * [[UrlKernel.resolveNullable]]: null ref → null; null base → ref-only
  * resolution for absolute/opaque-schemed refs, null otherwise. The
  * default `BinaryExpression` null-intolerance would have diverged on a
  * nullable base, so eval and codegen handle the base's null lane
  * explicitly.
  */
case class UrlResolve(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"url_resolve requires (string, string) arguments, got $other"
        )
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val r = right.eval(input)
    if (r == null) null
    else
      UrlKernel.resolveNullable(
        left.eval(input).asInstanceOf[UTF8String],
        r.asInstanceOf[UTF8String]
      )
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${rightGen.isNull}) {
        ${leftGen.code}
        ${ev.value} = graft.functions.UrlKernel.resolveNullable(
          ${leftGen.isNull} ? null : ${leftGen.value}, ${rightGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
