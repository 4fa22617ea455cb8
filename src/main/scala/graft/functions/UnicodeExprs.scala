package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Unicode-normalization kernels, called from both the interpreted
  * `nullSafeEval` paths and the generated code (via the static forwarders
  * a top-level Scala object emits). One String materialization per call —
  * the normalization tables live in the JVM (`java.text.Normalizer`), so
  * the expressions stay inside whole-stage codegen with no per-row
  * allocation beyond the (unavoidable) normalized string itself.
  */
object UnicodeKernels {

  /** NFC canonical composition. Fast path: `Normalizer.isNormalized` is an
    * O(n) scan with no allocation — real-world corpora are overwhelmingly
    * already NFC, so the common case costs one check, not a rebuild.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Accent stripping: NFD decomposition, drop non-spacing marks (Unicode
    * category Mn — combining accents), NFC recompose. Matches DuckDB's
    * `strip_accents` (utf8proc) on the Latin/Greek/Cyrillic fixture the
    * oracle replays; base letters that are not decomposable (ß, æ) are
    * kept, as both engines do.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    var i = 0
    var hasMark = false
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK) hasMark = true
      i += 1
    }
    if (!hasMark) {
      // no marks anywhere: the input round-trips unchanged (NFC of NFD)
      nfc(s)
    } else {
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      )
    }
  }
}

/** `nfc_normalize(s)`: Unicode NFC canonical composition — the
  * text-normalization step every multilingual corpus pipeline runs before
  * hashing or tokenizing (byte-different decomposed/precomposed encodings
  * of the SAME text otherwise defeat exact dedup and split vocabulary
  * entries). DuckDB-replayable (`nfc_normalize`), codegen'd.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.UnicodeKernels.nfc($c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `strip_accents(s)`: drop combining accents (NFD → remove Mn → NFC) —
  * the folding step of accent-insensitive matching, fuzzy entity joins,
  * and transliteration-tolerant dedup keys. DuckDB-replayable
  * (`strip_accents`), codegen'd.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"strip_accents requires a string argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.UnicodeKernels.stripAccents($c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
