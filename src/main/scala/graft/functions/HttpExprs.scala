package graft.functions

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real HTTP/1.1 payload decoding for archived responses — what turns a
  * WARC `response` block from "bytes that happen to be UTF-8 on the
  * fixture" into the payload a browser would have seen. Real crawl
  * responses are routinely `Transfer-Encoding: chunked`,
  * `Content-Encoding: gzip`/`deflate`, and declared
  * `charset=iso-8859-1`/`windows-1252`; decoding them as UTF-8 feeds
  * mojibake or binary garbage into extraction. The reference's reader
  * assumed plain text (`/root/reference/src/index.js:48-55`); this is
  * the production-shaped generalization.
  *
  * Receiver order per RFC 9112/9110: de-chunk the transfer coding
  * first, then undo the content coding, then resolve the charset —
  * `Content-Type` header parameter, else a `<meta charset>` /
  * `http-equiv` sniff over the first 1024 decoded-entity bytes (the
  * WHATWG prescan), else the UTF-8 default.
  *
  * Permissive-contract discipline (the [[graft.sources.Warc]] malformed
  * rules): a body whose declared coding does not parse (bad chunk
  * framing, corrupt gzip) falls back to the undecoded bytes rather than
  * failing the task — an archive's job is to surface what was captured.
  */
object HttpCodec {

  private val Latin1 = StandardCharsets.ISO_8859_1

  private val CharsetParamRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?\\s*([A-Za-z0-9_:.+-]+)")
  private val MetaCharsetRe =
    java.util.regex.Pattern.compile("(?i)<meta[^>]*charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_:.+-]+)")

  /** First index of `\r\n\r\n`, or -1. */
  def headLen(block: Array[Byte]): Int = {
    var i = 0
    val n = block.length - 3
    while (i < n) {
      if (block(i) == '\r' && block(i + 1) == '\n' && block(i + 2) == '\r' && block(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Value of the (first) `name:` header line in `head`, or null. */
  def headerOf(head: String, name: String): String = {
    val p = java.util.regex.Pattern.compile(
      "(?im)^" + java.util.regex.Pattern.quote(name) + ":\\s*([^\r\n]*)"
    )
    val m = p.matcher(head)
    if (m.find()) m.group(1).trim else null
  }

  /** RFC 9112 §7.1 chunked decoding: hex size line (extensions after `;`
    * dropped), CRLF, data, CRLF, until the 0-size chunk; trailer headers
    * ignored. Malformed framing returns the input unchanged.
    */
  def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (true) {
      var j = i
      while (j + 1 < body.length && !(body(j) == '\r' && body(j + 1) == '\n')) j += 1
      if (j + 1 >= body.length) return body // no CRLF-terminated size line
      var line = new String(body, i, j - i, Latin1)
      val semi = line.indexOf(';')
      if (semi >= 0) line = line.substring(0, semi)
      val size =
        try java.lang.Long.parseLong(line.trim, 16)
        catch { case _: NumberFormatException => return body }
      if (size < 0 || size > Int.MaxValue) return body
      val dataStart = j + 2
      if (size == 0L) return out.toByteArray // trailers (if any) ignored
      if (dataStart + size + 2 > body.length) return body // truncated chunk
      out.write(body, dataStart, size.toInt)
      if (body(dataStart + size.toInt) != '\r' || body(dataStart + size.toInt + 1) != '\n')
        return body
      i = dataStart + size.toInt + 2
    }
    body // unreachable
  }

  /** gunzip, or the input unchanged when the member does not parse. */
  def tryGunzip(body: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body), 1 << 16)
      val out = new java.io.ByteArrayOutputStream(body.length * 4)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => body }

  /** RFC 9110 `deflate` is zlib-wrapped; some servers send raw deflate —
    * try zlib first, then raw, then give the input back.
    */
  def tryInflate(body: Array[Byte]): Array[Byte] = {
    def inflateWith(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(body)
        val out = new java.io.ByteArrayOutputStream(body.length * 4)
        val buf = new Array[Byte](1 << 16)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary()) throw new java.util.zip.DataFormatException()
        }
        out.toByteArray
      } finally inf.end()
    }
    try inflateWith(false)
    catch {
      case _: java.util.zip.DataFormatException =>
        try inflateWith(true)
        catch { case _: java.util.zip.DataFormatException => body }
    }
  }

  /** Resolved charset label: `Content-Type` param, else `<meta>` prescan
    * over the first 1024 body bytes, else `utf-8`. Unknown/unsupported
    * labels fall back to `utf-8` (the WHATWG behavior for garbage).
    */
  def charsetLabel(contentType: String, body: Array[Byte]): String = {
    def supported(label: String): String = {
      val l = label.toLowerCase
      try { Charset.forName(l); l }
      catch { case _: Exception => null }
    }
    if (contentType != null) {
      val m = CharsetParamRe.matcher(contentType)
      if (m.find()) {
        val l = supported(m.group(1))
        if (l != null) return l
      }
    }
    val pre = new String(body, 0, math.min(1024, body.length), Latin1)
    val m2 = MetaCharsetRe.matcher(pre)
    if (m2.find()) {
      val l = supported(m2.group(1))
      if (l != null) return l
    }
    "utf-8"
  }

  /** Deterministic gzip of a string's UTF-8 bytes (Java gzip writes a
    * zero MTIME, so output is a pure function of input) — the fixture
    * writer half of [[tryGunzip]].
    */
  def gzipUtf8(s: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(s.toString.getBytes(StandardCharsets.UTF_8))
    gz.close()
    out.toByteArray
  }

  /** Transparent gunzip: bytes pass through unless they carry the gzip
    * magic (then [[tryGunzip]] semantics — corrupt members fall back).
    */
  def gunzipIfGzip(b: Array[Byte]): Array[Byte] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) tryGunzip(b) else b

  /** Full decode: (text, charset, content_encoding, chunked). Blocks with
    * no HTTP head delimiter decode to ("", null, null, false) — the
    * non-HTTP record shapes (warcinfo etc.) that share the slice path.
    */
  def decode(block: Array[Byte]): InternalRow = {
    val hl = headLen(block)
    if (hl < 0)
      return new GenericInternalRow(Array[Any](UTF8String.EMPTY_UTF8, null, null, false))
    val head = new String(block, 0, hl, Latin1)
    val te = headerOf(head, "Transfer-Encoding")
    val ce = headerOf(head, "Content-Encoding")
    val ct = headerOf(head, "Content-Type")
    var body = java.util.Arrays.copyOfRange(block, hl + 4, block.length)
    val chunked = te != null && te.toLowerCase.contains("chunked")
    if (chunked) body = dechunk(body)
    val enc = if (ce == null) "" else ce.trim.toLowerCase
    enc match {
      case "gzip" | "x-gzip" => body = tryGunzip(body)
      case "deflate"         => body = tryInflate(body)
      case _                 => ()
    }
    val label = charsetLabel(ct, body)
    val text = new String(body, Charset.forName(label))
    new GenericInternalRow(
      Array[Any](
        UTF8String.fromString(text),
        UTF8String.fromString(label),
        UTF8String.fromString(enc),
        chunked
      )
    )
  }
}

/** `http_body(block)` — the decoded payload of an HTTP/1.1 message block
  * as `struct<text, charset, content_encoding, chunked>`, one native
  * kernel call inside whole-stage codegen (the charset depends on the
  * DECOMPRESSED bytes via the meta prescan, so text and diagnostics come
  * from a single pass — no double decode).
  */
case class HttpBody(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HttpBody.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"http_body requires a binary argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any =
    HttpCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.HttpCodec.decode((byte[]) $c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HttpBody {
  val schema: StructType = StructType(
    Seq(
      StructField("text", StringType),
      StructField("charset", StringType),
      StructField("content_encoding", StringType),
      StructField("chunked", BooleanType)
    )
  )

  def httpBody(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.util.Cols.nativeCol(HttpBody(graft.util.Cols.nativeExpr(c)))
}

/** `gzip_utf8(s)` — deterministic gzip of a string's UTF-8 bytes; the
  * declarative fixture writer for gzipped sidecar documents (sitemap
  * children etc.), dual of [[MaybeGunzip]].
  */
case class GzipUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"gzip_utf8 requires a string argument, got ${child.dataType.catalogString}"
      )
  override def nullSafeEval(input: Any): Any =
    HttpCodec.gzipUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.HttpCodec.gzipUtf8($c);"
    )
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipUtf8 {
  def gzipUtf8(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.util.Cols.nativeCol(GzipUtf8(graft.util.Cols.nativeExpr(c)))
}

/** `maybe_gunzip(b)` — transparent gunzip: bytes pass through unless
  * gzip-magic-prefixed (corrupt members fall back to the input, the
  * permissive contract). The read half of gzipped sidecar documents.
  */
case class MaybeGunzip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"maybe_gunzip requires a binary argument, got ${child.dataType.catalogString}"
      )
  override def nullSafeEval(input: Any): Any =
    HttpCodec.gunzipIfGzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.HttpCodec.gunzipIfGzip((byte[]) $c);"
    )
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaybeGunzip {
  def maybeGunzip(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.util.Cols.nativeCol(MaybeGunzip(graft.util.Cols.nativeExpr(c)))
}
