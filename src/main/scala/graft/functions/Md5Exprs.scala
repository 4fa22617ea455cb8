package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-derived hashing kernels.
  *
  * The engine's oracle-checkable hash is "first 15 hex chars of md5, parsed
  * base-16" ([[graft.util.Cols.md5Long]]) — i.e. the top 60 bits of the
  * digest. Expressed over Column primitives that is one
  * `conv(substring(md5(x),1,15),16,10)` chain per value; fine for one hash
  * per row, but MinHash signatures and min-shingle fingerprints evaluate it
  * per ELEMENT inside `transform(...)` lambdas, which run interpreted and
  * allocate a UTF8String per intermediate. These expressions compute the
  * identical values in a single tight loop per row (MessageDigest reused via
  * a ThreadLocal), keeping the scan inside whole-stage codegen.
  */
object Md5Exprs {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) — equal to parsing the first 15 hex chars of
    * the digest as an unsigned base-16 integer.
    */
  def md5Top60(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Min over character-k-shingles of [[md5Top60]]; shingle positions are
    * 1..max(len-k+1, 1), matching
    * `array_min(transform(sequence(1, greatest(length(s)-k+1, 1)), i ->
    * md5Long(substr(s, i, k))))` bit-for-bit (including the degenerate
    * shorter-than-k tail shingle when len < k).
    */
  def minShingle(s: UTF8String, k: Int): Long = {
    val n = s.numChars()
    val count = math.max(n - k + 1, 1)
    var best = Long.MaxValue
    var i = 0
    while (i < count) {
      val h = md5Top60(s.substring(i, i + k).getBytes)
      if (h < best) best = h
      i += 1
    }
    best
  }

  /** The numHashes-wide MinHash signature of a string array: element j is
    * `min over s of md5Top60(s || "#j")` — identical to
    * `array_min(transform(sh, s -> md5Long(concat(s, '#j'))))` per salt.
    * Empty input yields all-null elements (array_min of empty is null).
    */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val salts = Array.tabulate(numHashes)(j => ("#" + j).getBytes("UTF-8"))
    val m = md.get()
    var i = 0
    while (i < n) {
      val sb = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < numHashes) {
        m.reset()
        m.update(sb)
        m.update(salts(j))
        val d = m.digest()
        val h =
          (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
            ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `min_shingle_md5(text, k)`: rolling min-shingle fingerprint (1-perm
  * MinHash over character k-grams), one codegen call per row.
  */
case class MinShingleMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"min_shingle_md5 requires a string argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any =
    Md5Exprs.minShingle(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.Md5Exprs.minShingle($c, $k);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_top60(bin)`: top 60 bits of md5 of a binary value — the native
  * form of `cast(conv(substring(md5(x),1,15),16,10) as bigint)`
  * ([[graft.util.Cols.md5Long]] / the [[graft.plans.Md5Top60Rewrite]]
  * optimizer rule's target). One digest, no hex-string materialization.
  */
case class Md5Top60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"md5_top60 requires a binary argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    Md5Exprs.md5Top60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.Md5Exprs.md5Top60($c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcKernel {

  /** Content-defined chunk END positions (1-based, ascending): every
    * position `i ∈ [w, n]` whose trailing w-char window hashes to
    * `md5Top60 % modulo == 0`, plus the document end `n` — so chunks are
    * `[prev_end+1, end]` and every document is fully covered. Matches
    * `list_append(list_filter(generate_series(w, n), i -> md5(substr(text,
    * i-w+1, w)) % modulo = 0), n)` (deduped, sorted) bit-for-bit.
    *
    * One tight loop per row with a reused MessageDigest — the composed
    * `transform(sequence(...))` form runs interpreted per position (the
    * 45-s-at-sf0.1 lesson behind [[MinShingleMd5]]).
    */
  def cdcEnds(s: UTF8String, w: Int, modulo: Int): ArrayData = {
    val n = s.numChars()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = w
    while (i <= n) {
      if (Md5Exprs.md5Top60(s.substring(i - w, i).getBytes) % modulo == 0L) {
        out += i
      }
      i += 1
    }
    if (out.isEmpty || out.last != n) out += n
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_ends(text, w, modulo)`: content-defined chunk boundaries (the
  * LBFS/Rabin-style shift-robust chunking primitive) in one codegen call
  * per row.
  */
case class CdcEnds(child: Expression, w: Int, modulo: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cdc_ends requires a string argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any =
    CdcKernel.cdcEnds(input.asInstanceOf[UTF8String], w, modulo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.CdcKernel.cdcEnds($c, $w, $modulo);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashKernel {
  /** 60-bit term-frequency SimHash over a token array: md5Top60 per token
    * occurrence, signed per-bit tally, sign → bit. Bit-identical to the
    * explode-(doc,bit)-tally formulation (exact integer math), without the
    * 60× row amplification and its two shuffles.
    */
  def simhash60(arr: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = Md5Exprs.md5Top60(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash60(tokens)`: the whole per-document SimHash in one codegen call. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"simhash60 requires an array<string> argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.SimHashKernel.simhash60($c);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(shingles, n)`: the full n-hash MinHash signature in one
  * pass over the shingle array (vs n interpreted `transform` passes).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires an array<string> argument, got ${other.catalogString}"
        )
    }

  override def nullSafeEval(input: Any): Any =
    Md5Exprs.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.Md5Exprs.minhashSig($c, $numHashes);"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
