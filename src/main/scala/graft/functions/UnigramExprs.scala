package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM (Kudo 2018) Viterbi segmentation as a NATIVE expression
  * — retiring the engine's last scalar UDF: the DP has no built-in
  * formulation, but a `udf {...}` is an interpreter boundary (Spark
  * serializes each input to a Scala value via a conversion projection and
  * breaks whole-stage codegen around the call). Here the piece table is a
  * REFERENCE OBJECT on the expression (the [[TopCellsByCosine]] recipe:
  * generated code calls a compiled JVM method through `addReferenceObj`,
  * so the stage stays inside whole-stage codegen with zero fallback —
  * [[graft.CodegenFallbackSpec]] pins it) and the word arrives as an
  * `UTF8String` from the row, no converter in between.
  */
object UnigramViterbi {

  /** Integer-exact Viterbi over one word: returns (n_pieces, score,
    * space-joined pieces) under (fewest pieces, max summed piece freq,
    * lex-min segmentation). Right-to-left DP; the lex tie-break is valid
    * because comparing space-joined segmentations of a common suffix
    * position decomposes piece-by-piece (pieces contain no spaces, and
    * ' ' sorts below every alphanumeric byte).
    */
  def segment(
      vocab: collection.Map[String, Long],
      maxPieceLen: Int,
      word: String
  ): (Int, Long, String) = {
    val L = word.length
    val np = Array.fill(L + 1)(Int.MaxValue)
    val sf = new Array[Long](L + 1)
    val ss = new Array[String](L + 1)
    np(L) = 0; sf(L) = 0L; ss(L) = ""
    var i = L - 1
    while (i >= 0) {
      var l = 1
      val lmax = math.min(maxPieceLen, L - i)
      while (l <= lmax) {
        if (np(i + l) != Int.MaxValue) {
          val p = word.substring(i, i + l)
          vocab.get(p) match {
            case Some(f) =>
              val cn = 1 + np(i + l)
              val cf = f + sf(i + l)
              val cs = if (ss(i + l).isEmpty) p else p + " " + ss(i + l)
              val better =
                cn < np(i) ||
                  (cn == np(i) && (cf > sf(i) ||
                    (cf == sf(i) && (ss(i) == null || cs.compareTo(ss(i)) < 0))))
              if (better) { np(i) = cn; sf(i) = cf; ss(i) = cs }
            case None => ()
          }
        }
        l += 1
      }
      i -= 1
    }
    if (np(0) == Int.MaxValue) (0, 0L, "") else (np(0), sf(0), ss(0))
  }
}

/** `word -> struct(n_pieces int, score long, pieces string)` under the
  * Viterbi DP over a broadcast-equivalent piece table (vocabulary-bounded
  * by the training `limit` — the same driver-state argument as the
  * [[ArgmaxCosineCell]] centroid tables). Bit-equal to the udf it
  * replaced: same DP, same tie rules, same empty verdict for uncoverable
  * words.
  */
case class UnigramSegment(child: Expression, pieces: Array[(String, Long)], maxPieceLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_pieces", IntegerType, nullable = false),
      StructField("score", LongType, nullable = false),
      StructField("pieces", StringType, nullable = false)
    )
  )

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"expected a string argument, got ${other.catalogString}"
      )
  }

  @transient private lazy val vocab: Map[String, Long] = pieces.toMap

  /** Called from generated code: the whole DP runs as compiled JVM code,
    * one call per row, inside the stage's generated consume.
    */
  def segRow(w: UTF8String): InternalRow = {
    val (n, f, s) = UnigramViterbi.segment(vocab, maxPieceLen, w.toString)
    InternalRow(n, f, UTF8String.fromString(s))
  }

  override def nullSafeEval(w: Any): Any = segRow(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thisRef = ctx.addReferenceObj("unigramSeg", this, classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $thisRef.segRow($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
