package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) vector math over `array<float>` /
  * `array<double>` columns.
  *
  * These replace the `aggregate(zip_with(...))` higher-order-function
  * formulation, which executes interpreted (HOFs fall out of codegen) and
  * measured two orders of magnitude below loop speed on the embedding
  * workloads. Accumulation is left-to-right in double — bit-identical to
  * the HOF version and to DuckDB's `list_dot_product`, which the oracle
  * queries rely on.
  *
  * Length semantics: iteration stops at the shorter array (embedding
  * columns are fixed-dimension, so lengths always match in practice;
  * the old HOF version returned NULL on mismatch instead).
  */
trait VecArrayInputs { self: BinaryExpression =>

  // Element type resolved PER SIDE: a float-embedding column is routinely
  // compared against double centroids/literals, and reading a double slot
  // with getFloat returns garbage, not a rounded value.
  private def elemTypeOf(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  protected def leftElem: DataType = elemTypeOf(left)
  protected def rightElem: DataType = elemTypeOf(right)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"expected two array<float|double> arguments, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})"
      )
  }

  protected def getD(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  /** Java source reading element `i` of `arr` as double. */
  protected def getCode(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _         => s"$arr.getDouble($i)"
  }
}

/** Dot product of two numeric arrays, left-to-right double accumulation. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression
    with VecArrayInputs {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getD(x, i, leftElem) * getD(y, i, rightElem); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += ${getCode(a, i, leftElem)} * ${getCode(b, i, rightElem)};
          }
          ${ev.value} = $s;
        """
      }
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` in one
  * pass: three independent left-to-right accumulators, so each sum is
  * bit-identical to computing the three dot products separately.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression
    with VecArrayInputs {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = getD(x, i, leftElem)
      val yv = getD(y, i, rightElem)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $dot = 0.0;
          double $na = 0.0;
          double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = ${getCode(a, i, leftElem)};
            double $yv = ${getCode(b, i, rightElem)};
            $dot += $xv * $yv;
            $na += $xv * $xv;
            $nb += $yv * $yv;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """
      }
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
