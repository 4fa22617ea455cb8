package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** `gram_upper(embedding, dim)`: the upper-triangle Gram matrix
  * Σ xᵢ·xⱼ (i ≤ j) of a vector column as ONE mergeable aggregate —
  * the fast path of [[graft.operators.Similarity.dimCovariance]].
  *
  * The explode formulation materializes d(d+1)/2 struct rows per input
  * row and pushes them through a hash aggregate (41.6M rows for 20k×64);
  * this aggregate keeps the whole matrix as O(d²) LONG state per
  * partition and merges by elementwise addition, so the exchange carries
  * one matrix per partition and no per-pair row ever exists.
  *
  * Value-exactness contract: each product is rounded EXACTLY as Spark's
  * `cast(double AS DECIMAL(38,9))` rounds it — via the double's shortest
  * decimal representation (`BigDecimal.valueOf`) at scale 9, HALF_UP —
  * and accumulated as the scale-9 unscaled LONG. `eval` converts each
  * sum back with the same `Decimal.toDouble` semantics. The emitted
  * (i, j, sxy) rows are therefore bit-identical to the decimal-sum
  * explode formulation (and to the DuckDB oracle), just cheaper.
  * Accumulation uses addExact: with |x| ≤ 100 the scaled products stay
  * under 10^13, so overflow needs ~10^6 TB of rows per partition — but
  * it fails loud, not wrong, if that contract is ever broken.
  */
case class GramUpperAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {
  require(dim > 0, "gram_upper requires a positive dim")

  private val nPairs = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("i", LongType, nullable = false),
        StructField("j", LongType, nullable = false),
        StructField("sxy", DoubleType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"gram_upper requires array<float|double>, got ${other.catalogString}"
        )
    }

  // lazy: child.dataType is illegal to touch while the expression is
  // still unresolved (Catalyst copies the node through analysis)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nPairs)

  /** Spark's cast(double AS DECIMAL(38,9)) as a scale-9 unscaled long. */
  private def scaled9(x: Double): Long =
    java.math.BigDecimal
      .valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .unscaledValue()
      .longValueExact()

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim, s"expected dim=$dim, got ${arr.numElements()}")
      val xs = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        xs(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(k) = Math.addExact(buf(k), scaled9(xs(i) * xs(j)))
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](nPairs)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        // Decimal(unscaled, 38, 9).toDouble semantics
        val sxy = java.math.BigDecimal.valueOf(buf(k), 9).doubleValue()
        out(k) = new GenericInternalRow(Array[Any](i.toLong, j.toLong, sxy))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramUpperAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramUpperAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object GramUpperAgg {

  /** Column API: `gramUpper(embedding, dim)` usable inside `df.agg(...)`. */
  def gramUpper(emb: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramUpperAgg(ExpressionUtils.expression(emb), dim).toAggregateExpression()
    )
}
