package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cm_sketch(item, depth, width)`: a Count-Min frequency sketch as a
  * mergeable aggregate — the point-frequency complement of the SpaceSaving
  * heavy-hitters sketch ([[SpaceSavingAgg]]).
  *
  * State is a fixed `depth x width` LONG counter matrix (O(d·w), independent
  * of cardinality): partials merge by elementwise addition, so the
  * aggregate is map-side combinable and the exchange carries one matrix per
  * partition instead of a vocabulary-sized shuffle. Estimates
  * (`CountMinSketchAgg.estimate`, composed from built-in expressions over
  * the emitted array) never undercount and overcount by at most N·e/width
  * with probability 1-e^-depth — the standard CM guarantee.
  *
  * Rows are md5-salted (`item + "#cm<j>"`, the [[graft.util.Cols.md5Long]]
  * 60-bit construction), so the sketch is a pure function of the input
  * multiset: reproducible across reruns, partitionings, and engines — a
  * DuckDB oracle can recompute every counter and estimate bit-for-bit.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {
  require(depth > 0 && width > 0, "cm_sketch requires positive depth/width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cm_sketch requires a string argument, got ${child.dataType.catalogString}"
      )

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  private def bucket(row: Int, item: UTF8String): Int = {
    val salted = (item.toString + "#cm" + row).getBytes(StandardCharsets.UTF_8)
    val h = Md5Exprs.md5Top60(salted)
    // h is a 60-bit non-negative value, so % is already pmod
    (h % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < depth) { buf(j * width + bucket(j, s)) += 1L; j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object CountMinSketchAgg {

  /** Column API: `cmSketch(item, d, w)` usable inside `df.agg(...)`. */
  def cmSketch(item: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinSketchAgg(ExpressionUtils.expression(item), depth, width)
        .toAggregateExpression()
    )

  /** Point-frequency estimate from an emitted sketch array: min over rows
    * of the item's counter. Composed entirely from built-in (codegen)
    * expressions — reading a sketch needs no custom code, only building
    * one does.
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map { j =>
        val b = pmod(
          graft.util.Cols.md5Long(concat(item.cast("string"), lit(s"#cm$j"))),
          lit(width.toLong)
        )
        element_at(sketch, (lit(j.toLong * width) + b + 1L).cast("int"))
      }
      .reduce(least(_, _))
}
