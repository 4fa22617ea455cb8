package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al.): at most `capacity`
  * (item, est, err) counters; an unseen item evicts the minimum counter and
  * inherits its estimate as error. Guarantees, for N rows through one
  * summary: est >= true count, est - err <= true count, and every item with
  * true count > N/capacity is present.
  *
  * Mergeable (Agarwal et al., "Mergeable Summaries"): merge = sum matching
  * counters, union the rest, prune back to capacity by estimate — which is
  * what makes it a valid partial aggregate: O(capacity) state per map
  * partition regardless of row count, the frequency analogue of the
  * bounded top-k buffer.
  *
  * Determinism: with capacity >= distinct items nothing ever evicts — the
  * summary IS the exact frequency table on any partitioning (the
  * oracle-checked regime). Under eviction the content depends on encounter
  * order, like any SpaceSaving run distributed; only the guarantee, not
  * the exact content, is stable (spec-checked regime).
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val map = new java.util.HashMap[String, Array[Long]]() // value = [est, err]

  def addOne(item: String): Unit = {
    val cur = map.get(item)
    if (cur != null) cur(0) += 1L
    else if (map.size < capacity) map.put(item, Array(1L, 0L))
    else {
      val (minK, minV) = minEntry()
      map.remove(minK)
      map.put(item, Array(minV(0) + 1L, minV(0)))
    }
  }

  private def minEntry(): (String, Array[Long]) = {
    var mk: String = null
    var mv: Array[Long] = null
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (mv == null || v(0) < mv(0) || (v(0) == mv(0) && e.getKey < mk)) {
        mk = e.getKey; mv = v
      }
    }
    (mk, mv)
  }

  /** Combine then prune to capacity (largest estimates survive; ties keep
    * the lexicographically smaller item for determinism).
    */
  def merge(o: SpaceSavingBuffer): Unit = {
    val it = o.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = map.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else map.put(e.getKey, Array(e.getValue()(0), e.getValue()(1)))
    }
    if (map.size > capacity) {
      val pruned = sortedEntries.take(capacity)
      map.clear()
      pruned.foreach { case (k, est, err) => map.put(k, Array(est, err)) }
    }
  }

  /** (item, est, err) by est desc, then item asc. */
  def sortedEntries: Array[(String, Long, Long)] = {
    val out = new Array[(String, Long, Long)](map.size)
    var i = 0
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    out.sortWith { case ((k1, e1, _), (k2, e2, _)) =>
      e1 > e2 || (e1 == e2 && k1 < k2)
    }
  }
}

/** `space_saving(item, capacity, outK)`: mergeable heavy-hitters sketch;
  * returns the top-outK summary entries as
  * `array<struct<item: string, est: bigint, err: bigint>>`, best-first.
  */
case class SpaceSavingAgg(
    item: Expression,
    capacity: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[SpaceSavingBuffer] {

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"space_saving requires a string argument, got ${item.dataType.catalogString}"
      )

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = item.eval(input)
    if (v != null) b.addOne(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.merge(o); b
  }

  override def eval(b: SpaceSavingBuffer): Any =
    new GenericArrayData(
      b.sortedEntries.take(outK).map { case (k, est, err) =>
        InternalRow(UTF8String.fromString(k), est, err)
      }
    )

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val entries = b.sortedEntries
    var size = 8
    entries.foreach { case (k, _, _) => size += 4 + k.getBytes(StandardCharsets.UTF_8).length + 16 }
    val buf = ByteBuffer.allocate(size)
    buf.putInt(b.capacity)
    buf.putInt(entries.length)
    entries.foreach { case (k, est, err) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      buf.putInt(kb.length); buf.put(kb); buf.putLong(est); buf.putLong(err)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new SpaceSavingBuffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](buf.getInt)
      buf.get(kb)
      b.map.put(new String(kb, StandardCharsets.UTF_8), Array(buf.getLong, buf.getLong))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
}

object SpaceSavingAgg {
  val resultType: ArrayType = ArrayType(
    StructType(
      Seq(
        StructField("item", StringType, nullable = false),
        StructField("est", LongType, nullable = false),
        StructField("err", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  /** Column API: `spaceSaving(item, capacity, outK)` for `df.agg(...)`. */
  def spaceSaving(item: Column, capacity: Int, outK: Int): Column =
    ExpressionUtils.column(
      SpaceSavingAgg(ExpressionUtils.expression(item), capacity, outK)
        .toAggregateExpression()
    )
}
