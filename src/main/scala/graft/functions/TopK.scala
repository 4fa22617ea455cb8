package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs seen so far, where
  * "better" = higher score, ties broken by lower id — the same total order
  * as `ORDER BY score DESC, id ASC` (ids are unique in every use site, so
  * the k-set is deterministic).
  *
  * Capacity is k, so a partial aggregate's state is O(k) regardless of how
  * many rows flow through it — this is what makes the aggregate safe where
  * a `row_number()` window is not: the window must shuffle ALL scored rows
  * into one partition per group and sort them; this buffer reduces each map
  * partition to k rows per group before the exchange.
  *
  * Updates are O(k) linear scans — top-k searches use small k (5..100);
  * for k in the thousands a heap would win, not needed here.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n: Int = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def add(s: Double, id: Long): Unit = {
    if (n < k) { scores(n) = s; ids(n) = id; n += 1 }
    else if (k > 0) {
      // replace the worst element if the candidate beats it
      var worst = 0
      var i = 1
      while (i < n) {
        if (better(scores(worst), ids(worst), scores(i), ids(i))) worst = i
        i += 1
      }
      if (better(s, id, scores(worst), ids(worst))) { scores(worst) = s; ids(worst) = id }
    }
  }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** (score, id) pairs best-first. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
  }
}

/** `top_k(score, id, k)`: partial-aggregable bounded top-k. Returns
  * `array<struct<id: bigint, score: double>>` sorted best-first — explode
  * with `posexplode` to recover ranks 1..k.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && (id.dataType == LongType || id.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"top_k requires (double, bigint|int) arguments, got " +
          s"(${score.dataType.catalogString}, ${id.dataType.catalogString})"
      )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.merge(o); b }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, id) => InternalRow(id, s) })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.n * 16)
    buf.putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.scores(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val n = buf.getInt
    var i = 0
    while (i < n) { b.add(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKByScore {
  val resultType: ArrayType = ArrayType(
    StructType(
      Seq(StructField("id", LongType, nullable = false), StructField("score", DoubleType, nullable = false))
    ),
    containsNull = false
  )

  /** Column API: `topK(score, id, k)` usable inside `df.agg(...)`. */
  def topK(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(
        ExpressionUtils.expression(score),
        ExpressionUtils.expression(id),
        k
      ).toAggregateExpression()
    )
}
