package graft.functions

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

/** `hll_agg(item, numBuckets)`: a HyperLogLog distinct-count sketch as a
  * mergeable aggregate — the cardinality leg of the sketch family
  * (Count-Min = point frequency, SpaceSaving = heavy hitters, Bloom =
  * membership).
  *
  * State is `numBuckets` max-rank bytes (O(m), independent of cardinality):
  * partials merge by elementwise MAX, so the aggregate is map-side
  * combinable and a GROUP BY carries one fixed-size array per (group,
  * partition) instead of a distinct-sized shuffle — the standard Flajolet
  * et al. guarantee is ~1.04/√m relative error (≈6.5% at m=256).
  *
  * Determinism is the whole design: the item's md5-60 hash splits into
  * `bucket = h % m` and a 60−log2(m)-bit window `v = h / m` whose rank is
  * `windowBits − bitLength(v) + 1` — bit length, not floating log, so an
  * engine replaying the construction ([[HllAgg.estimate]] reads it back
  * with `bin()`-string lengths and DECIMAL arithmetic, no doubles anywhere)
  * reproduces every bucket and the final estimate bit-for-bit.
  *
  * Spark's own `approx_count_distinct` is the right production default
  * (`q_approx_distinct` uses it); this aggregate exists for the pipeline
  * cases Spark's black box can't serve: sketches that must be STORED and
  * re-merged across corpus snapshots/engines, and estimates an external
  * oracle must reproduce exactly.
  */
case class HllAgg(
    child: Expression,
    numBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {
  require(
    numBuckets > 1 && (numBuckets & (numBuckets - 1)) == 0 && numBuckets <= 65536,
    "hll_agg requires numBuckets to be a power of two in [2, 65536]"
  )

  private val windowBits: Int = 60 - java.lang.Integer.numberOfTrailingZeros(numBuckets)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hll_agg requires a string argument, got ${child.dataType.catalogString}"
      )

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBuckets)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val value = child.eval(input)
    if (value != null) {
      val s = value.asInstanceOf[UTF8String]
      val h = Md5Exprs.md5Top60((s.toString + "#hll").getBytes(StandardCharsets.UTF_8))
      val bucket = (h % numBuckets).toInt
      val v = h / numBuckets
      // rank = windowBits - bitLength(v) + 1; v == 0 means all window bits
      // are zero -> the max rank windowBits + 1
      val rank =
        if (v == 0L) windowBits + 1
        else windowBits - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object HllAgg {

  /** The bias-corrected alpha constant for the raw HLL estimator, pinned as
    * an exact e6 rational so both engines use the identical literal:
    * 0.7213 / (1 + 1.079/m) for m ≥ 128, scaled by 1e6 and truncated.
    */
  def alphaE6(numBuckets: Int): Long =
    (0.7213e12 / (1e6 + 1.079e6 / numBuckets)).toLong

  /** Column API: `hll(item, m)` usable inside `df.agg(...)`. */
  def hll(item: Column, numBuckets: Int): Column =
    ExpressionUtils.column(
      HllAgg(ExpressionUtils.expression(item), numBuckets).toAggregateExpression()
    )

  /** Integer-exact raw estimate from an emitted sketch: floor(alpha · m² /
    * Σ 2^−rank). Every step is integer or DECIMAL — terms are
    * 2^(63−rank) (exact powers of two), their DECIMAL(38,0) sum S is
    * order-independent, and the final `div` is integral — so the estimate
    * is a pure function of the bucket array, replayable in any engine.
    *
    * Raw-branch only (no small-range linear-counting correction): callers
    * keep m ≪ true cardinality, where the raw estimator is the HLL
    * recommendation anyway — and the correction's `ln` would reintroduce
    * cross-engine float drift.
    */
  def estimate(sketch: Column, numBuckets: Int): Column = {
    val dec = DecimalType(38, 0)
    val sum = aggregate(
      sketch,
      lit(0).cast(dec),
      (acc, r) => acc + pow(lit(2.0), lit(63) - r).cast(dec)
    )
    val numerator =
      lit(alphaE6(numBuckets)).cast(dec) *
        lit(numBuckets.toLong * numBuckets).cast(dec) *
        pow(lit(2.0), lit(63)).cast(dec)
    call_function("div", numerator, sum * lit(1000000L).cast(dec)).cast("long")
  }
}
