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

/** `bloom_agg(key, numBits, numHashes)`: a Bloom filter membership sketch as
  * a mergeable aggregate — the broadcast-able "does the corpus contain this
  * key?" primitive that replaces a corpus-sized shuffle semi-join in
  * delta-vs-corpus dedup.
  *
  * At 100 TB the standing corpus' key set is far too large to shuffle
  * against every ingest batch; a Bloom filter is O(numBits) regardless of
  * corpus size, merges by bitwise OR (map-side combinable, one fixed-size
  * word array per partition crosses the exchange), and broadcast to the
  * delta makes the membership test map-only. One-sided error does the rest:
  * a negative is DEFINITELY absent (no false negatives), so only the
  * candidate subset — true dups plus the small false-positive tail — ever
  * reaches the exact-verify join.
  *
  * Bits are set by the same md5-salted 60-bit construction as the MinHash /
  * Count-Min family (`key + "#bf<j>"`, [[Md5Exprs.md5Top60]]): the filter is
  * a pure function of the input key SET — reproducible across reruns,
  * partitionings, and engines, so a DuckDB oracle recomputes every set bit
  * and every membership verdict exactly. Reading the filter back
  * ([[BloomFilterAgg.mightContain]]) is composed entirely from built-in
  * codegen expressions (`bit_get` over the emitted word array).
  *
  * Sizing: numBits ≈ 10–15 bits/key gives the textbook <1% false-positive
  * rate at k = 2–3; the query fixtures deliberately undersize to keep the
  * false-positive path non-vacuous at oracle scale.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {
  require(
    numBits > 0 && numBits % 64 == 0,
    "bloom_agg requires numBits to be a positive multiple of 64"
  )
  require(numHashes > 0, "bloom_agg requires positive numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg requires a string argument, got ${child.dataType.catalogString}"
      )

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  private def position(j: Int, key: UTF8String): Int = {
    val salted = (key.toString + "#bf" + j).getBytes(StandardCharsets.UTF_8)
    // md5Top60 is a 60-bit non-negative value, so % is already pmod
    (Md5Exprs.md5Top60(salted) % numBits).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < numHashes) {
        val p = position(j, s)
        buf(p >>> 6) |= (1L << (p & 63))
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object BloomFilterAgg {

  /** Column API: `bloom(key, bits, hashes)` usable inside `df.agg(...)`. */
  def bloom(key: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomFilterAgg(ExpressionUtils.expression(key), numBits, numHashes)
        .toAggregateExpression()
    )

  /** Membership test against an emitted filter: AND over the key's hash
    * positions of the corresponding bit. Composed entirely from built-in
    * (codegen) expressions — probing a broadcast filter needs no custom
    * code, only building one does. Never false-negative: every inserted key
    * tests true.
    */
  def mightContain(filter: Column, key: Column, numBits: Int, numHashes: Int): Column =
    (0 until numHashes)
      .map { j =>
        val pos = pmod(
          graft.util.Cols.md5Long(concat(key.cast("string"), lit(s"#bf$j"))),
          lit(numBits.toLong)
        )
        val word = element_at(filter, (shiftright(pos, 6) + 1).cast("int"))
        bit_get(word, pmod(pos, lit(64L)).cast("int")) === 1
      }
      .reduce(_ && _)
}
