package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, the payload of the LATEST right row
  * with `right.timeCol <= left.timeCol` within the same key — the
  * point-in-time lookup every event/feature pipeline needs (trades→quotes,
  * click→last-purchase, example→latest-label).
  *
  * Spark has no ASOF operator; the naive formulations both fail at scale:
  * a range-condition join explodes to every (left, earlier-right) pair
  * before aggregation, and a per-key loop is a driver bottleneck. The
  * scalable shape used here: tag and union the two sides, then ONE window
  * per key ordered by (time, tag) carrying the last non-null right payload
  * forward (`last(_, ignoreNulls)` over unbounded-preceding rows). Exactly
  * one shuffle + sort on the key, output linear in input, no pair blowup.
  * Right rows sort before left rows at equal times, so `<=` ties resolve
  * to the contemporaneous right row — DuckDB ASOF JOIN semantics, which is
  * also this operator's oracle.
  */
object AsofJoin {

  /** @param left        probe side; all its columns are preserved
    * @param right       reference side: (keyCol, timeCol, payloadCol)
    * @param keyCol      equi-key present on both sides
    * @param timeCol     event-time column present on both sides
    * @param payloadCol  right column to carry to each left row
    * @param asCol       output name for the carried payload (null when no
    *                    right row precedes the left row)
    * @param tieCol      optional RIGHT-side column breaking ties between
    *                    right rows that share (keyCol, timeCol): the
    *                    GREATEST tieCol's payload wins, so the carried
    *                    value is bit-deterministic instead of partition-
    *                    order-dependent. Left rows never need the column
    *                    (their relative order cannot change what they
    *                    carry); without it, equal-time right rows resolve
    *                    arbitrarily.
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      payloadCol: String,
      asCol: String,
      tieCol: Option[String] = None
  ): DataFrame = {
    val payloadType = right.schema(payloadCol).dataType
    val l = left
      .withColumn("_tag", lit(1))
      .withColumn("_rv", lit(null).cast(payloadType))
    val r = right.select(
      col(keyCol) +: col(timeCol) +: lit(0).as("_tag") +:
        col(payloadCol).as("_rv") +:
        tieCol.map(c => col(c).as("_tie")).toSeq: _*
    )
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(
        col(timeCol) +: col("_tag") +:
          // left rows carry null here; they already sort after every
          // equal-time right row on _tag, so only right-right ties move
          tieCol.map(_ => col("_tie").asc_nulls_first).toSeq: _*
      )
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag" +: "_rv" +: tieCol.map(_ => "_tie").toSeq: _*)
  }
}
