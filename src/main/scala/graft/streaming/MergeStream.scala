package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.Versioned

/** Streaming CDC apply: an upsert/delete stream materialized into the
  * merge-on-read versioned table — the continuous form of MERGE INTO
  * (Delta's streaming CDF apply / Hudi DeltaStreamer shape). Each
  * micro-batch becomes ONE merge commit of |batch| rows via
  * [[Versioned.commitMergeOnce]], keyed by the batch id, so foreachBatch's
  * at-least-once replays land exactly once (the manifest rename is the
  * single atomic commit point; a replayed epoch already referenced by a
  * manifest is a no-op). Readers resolve the table with
  * [[Versioned.readMerged]] at any moment and see a consistent snapshot —
  * never a half-applied batch.
  *
  * `deletedWhen` marks which stream rows are deletions (CDC delete
  * records → tombstones). State across batches: none in the writer; the
  * table's merge resolution cost is bounded by [[Versioned.compactMerged]]
  * on whatever cadence the operator runs it.
  */
object MergeStream {

  def mergeSink(
      df: DataFrame,
      dir: String,
      deletedWhen: Column
  ): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      Versioned.commitMergeOnce(batch, dir, epochId = batchId, deleted = deletedWhen): Unit
    }
}
