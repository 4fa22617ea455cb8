package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Expectations

/** Contract-gated streaming ingest: every micro-batch is validated
  * against a declarative [[Expectations]] contract BEFORE it lands.
  * Passing batches land under `accepted/`; any violation quarantines the
  * WHOLE batch under `quarantine/` (the write-audit-publish discipline:
  * bad data never mixes into the serving table, and nothing is dropped
  * silently — operators re-drive the quarantined batch after fixing the
  * producer). Each batch also writes its violations report under
  * `reports/`, so the monitoring side is a plain parquet read.
  *
  * Exactly-once: all three writes are idempotent per (batchId) —
  * deterministic checks give a replayed batch the same verdict, so a
  * replay overwrites the same dirs with the same bytes
  * ([[EventStreams.idempotentParquetSink]] discipline).
  *
  * Scale shape: the batch is evaluated by ONE zero-group aggregate
  * (every row check a conditional-sum slot — [[Expectations.evaluate]]'s
  * contract), the verdict is an O(#checks) driver-side reduction, and the
  * batch itself is written once. State across batches: none.
  */
object QualityGateStream {

  def gatedParquetSink(
      df: DataFrame,
      checks: Seq[Expectations.Check],
      outDir: String
  ): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.persist()
      try {
        val report = Expectations
          .evaluate("batch", batch, checks)
          .withColumn("batch_id", lit(batchId))
        val rows = report.collect() // O(#checks), bounded
        val failed = rows.exists(r => !r.getAs[Boolean]("passed"))
        val target = if (failed) "quarantine" else "accepted"
        batch.write
          .mode("overwrite")
          .parquet(s"$outDir/$target/batch_id=$batchId")
        report.write
          .mode("overwrite")
          .parquet(s"$outDir/reports/batch_id=$batchId")
      } finally batch.unpersist()
    }
}
