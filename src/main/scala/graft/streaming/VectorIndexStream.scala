package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, IvfPq, Pq}

/** Incremental ANN-index maintenance: append each micro-batch of NEW
  * vectors into a persisted [[IvfPq]] index without retraining and without
  * touching the existing code table.
  *
  * The production discipline this encodes: the coarse quantizer (cell
  * centroids) and the PQ codebooks are FROZEN at build time — an upsert
  * assigns each new vector its nearest existing cell (map-only literal
  * argmax, the nProbe=1 case of the probe projection) and encodes it with
  * the stored codebooks; retraining is a REBUILD, never an upsert (FAISS's
  * `add` vs `train` split). Each batch lands in its own
  * `delta/batch_id=N/cell=.../` partition tree — idempotent per batch (a
  * replayed batch overwrites only its own directory, the
  * [[EventStreams.idempotentParquetSink]] discipline), cell-partitioned so
  * probe pruning works on deltas exactly as on the base table.
  *
  * At 100 TB: batch deltas are code-sized (m bytes-ish per vector), the
  * base table is never rewritten, and compaction folding `delta/` into
  * `codes/` (plus an eventual retrain) runs POLICY-DRIVEN from the write
  * path itself ([[maybeCompact]]: delta rows > `compactAt` × base rows) —
  * the search path meanwhile reads base ∪ delta with identical pruning.
  */
object VectorIndexStream {

  /** Fold `delta/` into the base code table iff accumulated delta rows
    * exceed `maxDeltaFraction` of base rows — the debt policy that keeps
    * the per-batch amortized compaction cost O(maxDeltaFraction⁻¹) base
    * rewrites per base-size of ingest while bounding the search-path read
    * amplification (file-listing + union branch per surviving batch) at
    * the same fraction. Row counts come from parquet metadata (footer
    * counts — no data scan). Returns true iff compaction ran.
    */
  def maybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    if (!new java.io.File(s"$dir/delta").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/codes").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) IvfPq.compactDeltas(spark, dir)
      due
    }
  }

  /** One micro-batch of (vec_id, embedding) rows → cell-assigned, PQ-coded,
    * appended under `dir/delta/batch_id=<id>`, then the [[maybeCompact]]
    * policy settles the delta debt (compactAt <= 0 disables — the manual-
    * maintenance mode). Exposed for batch callers and tests;
    * [[codesUpsert]] wires it into foreachBatch.
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      dim: Int,
      compactAt: Double = 0.2,
      // the metadata columns the index was BUILT with (IvfPq.ensureBuilt's
      // metaCols — the filtered-ANN pushdown columns). They must ride
      // every delta row: the reader's strict unionByName rejects a
      // meta-less delta against a meta-bearing base, so omitting them
      // against a filtered index would brick every subsequent read.
      metaCols: Seq[String] = Nil
  ): Unit = {
    val spark = batch.sparkSession
    val cents = IvfIndex.loadCentroids(spark, dir) // O(k·dim) driver state
    val cb = Pq.loadCodebooks(spark, dir) // O(m·ksub·dsub) driver state
    // nProbe=1 probe projection = nearest-cell assignment (map-only);
    // probeFrame projects (id, embedding, cell), so metadata columns are
    // joined back on vec_id — a batch-sized equi-join, never corpus work
    val celled0 = IvfIndex
      .probeFrame(batch, cents, nProbe = 1)
      .select(
        col("query_id").as("vec_id"),
        col("q_emb").as("embedding"),
        col("cell")
      )
    val celled =
      if (metaCols.isEmpty) celled0
      else celled0.join(batch.select(("vec_id" +: metaCols).map(col): _*), Seq("vec_id"))
    Pq.encode(celled, cb, dim, keep = Seq("vec_id", "cell") ++ metaCols)
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0.0) maybeCompact(spark, dir, compactAt)
  }

  /** foreachBatch writer over a (vec_id, embedding) stream. Start with
    * `.trigger(...).option("checkpointLocation", ...)`. Pass the index's
    * build-time `metaCols` when maintaining a filtered-ANN index.
    */
  def codesUpsert(
      vecsStream: DataFrame,
      dir: String,
      dim: Int = 64,
      compactAt: Double = 0.2,
      metaCols: Seq[String] = Nil
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(batch, dir, batchId, dim, compactAt, metaCols)
    }
}
