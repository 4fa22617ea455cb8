package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Audio, Indexes}

/** Incremental audio-dedup-index maintenance: append each micro-batch of
  * NEW clips' pad-invariant fingerprints into a persisted
  * [[Audio.ensureAudioFpIndex]] asset without re-decoding the corpus —
  * the audio twin of [[MediaIndexStream]]. A continuously-ingesting media
  * corpus keeps its dedup verdicts exact without ever re-publishing the
  * whole asset.
  *
  * Discipline (the MediaIndexStream contract, fingerprints instead of
  * dHashes): the index's source of truth is the per-doc table (`docs/`,
  * one (doc_id, fingerprint) row per clip — a pure function of the clip's
  * payload, so replayed batches are bit-identical). An upsert decodes
  * ONLY the batch and writes its rows under `delta/batch_id=N` —
  * idempotent per batch. `clusters/` stays the build-time derived
  * aggregate; the LIVE view ([[readClusters]]) re-derives it from the
  * exactly-once per-doc view while deltas are outstanding (a two-column
  * partial-aggregable scan — the cost the index amortizes, the DECODE, is
  * never re-paid), so a dedup verdict over the stream-grown index is
  * exact at any moment.
  *
  * Compaction ([[maybeCompact]]) folds `delta/` into `docs/` when delta
  * rows exceed `maxDeltaFraction` of base rows, re-derives `clusters/`,
  * and publishes via the crash-safe journaled swap
  * ([[Indexes.commitSwap]]); a batch replayed AFTER compaction folded it
  * re-lands in `delta/` with bit-identical rows, and the next fold's
  * full-row `distinct()` restores exactly-once — no ledger needed.
  */
object AudioIndexStream {

  /** Per-doc fingerprint rows, base ∪ outstanding deltas, exactly-once
    * view (distinct over the pure-function rows).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    val base =
      spark.read.parquet(s"$dir/docs").select(col("doc_id"), col("fingerprint"))
    if (!new java.io.File(s"$dir/delta").exists()) base
    else
      base
        .unionByName(
          spark.read.parquet(s"$dir/delta").select(col("doc_id"), col("fingerprint"))
        )
        .distinct()
  }

  /** LIVE (fingerprint, rep, n_variants) clusters over the stream-grown
    * index. While deltas are outstanding, clusters are re-derived from the
    * exactly-once per-doc view — NOT by merging base clusters with delta
    * clusters, which would double-count a batch replayed after compaction
    * already folded its rows. With no outstanding delta, the persisted
    * aggregate is served as-is (identical plan to the build-time read).
    */
  def readClusters(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!new java.io.File(s"$dir/delta").exists())
      spark.read
        .parquet(s"$dir/clusters")
        .select(col("fingerprint"), col("rep"), col("n_variants"))
    else Audio.fpClusters(readDocs(spark, dir))
  }

  /** Fold `delta/` into the base iff accumulated delta rows exceed
    * `maxDeltaFraction` of base rows. Returns true iff compaction ran.
    */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    if (!new java.io.File(s"$dir/delta").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/docs").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compactDeltas(spark, dir)
      due
    }
  }

  /** Merge base ∪ delta per-doc rows (full-row distinct = exactly-once),
    * re-derive clusters, publish both via the crash-safe journaled swap.
    */
  def compactDeltas(spark: SparkSession, dir: String): Unit = {
    if (new java.io.File(s"$dir/delta").exists()) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      val docs = readDocs(spark, dir).localCheckpoint()
      docs.write.mode("overwrite").parquet(s"$dir/docs.compact-$stamp")
      Audio
        .fpClusters(docs)
        .write
        .mode("overwrite")
        .parquet(s"$dir/clusters.compact-$stamp")
      Indexes.commitSwap(dir, stamp, Seq("docs", "clusters"))
    }
  }

  /** One micro-batch of (doc_id, ...) clip rows → decoded, fingerprinted,
    * appended under `dir/delta/batch_id=<id>`, then the [[maybeCompact]]
    * policy settles the delta debt (compactAt <= 0 disables). Only the
    * batch is decoded — the corpus-linear cost is never re-paid.
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      compactAt: Double = 0.2,
      // the fingerprint provider the index is maintained under — must be
      // the one the asset was BUILT with (energy: Audio.energyFp;
      // spectral: Audio.spectralFp). Everything else here is
      // fingerprint-agnostic: (doc_id, fingerprint) rows in, exactly-once
      // per-doc view + derived clusters out.
      fp: (SparkSession, DataFrame) => DataFrame = Audio.energyFp
  ): Unit = {
    val spark = batch.sparkSession
    fp(spark, batch)
      .select(col("doc_id"), col("fingerprint"))
      .write
      .mode("overwrite")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0.0) maybeCompact(spark, dir, compactAt)
  }

  /** foreachBatch writer over a clip-document stream. Start with
    * `.trigger(...).option("checkpointLocation", ...)`.
    */
  def fpUpsert(
      clipsStream: DataFrame,
      dir: String,
      compactAt: Double = 0.2,
      fp: (SparkSession, DataFrame) => DataFrame = Audio.energyFp
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    clipsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(batch, dir, batchId, compactAt, fp)
    }
}
