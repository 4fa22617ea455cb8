package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Indexes, Urls}
import graft.sources.Warc

/** Incremental CDX maintenance: newly-landed WARC shards index into the
  * persisted capture asset ([[Warc.ensureCdxDir]]'s `idx/` parquet)
  * without re-walking existing shards — the shape of Common Crawl's own
  * indexing, where each new crawl segment contributes per-shard cdx
  * rows that later merge into the sorted index shards.
  *
  * Mechanics are the established journaled-swap discipline
  * ([[AudioIndexStream]] / [[VectorIndexStream]]): each batch indexes
  * ONLY its new shards (a path glob — capture rows are per-member, so
  * shard-additive by construction) and overwrites its own
  * `delta/batch_id=N` (replay-idempotent); reads are base ∪ outstanding
  * deltas after [[Indexes.recoverSwap]]; the [[maybeCompact]] debt
  * policy folds deltas into `idx/` through the crash-safe swap, with a
  * full-row `distinct()` restoring exactly-once for a batch replayed
  * AFTER compaction folded it (member rows are bit-deterministic, so
  * replayed rows equal compacted ones).
  *
  * At 100 TB: a batch's cost is one member walk over ONLY the new
  * shards; the standing index is never re-derived; compaction rewrites
  * capture METADATA rows (no blocks — KBs per shard), so even a full
  * fold is tiny next to the archive.
  */
object CdxStream {

  /** Live capture view: base `idx/` ∪ outstanding `delta/` batches
    * (batch_id partition column dropped so the view matches the base
    * schema), crash-recovering a landed swap journal first.
    */
  def readCaptures(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    val base = spark.read.parquet(s"$dir/idx")
    if (!new java.io.File(s"$dir/delta").exists()) base
    else base.unionByName(spark.read.parquet(s"$dir/delta").drop("batch_id"))
  }

  /** One micro-batch = the shards matching `glob` that just landed under
    * `warcDir`: walk ONLY those members, key with SURT, land under
    * `delta/batch_id=<id>` (overwrite — replay-idempotent), then settle
    * the delta debt. The caller owns the batch→shard mapping (each shard
    * in exactly one batch), the same single-owner contract every index
    * stream here states.
    */
  def upsertBatch(
      spark: SparkSession,
      warcDir: String,
      glob: String,
      dir: String,
      batchId: Long,
      compactAt: Double = 0.2
  ): Unit = {
    Warc
      .memberIndex(spark, warcDir, glob)
      .withColumn("surt", Urls.surt(col("target_uri")))
      .write
      .mode("overwrite")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0) maybeCompact(spark, dir, compactAt)
  }

  /** Fold deltas iff their rows exceed `maxDeltaFraction` of the base —
    * the standard debt policy bounding read amplification while keeping
    * amortized compaction cost O(fraction⁻¹) base rewrites per base-size
    * of ingest. Returns true iff compaction ran.
    */
  def maybeCompact(spark: SparkSession, dir: String, maxDeltaFraction: Double = 0.2): Boolean = {
    Indexes.recoverSwap(dir)
    if (!new java.io.File(s"$dir/delta").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/idx").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compactDeltas(spark, dir)
      due
    }
  }

  /** Fold `delta/` into `idx/` through the journaled crash-safe swap —
    * after compaction a lookup reads one parquet tree again. Recovery
    * runs FIRST (a landed journal must replay before `idx/` is read
    * directly — the [[SubstrIndexStream]] lesson); the full-row distinct
    * restores exactly-once under post-compaction batch replay.
    */
  def compactDeltas(spark: SparkSession, dir: String): Unit = {
    Indexes.recoverSwap(dir)
    if (new java.io.File(s"$dir/delta").exists()) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      readCaptures(spark, dir)
        .distinct()
        .write
        .mode("overwrite")
        .parquet(s"$dir/idx.compact-$stamp")
      Indexes.commitSwap(dir, stamp, Seq("idx"))
    }
  }
}
