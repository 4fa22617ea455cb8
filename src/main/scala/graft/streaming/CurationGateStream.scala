package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Indexes}

/** Incremental maintenance of the persisted curation gate-annotation
  * asset ([[Curation.ensureGateAsset]]) — the gate-table member of the
  * delta-upsert + debt-policy family ([[SubstrIndexStream]],
  * [[SemanticStream]], the media index folds): a continuously-ingesting
  * corpus keeps its per-doc gate verdicts current without ever
  * re-reading the standing corpus's raw text.
  *
  * What folds and what re-derives: the asset's statistics tables
  * ([[Curation.pureStats]] — per-doc gate verdicts, label ingredients,
  * hashed bigram/token multisets) are PURE per-doc rows, so an upsert
  * tokenizes ONLY the batch and appends its rows under
  * `delta/<table>/batch_id=N` (idempotent per partition — rows are
  * bit-deterministic functions of the documents). The published
  * `gates/` table, however, is CORPUS-RELATIVE (KN scores against the
  * corpus LM, CCNet terciles against the per-language rank, classifier
  * heads trained on the corpus' train split), so it cannot be patched
  * row-wise: compaction folds the delta statistics into the base tables
  * (full-row distinct restores exactly-once when a batch replays after
  * its fold) and re-runs [[Curation.deriveGates]] over the folded
  * statistics — corpus-sized compute over SLIM hashed tables, never a
  * raw-text re-read; the expensive legs (page synthesis, n=5..10
  * repetition coverage, tokenization, lexicon hashing) are paid once
  * per document, ever. The result is BIT-EQUAL to a wholesale rebuild
  * over the grown corpus — the fold is provably indistinguishable
  * (`pipe_curate_fold` runs under `pipe_curate_e2e`'s oracle).
  *
  * Publication is the crash-safe journaled swap ([[Indexes.commitSwap]]):
  * readers never observe a half-folded asset across a restart. Between
  * folds, `gates/` reflects the corpus AS OF the last compaction and
  * `delta/` holds the pending documents — the right semantics for a
  * corpus-relative table, where a partially-applied delta would change
  * every doc's tercile anyway.
  */
object CurationGateStream {

  private val Tables = Seq("puregates", "docstats", "doctoks")

  /** One micro-batch of (doc_id, text, lang) rows: append the batch's
    * statistics rows (only the batch is tokenized), then settle the
    * delta debt (`compactAt` <= 0 disables; fractions force-fold).
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      compactAt: Double = 0.2
  ): Unit = {
    val spark = batch.sparkSession
    Indexes.recoverSwap(dir)
    val (pg, ds, dt) = Curation.pureStats(batch)
    Seq("puregates" -> pg, "docstats" -> ds, "doctoks" -> dt).foreach {
      case (name, df) =>
        df.write.mode("overwrite").parquet(s"$dir/delta/$name/batch_id=$batchId")
    }
    if (compactAt > 0) { maybeCompact(spark, dir, compactAt); () }
  }

  /** Fold `delta/` into the base tables and republish `gates/` iff
    * accumulated delta docs exceed `maxDeltaFraction` of base docs.
    * Returns true iff compaction ran.
    */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    Indexes.recoverSwap(dir)
    if (!new java.io.File(s"$dir/delta/puregates").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/puregates").count()
      val delta = spark.read.parquet(s"$dir/delta/puregates").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compact(spark, dir)
      due
    }
  }

  /** Fold the delta statistics into the base tables, re-derive `gates/`
    * from the FOLDED statistics, publish everything via the journaled
    * swap (which also retires `delta/`). Full-row distinct on the folded
    * tables restores exactly-once under post-compaction batch replays
    * (rows are bit-deterministic, so a replayed batch's rows are
    * identical to the folded ones).
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    Indexes.recoverSwap(dir)
    if (new java.io.File(s"$dir/delta/puregates").exists()) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      Tables.foreach { name =>
        spark.read
          .parquet(s"$dir/$name")
          .unionByName(
            spark.read
              .parquet(s"$dir/delta/$name")
              .drop("batch_id")
          )
          .distinct()
          .write
          .mode("overwrite")
          .parquet(s"$dir/$name.compact-$stamp")
      }
      Curation
        .deriveGates(
          spark.read.parquet(s"$dir/puregates.compact-$stamp"),
          spark.read.parquet(s"$dir/docstats.compact-$stamp"),
          spark.read.parquet(s"$dir/doctoks.compact-$stamp")
        )
        .write
        .mode("overwrite")
        .parquet(s"$dir/gates.compact-$stamp")
      Indexes.commitSwap(dir, stamp, "gates" +: Tables)
    }
  }

  /** The published gate table (post-compaction view), recovery-checked. */
  def gates(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    spark.read.parquet(s"$dir/gates")
  }

  /** Structured-streaming sink: [[upsertBatch]] per micro-batch. */
  def sink(
      docsStream: DataFrame,
      dir: String,
      compactAt: Double = 0.2
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(batch, dir, batchId, compactAt)
    }
}
