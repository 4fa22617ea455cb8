package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Indexes, Video}

/** Incremental video scene-index maintenance: append each micro-batch of
  * NEW videos' scene-hash signatures into a persisted
  * [[Video.ensureSceneIndex]] asset without re-decoding the corpus — the
  * video twin of [[MediaIndexStream]]/[[AudioIndexStream]]. A
  * continuously-ingesting media corpus keeps its near-dup verdicts exact
  * without ever re-publishing the whole asset.
  *
  * Discipline: the index's source of truth is the distinct (doc_id,
  * dhash) signature table (`sig/` — a pure function of the video's
  * payload, so replayed batches are bit-identical). An upsert decodes
  * ONLY the batch and writes its sig rows under `delta/batch_id=N`,
  * hash-bucket-partitioned exactly like the base (a bucketed probe prunes
  * delta trees as it prunes the base) — idempotent per batch. The six
  * derived tables (`dfs/ sizes/ rsig/ rdfs/ rsizes/ members/`) stay the build-time
  * aggregates; LIVE views re-derive each from the exactly-once sig view
  * while deltas are outstanding — pure hash-row aggregation (two-column
  * rows), never a frame DECODE — so dedup/ingest verdicts over the
  * stream-grown index are exact at any moment.
  *
  * Compaction ([[maybeCompact]]) folds `delta/` into `sig/` when delta
  * rows exceed `maxDeltaFraction` of base rows, re-derives all six
  * aggregates from the merged table, and publishes atomically via the
  * crash-safe journaled swap ([[Indexes.commitSwap]]); a batch replayed
  * AFTER compaction folded it re-lands in `delta/` with bit-identical
  * rows, and the next fold's full-row `distinct()` restores exactly-once
  * — no ledger needed.
  */
object VideoIndexStream {

  /** Distinct (doc_id, dhash) signature rows, base ∪ outstanding deltas,
    * exactly-once view (distinct over the pure-function rows).
    */
  def readSig(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    val base = spark.read.parquet(s"$dir/sig").select(col("doc_id"), col("dhash"))
    if (!new java.io.File(s"$dir/delta").exists()) base
    else
      base
        .unionByName(
          spark.read.parquet(s"$dir/delta").select(col("doc_id"), col("dhash"))
        )
        .distinct()
  }

  private def hasDelta(dir: String): Boolean =
    new java.io.File(s"$dir/delta").exists()

  /** LIVE per-scene-hash document frequencies (the hot-scene cap input). */
  def readDfs(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/dfs").select(col("dhash"), col("df"))
    else Video.sigDfs(readSig(spark, dir))
  }

  /** LIVE per-video signature sizes. */
  def readSizes(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/sizes").select(col("doc_id"), col("n"))
    else Video.sigSizes(readSig(spark, dir))
  }

  /** LIVE distinct-signature representative sig rows. While deltas are
    * outstanding the collapse is re-derived from the exactly-once sig view
    * — NOT merged rep-side (a delta video identical to a corpus video must
    * JOIN its group, and a replayed batch must not create a second rep).
    */
  def readRepSig(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/rsig").select(col("rid"), col("dhash"))
    else Video.repSig(readSig(spark, dir))
  }

  /** LIVE rep-level document frequencies. */
  def readRepDfs(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/rdfs").select(col("dhash"), col("df"))
    else
      readRepSig(spark, dir).groupBy(col("dhash")).agg(count(lit(1)).as("df"))
  }

  /** LIVE rep-level signature sizes. */
  def readRepSizes(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/rsizes").select(col("rid"), col("n"))
    else readRepSig(spark, dir).groupBy(col("rid")).agg(count(lit(1)).as("n"))
  }

  /** LIVE member→rep routing (one row per video). While deltas are
    * outstanding the collapse is re-derived from the exactly-once sig
    * view, so streamed videos route into their groups (and a streamed
    * twin of a corpus video joins that video's group, never forks one).
    */
  def readMembers(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir)) spark.read.parquet(s"$dir/members").select(col("doc_id"), col("rid"))
    else Video.memberMap(readSig(spark, dir))
  }

  /** Every collapse-side read view of the index, derived ONCE per call:
    * with no outstanding delta these are plain persisted scans; with
    * deltas, the exactly-once sig view is PINNED and members/rep-sig/
    * rep-sizes/dfs all derive from that one frame plus one pinned
    * fingerprint aggregation — a consumer taking the views individually
    * ([[readMembers]], [[readRepSig]], …) would re-run the base ∪ delta
    * union and the md5 collapse once per view.
    */
  case class RepViews(
      members: DataFrame, // (doc_id, rid)
      rsig: DataFrame, // (rid, dhash)
      rsizes: DataFrame, // (rid, n)
      dfs: DataFrame // (dhash, df) — member-level
  )

  def repViews(spark: SparkSession, dir: String): RepViews = {
    Indexes.recoverSwap(dir)
    if (!hasDelta(dir))
      RepViews(
        spark.read.parquet(s"$dir/members").select(col("doc_id"), col("rid")),
        spark.read.parquet(s"$dir/rsig").select(col("rid"), col("dhash")),
        spark.read.parquet(s"$dir/rsizes").select(col("rid"), col("n")),
        spark.read.parquet(s"$dir/dfs").select(col("dhash"), col("df"))
      )
    else {
      val sig = readSig(spark, dir).localCheckpoint()
      val mem = Video.memberMap(sig).localCheckpoint()
      val rsig = Video.rsigOf(sig, mem)
      RepViews(
        mem,
        rsig,
        rsig.groupBy(col("rid")).agg(count(lit(1)).as("n")),
        Video.sigDfs(sig)
      )
    }
  }

  /** Fold `delta/` into the base iff accumulated delta rows exceed
    * `maxDeltaFraction` of base rows. Returns true iff compaction ran.
    */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    if (!hasDelta(dir)) false
    else {
      val base = spark.read.parquet(s"$dir/sig").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compactDeltas(spark, dir)
      due
    }
  }

  /** Merge base ∪ delta sig rows (full-row distinct = exactly-once),
    * re-derive all six aggregates, publish the seven tables via the
    * crash-safe journaled swap — sig and its aggregates always come from
    * the same generation.
    */
  def compactDeltas(spark: SparkSession, dir: String): Unit = {
    if (hasDelta(dir)) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      val sig = readSig(spark, dir).localCheckpoint()
      sig
        .withColumn("hb", pmod(xxhash64(col("dhash")), lit(16L)))
        .write
        .mode("overwrite")
        .partitionBy("hb")
        .parquet(s"$dir/sig.compact-$stamp")
      Video.sigDfs(sig).write.mode("overwrite").parquet(s"$dir/dfs.compact-$stamp")
      Video.sigSizes(sig).write.mode("overwrite").parquet(s"$dir/sizes.compact-$stamp")
      // one fp aggregation feeds both members and the rep collapse
      val mem = Video.memberMap(sig).localCheckpoint()
      val rsig = Video.rsigOf(sig, mem).localCheckpoint()
      rsig.write.mode("overwrite").parquet(s"$dir/rsig.compact-$stamp")
      rsig
        .groupBy(col("dhash"))
        .agg(count(lit(1)).as("df"))
        .write
        .mode("overwrite")
        .parquet(s"$dir/rdfs.compact-$stamp")
      rsig
        .groupBy(col("rid"))
        .agg(count(lit(1)).as("n"))
        .write
        .mode("overwrite")
        .parquet(s"$dir/rsizes.compact-$stamp")
      mem.write.mode("overwrite").parquet(s"$dir/members.compact-$stamp")
      Indexes.commitSwap(
        dir,
        stamp,
        Seq("sig", "dfs", "sizes", "rsig", "rdfs", "rsizes", "members")
      )
    }
  }

  /** One micro-batch of (doc_id, ...) video rows → decoded, scene-hashed,
    * appended under `dir/delta/batch_id=<id>` (hash-bucket-partitioned
    * like the base), then the [[maybeCompact]] policy settles the delta
    * debt (compactAt <= 0 disables). Only the batch is decoded — the
    * corpus-linear cost is never re-paid.
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      compactAt: Double = 0.2
  ): Unit = {
    val spark = batch.sparkSession
    Video
      .decodeSig(spark, batch)
      .withColumn("hb", pmod(xxhash64(col("dhash")), lit(16L)))
      .write
      .mode("overwrite")
      .partitionBy("hb")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0.0) maybeCompact(spark, dir, compactAt)
  }

  /** foreachBatch writer over a video-document stream. Start with
    * `.trigger(...).option("checkpointLocation", ...)`.
    */
  def sceneUpsert(
      videosStream: DataFrame,
      dir: String,
      compactAt: Double = 0.2
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    videosStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(batch, dir, batchId, compactAt)
    }
}
