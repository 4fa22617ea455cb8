package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Indexes, TextAnalysis, TextIndex}

/** Incremental inverted-index maintenance: append each micro-batch of NEW
  * documents' postings into a persisted [[TextIndex]] without rewriting
  * the base — the text-side twin of [[VectorIndexStream]].
  *
  * Discipline: the index LAYOUT (term-hash bucketing, within-bucket sort)
  * is fixed at build time; an upsert tokenizes only the batch and writes
  * its postings under `delta/batch_id=N/tb=...` — idempotent per batch (a
  * replayed batch overwrites only its own directory), bucket-partitioned
  * so a phrase/ranked query prunes delta trees exactly as it prunes the
  * base. Postings are a pure function of (doc_id, text), so replayed rows
  * are bit-identical and compaction's full-row `distinct()` restores
  * exactly-once — the [[VectorIndexStream]] frozen-quantizer argument,
  * with determinism coming from tokenization instead of frozen codebooks.
  *
  * Compaction ([[maybeCompact]]) is the same debt policy: fold `delta/`
  * into `postings/` when delta rows exceed `maxDeltaFraction` of base
  * rows, bounding search-path read amplification (a union branch + file
  * listing per surviving batch) at that fraction; the fold also refreshes
  * the index statistics (top bigram, indexed-doc count) from the merged
  * postings — bounded index-only aggregates, never a corpus re-scan.
  */
object TextIndexStream {

  /** Base ∪ delta postings with the same schema the base read yields —
    * what a search over a delta-carrying index consumes.
    */
  def readPostings(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    val base = spark.read
      .parquet(s"$dir/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("positions"), col("dl"), col("tb"))
    if (!new java.io.File(s"$dir/delta").exists()) base
    else
      base.unionByName(
        spark.read
          .parquet(s"$dir/delta")
          .select(col("term"), col("doc_id"), col("tf"), col("positions"), col("dl"), col("tb"))
      )
  }

  /** Fold `delta/` into `postings/` iff accumulated delta rows exceed
    * `maxDeltaFraction` of base rows. Returns true iff compaction ran.
    */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    if (!new java.io.File(s"$dir/delta").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/postings").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compactDeltas(spark, dir)
      due
    }
  }

  /** Merge base ∪ delta into a fresh partitioned-sorted postings tree,
    * recompute the statistics (`top_bigram/`, `stats/`) from the SAME
    * merged frame, and publish all three via the crash-safe journaled
    * swap ([[Indexes.commitSwap]]): everything is fully written before
    * the journal commit point, and a process death mid-flip is finished
    * by the next reader's [[Indexes.recoverSwap]] — postings and stats
    * always come from the same generation, and the index is never left
    * without a `postings/` across a restart. A batch replayed AFTER
    * compaction folded it re-lands in `delta/` with bit-identical rows;
    * the next fold's `distinct()` de-duplicates them — exactly-once
    * without a ledger.
    *
    * The refreshed doc count is the number of INDEXED documents (>= 1
    * posting); identical to the build-time corpus count whenever every
    * document tokenizes (as in the fixtures), and the honest ranking
    * denominator for a stream-grown index either way.
    */
  def compactDeltas(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$dir/delta").exists()) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      val merged = readPostings(spark, dir).distinct().localCheckpoint()
      merged
        .repartition(col("tb"))
        .sortWithinPartitions(col("tb"), col("term"), col("doc_id"))
        .write
        .mode("overwrite")
        .partitionBy("tb")
        .parquet(s"$dir/postings.compact-$stamp")
      val toks =
        merged.select(col("term"), col("doc_id"), explode(col("positions")).as("pos"))
      toks
        .as("a")
        .join(
          toks.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1
        )
        .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2"))
        .limit(1)
        .write
        .mode("overwrite")
        .parquet(s"$dir/top_bigram.compact-$stamp")
      // refreshed totals for the stream-grown index: indexed-doc count +
      // total token mass (sum of tfs — the BM25 avgdl numerator), both
      // from the SAME merged frame as the postings rewrite
      val totalLen =
        merged.agg(coalesce(sum(col("tf")), lit(0L)).cast("long")).head().getLong(0)
      Seq((merged.select(col("doc_id")).distinct().count(), totalLen))
        .toDF("n_docs", "total_len")
        .write
        .mode("overwrite")
        .parquet(s"$dir/stats.compact-$stamp")
      Indexes.commitSwap(dir, stamp, Seq("postings", "top_bigram", "stats"))
    }
  }

  /** One micro-batch of (doc_id, text) rows → tokenized, bucketed,
    * appended under `dir/delta/batch_id=<id>`, then the [[maybeCompact]]
    * policy settles the delta debt (compactAt <= 0 disables).
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      compactAt: Double = 0.2,
      nBuckets: Int = TextIndex.DefaultBuckets
  ): Unit = {
    // batch docs are whole, so their length norms are computable from the
    // batch alone — the delta carries the same (… , dl) schema as the base
    val idx = TextAnalysis.invertedIndex(batch).localCheckpoint()
    val dl = idx.groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("dl"))
    idx
      .join(dl, Seq("doc_id"))
      .withColumn("tb", TextIndex.bucketOf(col("term"), nBuckets))
      .repartition(col("tb"))
      .sortWithinPartitions(col("tb"), col("term"), col("doc_id"))
      .write
      .mode("overwrite")
      .partitionBy("tb")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0.0) maybeCompact(batch.sparkSession, dir, compactAt)
  }

  /** foreachBatch writer over a (doc_id, text) stream. Start with
    * `.trigger(...).option("checkpointLocation", ...)`.
    */
  def postingsUpsert(
      docsStream: DataFrame,
      dir: String,
      compactAt: Double = 0.2
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      upsertBatch(batch, dir, batchId, compactAt)
    }
}
