package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilterAgg
import graft.operators.Dedup

/** Streaming ingest dedup through a BLOOM FILTER maintained as per-batch
  * OR-merged partials — the bounded-state complement of
  * [[EventStreams.streamingDedup]].
  *
  * Exact streaming dedup keeps one state entry per key: at 100 TB the
  * standing corpus' key set dwarfs any state store, and watermark TTL
  * (the usual bound) forgets old keys — a re-crawl of last year's page
  * sails through. This filter is O(numBits) FOREVER, at the price of a
  * quantified false-positive rate: a positive may drop a genuinely new
  * doc (rate sized by bits/key), a negative is guaranteed new. That's
  * the right trade for an ingest PRE-FILTER: definite-new docs flow on
  * without touching the corpus; the small candidate stream can be
  * exact-verified downstream ([[Dedup.bloomDeltaDups]]' verify join)
  * when zero loss matters.
  *
  * Mechanics mirror [[SketchStream]]: each batch writes its own O(bits)
  * partial to `dir/bloom/batch_id=N` (overwrite → replay-idempotent),
  * annotates its docs against the OR-merge of all PRIOR partials, and
  * appends survivors to `dir/accepted/batch_id=N`. The merged filter is
  * a few KB however large the corpus — reading a year of partials is a
  * bounded distributed bit_or.
  */
object BloomStream {

  /** Normalized content key — the same construction as [[Dedup.exactDups]],
    * so batch and streaming dedup agree on what "the same document" means.
    */
  def contentKey: Column = md5(Dedup.normText(col("text")))

  /** Canonical-URL key: the streaming form of the `u_frontier_bloom`
    * gate — "have we already fetched this URL?" answered incrementally,
    * one O(bits) partial per micro-batch of fetches. Keyed on the
    * NORMALIZED url so case/port/tracking-param variants of a fetched
    * page are blocked before a second fetch.
    */
  def urlKey: Column = md5(graft.operators.Urls.normalizeUrl(col("url")))

  /** foreachBatch writer: per-batch Bloom partial + prior-filter ingest
    * gate. Start with `.trigger(...).option("checkpointLocation", ...)`.
    *
    * `key` picks what "already seen" means — [[contentKey]] (default,
    * normalized document text) for ingest dedup, [[urlKey]] for a crawl
    * frontier, any md5-shaped Column for payload hashes etc. The Bloom
    * build / prior-gate / merge mechanics are key-agnostic.
    */
  def bloomIngest(
      docsStream: DataFrame,
      dir: String,
      numBits: Int = Dedup.BloomBits,
      numHashes: Int = Dedup.BloomHashes,
      key: Column = contentKey
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val keys = batch.select(col("doc_id"), key.as("h"))
      // gate against everything ingested BEFORE this batch (exclusive:
      // replaying batch N must see the same prior filter, so partials
      // from batches >= N are ignored — replay-deterministic)
      val prior = mergedFilter(spark, dir, numBits, beforeBatch = Some(batchId))
      val accepted = prior match {
        case None => keys
        case Some(words) =>
          import spark.implicits._
          val filt = Seq(Tuple1(words)).toDF("bf")
          keys
            .crossJoin(broadcast(filt))
            .filter(!BloomFilterAgg.mightContain(col("bf"), col("h"), numBits, numHashes))
            .drop("bf")
      }
      accepted.write
        .mode("overwrite")
        .parquet(s"$dir/accepted/batch_id=$batchId")
      keys
        .agg(BloomFilterAgg.bloom(col("h"), numBits, numHashes).as("bf"))
        .write
        .mode("overwrite")
        .parquet(s"$dir/bloom/batch_id=$batchId")
    }

  /** The corpus filter: bitwise OR of persisted batch partials
    * (optionally only those strictly before `beforeBatch`). Distributed
    * merge (posexplode → bit_or per word), one bounded O(bits/64)
    * collect. None when no partials exist yet.
    */
  def mergedFilter(
      spark: SparkSession,
      dir: String,
      numBits: Int = Dedup.BloomBits,
      beforeBatch: Option[Long] = None
  ): Option[Array[Long]] = {
    val path = s"$dir/bloom"
    if (!new java.io.File(path).exists()) return None
    val all = spark.read.parquet(path)
    val scoped = beforeBatch.fold(all)(b => all.filter(col("batch_id") < b))
    val words = scoped
      .select(posexplode(col("bf")).as(Seq("pos", "w")))
      .groupBy(col("pos"))
      .agg(bit_or(col("w")).as("w"))
      .orderBy(col("pos"))
      .collect()
    if (words.isEmpty) None
    else {
      val out = new Array[Long](numBits / 64)
      words.foreach(r => out(r.getInt(0)) = r.getLong(1))
      Some(out)
    }
  }
}
