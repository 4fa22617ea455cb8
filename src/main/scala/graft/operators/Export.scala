package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus EXPORT: the delivery artifact at the end of the data
  * pipeline — token-budget-packed training sequences materialized as
  * size-bounded shards plus a per-shard integrity MANIFEST, published
  * under the [[Indexes]] fingerprint + atomic-rename contract.
  *
  * Layout under `dir`:
  *
  *   - `shards/source=<s>/shard=<n>/...` — one row per packed training
  *     sequence: (pack_id, n_docs, pack_tokens, seq_text, seq_md5), the
  *     member documents' texts concatenated in doc_id order
  *     ([[Split.packSequences]] assignment — sharded prefix sum, no
  *     global window). Directory-partitioned by (source, shard): a
  *     trainer's data loader lists one shard directory per task, and a
  *     per-source re-export touches only that source's directories.
  *   - `manifest/` — one row per shard: pack/doc/token counts plus
  *     `content_md5`, the md5 of the member packs' seq_md5 values in
  *     pack order. Written LAST (completion marker): a manifest row
  *     testifies its shard's bytes are complete — the reader-side
  *     integrity check after a copy, and the diff key between two
  *     export versions (same idea as [[graft.sources.Versioned]]
  *     manifests, at shard granularity).
  *
  * Scale shape: packing is the two-level prefix sum (no global window),
  * shard assignment is integer arithmetic on pack_id, both aggregates
  * are partial-aggregable, and the shard write is one hash-partitioned
  * exchange. Nothing corpus-sized crosses the driver.
  */
object TrainExport {

  /** Tokens per packed training sequence (the q_pack_* budget). */
  val SeqBudget = 256

  /** Packed sequences per output shard: bounds shard file size the way a
    * WebDataset/TFRecord shard byte budget would. Small here so the
    * fixture corpus produces a multi-shard, multi-source layout; at 100 TB
    * this is thousands of packs per shard — same arithmetic.
    */
  val PacksPerShard = 4

  def defaultDir(sfDir: String, docs: DataFrame): String =
    Indexes.fingerprintDirOn("train-export", sfDir, docs, "doc_id", "text")

  /** The packed-sequence table: (source, pack_id, shard, n_docs,
    * pack_tokens, first_doc, seq_text, seq_md5).
    */
  private def packedSeqs(docs: DataFrame): DataFrame = {
    val packed = Split.packSequences(
      docs.select(
        col("doc_id"),
        col("source"),
        col("text"),
        size(graft.operators.Text.tokensAll(col("text"))).as("n_tokens")
      ),
      "doc_id",
      "source",
      col("n_tokens"),
      budget = SeqBudget
    )
    packed
      .groupBy(col("source"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        concat_ws(
          "\n\n",
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            e => e.getField("text")
          )
        ).as("seq_text")
      )
      .withColumn("seq_md5", md5(col("seq_text")))
      .withColumn("shard", expr(s"pack_id div ${PacksPerShard.toLong}"))
  }

  /** Build once per corpus version; no-op when `dir` holds a completed
    * export. Shards first, manifest last (completion marker).
    */
  def ensureBuilt(docs: DataFrame, dir: String): Unit =
    Indexes.atomicBuild(dir, "manifest/_SUCCESS") { tmp =>
      val seqs = packedSeqs(docs)
      seqs
        .repartition(col("source"), col("shard"))
        .sortWithinPartitions(col("source"), col("shard"), col("pack_id"))
        .write
        .mode("overwrite")
        .partitionBy("source", "shard")
        .parquet(s"$tmp/shards")
      // manifest derived from the WRITTEN shards, not the in-memory plan:
      // it certifies the bytes on disk
      val spark = docs.sparkSession
      spark.read
        .parquet(s"$tmp/shards")
        .groupBy(col("source"), col("shard"))
        .agg(
          count(lit(1)).as("n_packs"),
          sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("pack_tokens")).cast("long").as("total_tokens"),
          md5(
            concat_ws(
              "",
              transform(
                array_sort(collect_list(struct(col("pack_id"), col("seq_md5")))),
                e => e.getField("seq_md5")
              )
            )
          ).as("content_md5")
        )
        .write
        .mode("overwrite")
        .parquet(s"$tmp/manifest")
    }

  /** The shard manifest — the export's table of contents. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/manifest")

  /** One shard's packed sequences, partition-pruned (a data-loader task's
    * read: only `source=<s>/shard=<n>` is listed).
    */
  def shard(spark: SparkSession, dir: String, source: String, shardId: Long): DataFrame =
    spark.read
      .parquet(s"$dir/shards")
      .filter(col("source") === source && col("shard") === shardId)

  /** Shard-level diff between two export versions — the COPY PLAN for
    * publishing version B where version A is already distributed: `same`
    * shards (content_md5 equal) are skipped, `changed`/`added` shards are
    * the upload set, `removed` shards are deleted. Manifest-only: the
    * diff never touches shard bytes, so it costs 2·|shards| rows however
    * big the export is — the same economics as [[graft.operators]]
    * snapshot diffing, applied to the delivery artifact.
    */
  def diffManifests(oldMan: DataFrame, newMan: DataFrame): DataFrame = {
    val o = oldMan.select(
      col("source"),
      col("shard").cast("long").as("shard"),
      col("content_md5").as("old_md5")
    )
    val n = newMan.select(
      col("source"),
      col("shard").cast("long").as("shard"),
      col("content_md5").as("new_md5")
    )
    o.join(n, Seq("source", "shard"), "full_outer")
      .select(
        col("source"),
        col("shard"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") === col("new_md5"), "same")
          .otherwise("changed")
          .as("status")
      )
  }
}
