package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.MediaIndexStream

/** Incremental image-dedup-index maintenance: delta append, live merged
  * rep view, debt-policy compaction with atomic swap, and replay
  * exactly-once — the media twin of the TextIndexStream contract.
  */
class MediaIndexStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def repsSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("dhash"), col("rid"), col("n").cast("long"))
      .as[(Long, Long, Long)]
      .collect()
      .toSet

  private def freshReps(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    repsSet(
      Multimodal
        .dHash(spark, Multimodal.withImagePayload(spark, docs))
        .toDF()
        .groupBy(col("dhash"))
        .agg(min(col("doc_id")).as("rid"), count(lit(1)).as("n"))
    )

  test("delta upsert + live rep merge + threshold compaction + replay exactly-once") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    val base = docs.filter(col("doc_id") < n / 2)
    val slice1 = docs.filter(col("doc_id") >= n / 2 && col("doc_id") < n / 2 + 3)
    val slice2 = docs.filter(col("doc_id") >= n / 2 + 3)

    val dir = java.nio.file.Files.createTempDirectory("graft_media_idx").toString + "/idx"
    Multimodal.ensureDhashIndex(spark, base, dir)
    val baseRows = spark.read.parquet(s"$dir/docs").count()
    assert(baseRows === base.count(), "docs/ holds one row per corpus document")

    // batch 0: three docs — below the 20% debt threshold, so the delta
    // persists, and the LIVE rep view must equal a fresh recompute over
    // base ∪ slice1 (min rid, summed counts across base and delta)
    MediaIndexStream.upsertBatch(slice1, dir, batchId = 0L, compactAt = 0.2)
    assert(new java.io.File(s"$dir/delta").exists(), "below threshold: delta must persist")
    assert(repsSet(MediaIndexStream.readReps(spark, dir)) === freshReps(base.unionByName(slice1)))

    // the live band view carries the same merged reps (band expansion of them)
    val bandReps = MediaIndexStream
      .readBands(spark, dir)
      .select(col("dhash"), col("rid"), col("n"))
      .distinct()
    assert(repsSet(bandReps) === freshReps(base.unionByName(slice1)))

    // replaying batch 0 (same content, same id) changes nothing
    MediaIndexStream.upsertBatch(slice1, dir, batchId = 0L, compactAt = 0.2)
    assert(repsSet(MediaIndexStream.readReps(spark, dir)) === freshReps(base.unionByName(slice1)))

    // batch 1: the rest — pushes delta debt over 20% of base, folds, and
    // the folded asset equals a fresh build over ALL docs
    MediaIndexStream.upsertBatch(slice2, dir, batchId = 1L, compactAt = 0.2)
    assert(!new java.io.File(s"$dir/delta").exists(), "threshold crossed: delta must fold")
    assert(repsSet(spark.read.parquet(s"$dir/reps")) === freshReps(docs))
    assert(spark.read.parquet(s"$dir/docs").count() === n)

    // a batch replayed AFTER compaction folded it re-lands in delta/ with
    // bit-identical per-doc rows; the next fold's distinct() restores
    // exactly-once — reps identical before and after
    MediaIndexStream.upsertBatch(slice2, dir, batchId = 1L, compactAt = 0.0)
    assert(new java.io.File(s"$dir/delta").exists(), "replayed batch re-lands in delta")
    assert(repsSet(MediaIndexStream.readReps(spark, dir)) === freshReps(docs),
      "live view stays exact under post-compaction replay")
    MediaIndexStream.compactDeltas(spark, dir)
    assert(repsSet(spark.read.parquet(s"$dir/reps")) === freshReps(docs),
      "fold after replay must not double-count")
    assert(spark.read.parquet(s"$dir/docs").count() === n)
  }
}
