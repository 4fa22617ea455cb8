package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis, TextIndex}
import graft.streaming.TextIndexStream

/** Incremental inverted-index maintenance: delta append, debt-policy
  * compaction with atomic swap + stats refresh, and replay exactly-once —
  * the text twin of the VectorIndexStream contract in StreamingSpec.
  */
class TextIndexStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def postingsSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select(col("term"), col("doc_id").cast("long"), col("tf").cast("long"))
      .as[(String, Long, Long)]
      .collect()
      .toSet

  test("delta upsert + threshold compaction + stats refresh + replay exactly-once") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    val base = docs.filter(col("doc_id") < n / 2)
    val slice1 = docs.filter(col("doc_id") >= n / 2 && col("doc_id") < n / 2 + 2)
    val slice2 = docs.filter(col("doc_id") >= n / 2 + 2)

    val dir = java.nio.file.Files.createTempDirectory("graft_txt_idx").toString + "/idx"
    TextIndex.ensureBuilt(base, dir)
    val baseRows = spark.read.parquet(s"$dir/postings").count()

    // batch 0: two docs — their postings sit under delta/batch_id=0 unless
    // the debt policy fires (assert the policy itself, measured not guessed)
    TextIndexStream.upsertBatch(slice1, dir, batchId = 0L, compactAt = 0.2)
    val d0 = TextAnalysis.invertedIndex(slice1).count()
    if (d0 < 0.2 * baseRows)
      assert(new java.io.File(s"$dir/delta").exists(), "below threshold: delta must persist")
    // base ∪ delta must equal a fresh index over base ∪ slice1 regardless
    assert(
      postingsSet(TextIndexStream.readPostings(spark, dir)) ===
        postingsSet(TextAnalysis.invertedIndex(base.unionByName(slice1)))
    )

    // batch 1: the rest — pushes delta debt over 20% of base, folds, and
    // the folded tree equals a fresh index over ALL docs
    TextIndexStream.upsertBatch(slice2, dir, batchId = 1L, compactAt = 0.2)
    assert(!new java.io.File(s"$dir/delta").exists(), "threshold crossed: delta must fold")
    assert(
      postingsSet(spark.read.parquet(s"$dir/postings")) ===
        postingsSet(TextAnalysis.invertedIndex(docs))
    )

    // stats refreshed from the merged postings: every indexed doc counted,
    // and the top bigram equals the corpus-wide recomputation
    assert(TextIndex.nDocs(spark, dir) === n)
    val freshTop = {
      val toks = docs.select(
        col("doc_id"),
        posexplode(graft.operators.Text.tokensAll(col("text"))).as(Seq("pos", "term"))
      )
      val r = toks
        .as("a")
        .join(toks.as("b"), col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
        .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2"))
        .limit(1)
        .head()
      (r.getString(0), r.getString(1))
    }
    assert(TextIndex.topBigram(spark, dir) === freshTop)

    // REPLAY of the already-folded batch 1: re-lands in delta with
    // bit-identical rows; an explicit fold's distinct() restores
    // exactly-once — postings unchanged
    TextIndexStream.upsertBatch(slice2, dir, batchId = 1L, compactAt = 0.0)
    assert(new java.io.File(s"$dir/delta").exists(), "replayed batch re-lands in delta")
    TextIndexStream.compactDeltas(spark, dir)
    assert(
      postingsSet(spark.read.parquet(s"$dir/postings")) ===
        postingsSet(TextAnalysis.invertedIndex(docs)),
      "replay + compaction must be exactly-once"
    )

    // the maintained index still answers searches through the pruned path
    val (w1, w2) = TextIndex.topBigram(spark, dir)
    val viaIndex = TextIndex
      .phraseSearchIndexed(spark, dir, w1, w2)
      .select(col("doc_id").cast("long"), col("pos").cast("long"))
      .as[(Long, Long)]
      .collect()
      .toSet
    val fresh = TextAnalysis
      .phraseSearch(TextAnalysis.invertedIndex(docs), w1, w2)
      .select(col("doc_id").cast("long"), col("pos").cast("long"))
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(viaIndex === fresh)
  }
}
