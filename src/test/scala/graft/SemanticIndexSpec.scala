package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SemanticIndex, Similarity}

/** The amortization contract of [[SemanticIndex]]: reading the persisted
  * quantizer state is BIT-IDENTICAL to a fresh derivation (so the oracle
  * gate cannot tell them apart), the asset is stale-proof under corpus
  * edits, and the streaming ingest face flags batches deterministically
  * and replay-idempotently.
  */
class SemanticIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def keptSet(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Boolean)] =
    df.select(col("vec_id").cast("long"), col("cell").cast("long"), col("kept"))
      .as[(Long, Long, Boolean)]
      .collect()
      .toSeq
      .sorted

  test("amortized dedup is bit-identical to the fresh derivation") {
    val emb = Tables.embeddings(spark, sf)
    val fresh = Similarity
      .semanticDedupScaled(emb, threshold = 0.35, targetCellSize = 50, maxCellSize = 100)
    val amortized = SemanticIndex
      .dedup(sf, emb, threshold = 0.35, targetCellSize = 50, maxCellSize = 100)
    assert(keptSet(amortized) === keptSet(fresh))
    // second call must reuse the published asset (same fingerprint dir,
    // marker present) — the steady-state read path
    val dir = SemanticIndex.defaultDir(sf, emb, targetCellSize = 50, maxCellSize = 100)
    assert(new java.io.File(s"$dir/celled/_SUCCESS").exists(), s"no published asset at $dir")
    assert(keptSet(SemanticIndex.dedup(sf, emb, 0.35, 50, 100)) === keptSet(fresh))
  }

  test("fingerprint is stale-proof: an in-place corpus edit maps to a new asset") {
    val emb = Tables.embeddings(spark, sf)
    val edited = emb.withColumn(
      "embedding",
      when(col("vec_id") === 0, reverse(col("embedding"))).otherwise(col("embedding"))
    )
    assert(
      SemanticIndex.defaultDir(sf, emb, 50, 100) !== SemanticIndex.defaultDir(sf, edited, 50, 100),
      "same ids + changed payload must not reuse the old index"
    )
  }

  test("streaming ingest face: deterministic flags, replay-idempotent batches") {
    import graft.util.Cols.md5Long
    val emb = Tables.embeddings(spark, sf)
    val bkt = pmod(md5Long(concat(col("vec_id").cast("string"), lit("#delta"))), lit(100))
    val withB = emb.withColumn("bkt", bkt)
    val delta = withB.filter(col("bkt") < 10).drop("bkt")
    val corpus = withB.filter(col("bkt") >= 10).drop("bkt")
    val out = java.nio.file.Files.createTempDirectory("graft_sem_stream").toString + "/flags"

    graft.streaming.SemanticStream.flagBatch(delta, sf, corpus, out, 0L, threshold = 0.30)
    val batchRead = spark.read.parquet(s"$out/batch_id=0")
    // the stream flags agree row-for-row with the batch operator
    val expect = Similarity
      .semanticDeltaDupsScaled(delta, corpus, 0.30, targetCellSize = 50, maxCellSize = 100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(
        col("vec_id").cast("long"),
        col("cell").cast("long"),
        col("n_dups").cast("long"),
        col("is_unique")
      ).as[(Long, Long, Long, Boolean)].collect().toSeq.sorted
    assert(rows(batchRead) === rows(expect.withColumn("is_unique", col("is_unique"))))
    assert(batchRead.filter(col("is_dup") === col("is_unique")).count() === 0L)

    // REPLAY: the same batch id overwrites its own directory with
    // bit-identical rows — corpus untouched, no duplicate flag rows
    graft.streaming.SemanticStream.flagBatch(delta, sf, corpus, out, 0L, threshold = 0.30)
    assert(rows(spark.read.parquet(s"$out/batch_id=0")) === rows(expect))
    assert(spark.read.parquet(out).count() === delta.count())
  }

  private def cellRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)]
      .collect()
      .toSet

  test("asset fold: frozen-cell delta assignment, then compaction bit-equals a wholesale build") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter(col("vec_id") % 7 =!= 3)
    val growth = emb.filter(col("vec_id") % 7 === 3)
    val baseDir = SemanticIndex.defaultDir(sf, corpus0, 50, 100)
    SemanticIndex.ensureBuilt(corpus0, baseDir, 50, 100)
    val dir = s"target/test_sem_fold/${System.nanoTime()}/idx"
    graft.operators.Indexes.copyDir(baseDir, dir)
    val baseCells = cellRows(spark.read.parquet(s"$dir/celled"))

    // PRE-compaction: delta lands under frozen seeds, base untouched,
    // live view = base ∪ frozen-assigned growth
    SemanticIndex.upsertBatch(growth, dir, batchId = 0L, 50, 100, compactAt = 0.0)
    val live = cellRows(SemanticIndex.readCellsLive(spark, dir))
    assert(cellRows(spark.read.parquet(s"$dir/celled")) === baseCells, "base frozen during ingest")
    assert(live.map(_._1) === cellRows(spark.read.parquet(s"$dir/celled")).map(_._1) ++
      growth.select(col("vec_id")).as[Long].collect().toSet)
    // REPLAY exactly-once: same batch id re-landed changes nothing
    SemanticIndex.upsertBatch(growth, dir, batchId = 0L, 50, 100, compactAt = 0.0)
    assert(cellRows(SemanticIndex.readCellsLive(spark, dir)) === live)

    // COMPACTION: rebuild-from-union must be BIT-EQUAL to the wholesale
    // build on the grown corpus (celled + seeds + counts)
    SemanticIndex.compactDeltas(spark, dir, 50, 100)
    assert(!new java.io.File(s"$dir/delta").exists(), "folded delta retired")
    val wholeDir = SemanticIndex.defaultDir(sf, emb, 50, 100)
    SemanticIndex.ensureBuilt(emb, wholeDir, 50, 100)
    assert(
      cellRows(spark.read.parquet(s"$dir/celled")) ===
        cellRows(spark.read.parquet(s"$wholeDir/celled")),
      "folded celled table == wholesale build"
    )
    def seedRows(d: String) = spark.read
      .parquet(s"$d/seeds")
      .select(col("cell"), col("centroid"))
      .as[(Long, Seq[Double])]
      .collect()
      .toSet
    assert(seedRows(dir) === seedRows(wholeDir), "re-derived seeds == wholesale seeds")
    def countRows(d: String) = spark.read
      .parquet(s"$d/counts")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(countRows(dir) === countRows(wholeDir), "re-derived counts == wholesale counts")
    // and a replay AFTER compaction re-lands in delta/, then the next
    // fold's dedup restores exactly-once
    SemanticIndex.upsertBatch(growth, dir, batchId = 0L, 50, 100, compactAt = 0.0)
    SemanticIndex.compactDeltas(spark, dir, 50, 100)
    assert(
      cellRows(spark.read.parquet(s"$dir/celled")) ===
        cellRows(spark.read.parquet(s"$wholeDir/celled")),
      "post-compaction replay folds away"
    )
  }
}
