package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted data-scaled quantizer state: the build-once/dedup-many form of
  * [[Similarity.semanticDedupScaled]] / [[Similarity.semanticDeltaDupsScaled]]
  * (and the two-level [[Similarity.hierCells]] variant).
  *
  * At 100 TB the quantizer is an ASSET, not a query step: seeds, coarse
  * counts and the celled corpus are derived once per corpus version, then
  * every dedup sweep and every day's ingest delta reads them. A query that
  * re-derives them pays three full corpus scans (count + seed sort +
  * assignment) per execution — the round-8 `d_semantic` regression was
  * exactly that cost. Same contract as [[IvfIndex]]/[[Pq]]:
  *
  *   - stale-proof location ([[Indexes.fingerprintDir]] — a corpus edited
  *     in place maps to a new directory, never a stale index);
  *   - atomic publication ([[Indexes.atomicBuild]] — concurrent builders
  *     race to one complete rename; training is deterministic so the
  *     loser's copy is identical and discarded).
  *
  * Layout under `dir`:
  *   - `celled/` — (vec_id, embedding, cell): the corpus with its FINAL
  *     (post-re-split) cell ids — the input [[Similarity.semanticDedupCore]]
  *     consumes directly;
  *   - `seeds/` — (cell, centroid): the k seed centroids (k = ceil(N/50)
  *     rows, the only driver-collected state at read time, O(k·dim));
  *   - `counts/` — (cell, cnt): COARSE cell counts, from which the delta
  *     path re-derives the salted split table (k rows, broadcastable).
  *
  * The build is the exact closed-form md5 construction the DuckDB oracle
  * replays, so reading the index yields bit-identical results to a fresh
  * derivation — the amortization is invisible to the correctness gate.
  */
object SemanticIndex {

  /** Quantizer params are part of the fingerprint: a changed target/max
    * cell size or literal-k is a different index layout, never a silent
    * reuse of the old one.
    */
  def defaultDir(
      sfDir: String,
      corpus: DataFrame,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): String =
    Indexes.fingerprintDir(
      "sem-cells", sfDir, corpus, s"t=$targetCellSize|m=$maxCellSize|k=$litK")

  def defaultDir2l(
      sfDir: String,
      corpus: DataFrame,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): String =
    Indexes.fingerprintDir(
      "sem-cells-2l", sfDir, corpus, s"t=$targetCellSize|m=$maxCellSize|k=$litK")

  /** Build the FLAT data-scaled quantizer state ([[Similarity.scaledCells]]'
    * construction, with the intermediate seeds/counts also published for
    * the delta path). No-op if `dir` already holds a completed build.
    */
  def ensureBuilt(
      corpus: DataFrame,
      dir: String,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): Unit =
    Indexes.atomicBuild(dir, "celled/_SUCCESS") { tmp =>
      val spark = corpus.sparkSession
      import spark.implicits._
      val emb = corpus.select(col("vec_id"), col("embedding")).cache()
      val k = Similarity.scaledK(emb.count(), targetCellSize)
      val cents = Similarity.seedCentroids(emb, k)
      val coarse = Similarity.assignCells(emb, cents, litK).localCheckpoint()
      emb.unpersist()
      val counts = Similarity.cellCounts(coarse)
      cents.toSeq
        .map { case (c, v) => (c, v.toSeq) }
        .toDF("cell", "centroid")
        .write
        .mode("overwrite")
        .parquet(s"$tmp/seeds")
      counts.write.mode("overwrite").parquet(s"$tmp/counts")
      Similarity
        .resplitCells(coarse, counts, k, maxCellSize)
        .write
        .mode("overwrite")
        .parquet(s"$tmp/celled")
    }

  /** Build the TWO-LEVEL quantizer state ([[Similarity.hierCells]]). Only
    * `celled/` is published: the hierarchical seeds are distributed state,
    * and the delta path rides the flat index.
    */
  def ensureBuilt2l(
      corpus: DataFrame,
      dir: String,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): Unit =
    Indexes.atomicBuild(dir, "celled/_SUCCESS") { tmp =>
      Similarity
        .hierCells(corpus, targetCellSize, maxCellSize, litK)
        .write
        .mode("overwrite")
        .parquet(s"$tmp/celled")
    }

  /** Steady-state [[Similarity.semanticDedupScaled]]: ensure the index,
    * then run the dedup core over the persisted celled corpus — the
    * quantizer derivation is amortized across executions.
    */
  def dedup(
      sfDir: String,
      corpus: DataFrame,
      threshold: Double,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256,
      keep: Similarity.KeepPolicy = Similarity.KeepPolicy.Central
  ): DataFrame = {
    val dir = defaultDir(sfDir, corpus, targetCellSize, maxCellSize, litK)
    ensureBuilt(corpus, dir, targetCellSize, maxCellSize, litK)
    Similarity.semanticDedupCore(readCelled(corpus.sparkSession, dir), threshold, keep)
  }

  /** Steady-state [[Similarity.semanticDedupHier]] over the persisted
    * two-level celled corpus.
    */
  def dedup2l(
      sfDir: String,
      corpus: DataFrame,
      threshold: Double,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256,
      keep: Similarity.KeepPolicy = Similarity.KeepPolicy.Central
  ): DataFrame = {
    val dir = defaultDir2l(sfDir, corpus, targetCellSize, maxCellSize, litK)
    ensureBuilt2l(corpus, dir, targetCellSize, maxCellSize, litK)
    Similarity.semanticDedupCore(readCelled(corpus.sparkSession, dir), threshold, keep)
  }

  /** Steady-state [[Similarity.semanticDeltaDupsScaled]]: the corpus side
    * (count, seed sort, assignment, split counts) comes entirely from the
    * persisted index — the delta pays only its own assignment against the
    * k-row seed table plus the within-cell candidate join. This is the
    * daily-ingest shape: zero corpus scans per delta.
    */
  def deltaDups(
      sfDir: String,
      delta: DataFrame,
      corpus: DataFrame,
      threshold: Double,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): DataFrame = {
    val spark = corpus.sparkSession
    val dir = defaultDir(sfDir, corpus, targetCellSize, maxCellSize, litK)
    ensureBuilt(corpus, dir, targetCellSize, maxCellSize, litK)
    val cents = spark.read
      .parquet(s"$dir/seeds")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val counts = spark.read.parquet(s"$dir/counts")
    Similarity.deltaDupsAgainst(
      delta,
      cents,
      counts,
      maxCellSize,
      readCelled(spark, dir),
      threshold,
      litK
    )
  }

  /** Steady-state [[Similarity.contaminationAgainst]]: semantic eval-
    * decontamination of a TRAIN corpus against a TEST set, riding the
    * train corpus's persisted quantizer — the test set pays only its own
    * assignment plus the within-cell candidate join, exactly the
    * [[deltaDups]] cost shape.
    */
  def contamination(
      sfDir: String,
      test: DataFrame,
      corpus: DataFrame,
      threshold: Double,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): DataFrame = {
    val spark = corpus.sparkSession
    val dir = defaultDir(sfDir, corpus, targetCellSize, maxCellSize, litK)
    ensureBuilt(corpus, dir, targetCellSize, maxCellSize, litK)
    val cents = spark.read
      .parquet(s"$dir/seeds")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val counts = spark.read.parquet(s"$dir/counts")
    Similarity.contaminationAgainst(
      test,
      cents,
      counts,
      maxCellSize,
      readCelled(spark, dir),
      threshold,
      litK
    )
  }

  /** The persisted celled corpus itself — for consumers of the quantizer
    * BLOCKING beyond dedup (e.g. [[Similarity.hardNegatives]] mining):
    * build-once like every other reader here, then a plain parquet read.
    */
  def cells(
      sfDir: String,
      corpus: DataFrame,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): DataFrame = {
    val dir = defaultDir(sfDir, corpus, targetCellSize, maxCellSize, litK)
    ensureBuilt(corpus, dir, targetCellSize, maxCellSize, litK)
    readCelled(corpus.sparkSession, dir)
  }

  private def readCelled(spark: SparkSession, dir: String): DataFrame = {
    Indexes.recoverSwap(dir)
    spark.read
      .parquet(s"$dir/celled")
      .select(col("cell"), col("vec_id"), col("embedding"))
  }

  // ---- streaming maintenance (the VectorIndexStream discipline) ----------

  /** LIVE celled view: base ∪ outstanding stream deltas, exactly-once via
    * the delta-probe union (the [[graft.streaming.SubstrIndexStream]]
    * recipe: a replayed batch's rows are bit-identical and can only live
    * in the debt-bounded delta, so set-exactness needs the corpus-sized
    * base only as a JOIN PROBE — never re-shuffled into an aggregate).
    */
  def readCellsLive(spark: SparkSession, dir: String): DataFrame = {
    val base = readCelled(spark, dir)
    if (!new java.io.File(s"$dir/delta").exists()) base
    else {
      val delta = spark.read
        .parquet(s"$dir/delta")
        .select(col("cell"), col("vec_id"), col("embedding"))
        .dropDuplicates("vec_id")
      val dupes = base.join(delta.select(col("vec_id")), Seq("vec_id"), "left_semi")
      val novel = delta.join(dupes, Seq("vec_id"), "left_anti")
      base.unionByName(novel)
    }
  }

  /** One micro-batch of NEW (vec_id, embedding) rows appended into the
    * persisted quantizer asset under `dir/delta/batch_id=<id>`: each
    * vector is assigned its argmax-cosine cell against the FROZEN seeds
    * and sub-salted by the FROZEN corpus split table — batch-sized work
    * against O(k·dim) driver state, zero corpus scans, idempotent per
    * batch (a replay overwrites its own directory with bit-identical
    * rows; assignment is deterministic closed-form). Cell GEOMETRY only
    * moves at compaction: [[compactDeltas]] REBUILDS the quantizer from
    * the union corpus (re-derived k, seeds, counts, re-split) — the
    * add-vs-train split of [[graft.streaming.VectorIndexStream]], with
    * "train" here being the deterministic seeded derivation, so the
    * folded asset is BIT-EQUAL to a wholesale [[ensureBuilt]] on the
    * grown corpus (`d_semantic_fold`'s gate).
    */
  def upsertBatch(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256,
      compactAt: Double = 0.2
  ): Unit = {
    val spark = batch.sparkSession
    Indexes.recoverSwap(dir)
    val cents = loadSeeds(spark, dir)
    val counts = spark.read.parquet(s"$dir/counts")
    val coarse = Similarity.assignCells(
      batch.select(col("vec_id"), col("embedding")),
      cents,
      litK
    )
    Similarity
      .resplitCells(coarse, counts, cents.length.toLong, maxCellSize)
      .write
      .mode("overwrite")
      .parquet(s"$dir/delta/batch_id=$batchId")
    if (compactAt > 0.0) {
      maybeCompact(spark, dir, targetCellSize, maxCellSize, litK, compactAt)
      ()
    }
  }

  /** Fold the delta iff accumulated delta rows exceed `maxDeltaFraction`
    * of base rows — the shared debt policy. Returns true iff it ran.
    */
  def maybeCompact(
      spark: SparkSession,
      dir: String,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256,
      maxDeltaFraction: Double = 0.2
  ): Boolean = {
    Indexes.recoverSwap(dir)
    if (!new java.io.File(s"$dir/delta").exists()) false
    else {
      val base = spark.read.parquet(s"$dir/celled").count()
      val delta = spark.read.parquet(s"$dir/delta").count()
      val due = delta > 0 && delta >= maxDeltaFraction * base
      if (due) compactDeltas(spark, dir, targetCellSize, maxCellSize, litK)
      due
    }
  }

  /** Rebuild the quantizer from the UNION corpus (base celled rows ∪
    * delta rows — both carry the embedding, so the corpus is recoverable
    * from the asset itself) and publish seeds/counts/celled via the
    * crash-safe journaled swap. This is the "train" half of the
    * add-vs-train split: k, seeds and the split table are re-derived at
    * the grown N with the exact [[ensureBuilt]] closed form, so the
    * post-fold asset is bit-equal to a wholesale build — and the oracle
    * can replay a stream-grown index as if it were built fresh.
    * Quantizer params are passed by the maintenance owner (they are part
    * of the dir fingerprint, not readable from the asset).
    */
  def compactDeltas(
      spark: SparkSession,
      dir: String,
      targetCellSize: Int,
      maxCellSize: Int,
      litK: Int = 256
  ): Unit = {
    import spark.implicits._
    Indexes.recoverSwap(dir)
    if (new java.io.File(s"$dir/delta").exists()) {
      val stamp = s"${ProcessHandle.current().pid()}-${System.nanoTime()}"
      val union = spark.read
        .parquet(s"$dir/celled")
        .select(col("vec_id"), col("embedding"))
        .unionByName(
          spark.read.parquet(s"$dir/delta").select(col("vec_id"), col("embedding"))
        )
        .dropDuplicates("vec_id") // replayed batches are bit-identical
        .localCheckpoint()
      val k = Similarity.scaledK(union.count(), targetCellSize)
      val cents = Similarity.seedCentroids(union, k)
      val coarse = Similarity.assignCells(union, cents, litK).localCheckpoint()
      val counts = Similarity.cellCounts(coarse)
      cents.toSeq
        .map { case (c, v) => (c, v.toSeq) }
        .toDF("cell", "centroid")
        .write
        .mode("overwrite")
        .parquet(s"$dir/seeds.compact-$stamp")
      counts.write.mode("overwrite").parquet(s"$dir/counts.compact-$stamp")
      Similarity
        .resplitCells(coarse, counts, k, maxCellSize)
        .write
        .mode("overwrite")
        .parquet(s"$dir/celled.compact-$stamp")
      Indexes.commitSwap(dir, stamp, Seq("celled", "seeds", "counts"))
    }
  }

  /** The ingest-verdict read against an EXPLICIT asset directory (the
    * stream-maintenance twin of [[deltaDups]], which addresses the
    * fingerprinted build): seeds/counts from the asset, candidates from
    * the LIVE celled view — streamed-but-uncompacted vectors participate.
    */
  def deltaDupsAt(
      spark: SparkSession,
      dir: String,
      delta: DataFrame,
      threshold: Double,
      maxCellSize: Int,
      litK: Int = 256
  ): DataFrame = {
    val cents = loadSeeds(spark, dir)
    val counts = spark.read.parquet(s"$dir/counts")
    Similarity.deltaDupsAgainst(
      delta,
      cents,
      counts,
      maxCellSize,
      readCellsLive(spark, dir),
      threshold,
      litK
    )
  }

  private def loadSeeds(spark: SparkSession, dir: String): Array[(Long, Array[Double])] =
    spark.read
      .parquet(s"$dir/seeds")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
}
