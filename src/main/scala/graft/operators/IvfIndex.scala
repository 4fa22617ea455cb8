package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.util.Cols._

/** Persisted IVF index: the on-disk form of [[Similarity.ivfTopK]].
  *
  * At 100 TB an ANN index is not an in-memory structure — it IS the storage
  * layout. [[build]] assigns every corpus vector a cell (trained k-means, or
  * a caller-supplied cell column) and writes:
  *
  *   - `dir/corpus/cell=<id>/...` — the corpus parquet, partitioned by cell
  *     id, so one cell is one directory of files;
  *   - `dir/centroids` — the k cell centroids (k rows, O(k·dim) bytes).
  *
  * [[search]] then needs no training pass and no corpus scan: it reads the
  * k-row centroids table to the driver, ranks cells per query, and reads
  * ONLY the probed cells — the probe set becomes a LITERAL `cell IN (...)`
  * predicate, which Spark's parquet source turns into partition pruning
  * (`PartitionFilters` in the plan; directories outside the probe set are
  * never listed, let alone read). Exact cosine re-scoring then runs on the
  * pruned read, reduced by the bounded top-k aggregate.
  *
  * The query batch is assumed driver-small (the same contract as
  * [[Similarity.bruteTopK]]'s broadcast): |Q|·nProbe probe pairs are
  * collected to build the pruning literal.
  */
object IvfIndex {

  /** Index location for a corpus: keyed by the source dir plus a cheap
    * content fingerprint (row count + vec_id sum — one scan of the small
    * embeddings table), so a regenerated dataset can never silently reuse
    * a stale index. Lives under target/ (build products, not source).
    */
  def defaultDir(sfDir: String, corpus: DataFrame): String = {
    val fp = corpus
      .agg(count(lit(1)).cast(LongType), sum(col("vec_id")).cast(LongType))
      .head()
    val key = s"$sfDir|${fp.getLong(0)}|${fp.getLong(1)}"
    val tag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
      .take(12)
    s"target/ivf-index/$tag"
  }

  /** Build once, reuse forever: training is deterministic (md5 seeding +
    * decimal means — see [[Similarity.kmeansCells]]), so same data ⇒ same
    * index, and a completed build (the centroids `_SUCCESS` marker) is
    * valid across processes. This is the 100 TB amortization contract: an
    * ANN index is BUILT once and SEARCHED many times; a query that retrains
    * per execution pays the training corpus scans on every search.
    */
  def ensureBuilt(
      corpus: DataFrame,
      dir: String,
      kCells: Int = 10,
      iters: Int = 4
  ): Unit =
    if (!new java.io.File(s"$dir/centroids/_SUCCESS").exists())
      build(corpus, dir, None, kCells, iters)

  /** Train (or adopt `cellCol`) and write the index under `dir`. */
  def build(
      corpus: DataFrame,
      dir: String,
      cellCol: Option[String] = None,
      kCells: Int = 10,
      iters: Int = 4
  ): Unit = {
    val celled = cellCol match {
      case Some(c) =>
        corpus.withColumn("cell", col(c).cast(LongType))
      case None =>
        corpus.join(Similarity.kmeansCells(corpus, kCells, iters), Seq("vec_id"))
    }
    celled
      .select(col("vec_id"), col("embedding"), col("cell"))
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(s"$dir/corpus")
    Similarity
      .centroids(celled, "cell")
      .write
      .mode("overwrite")
      .parquet(s"$dir/centroids")
  }

  /** Top-k search against a persisted index. Returns
    * (query_id, neighbor_id, cos, rank), ranks 1..k per query.
    */
  def search(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    // k centroid rows to the driver — the only driver state, O(k·dim).
    val cents: Array[(Long, Array[Double])] = spark.read
      .parquet(s"$dir/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    // Map-only per-query cell ranking: the centroids are literals inside
    // one projection (k cosine loops + array_sort), no join, no shuffle.
    // Ties take the higher cell id ((sim, cell) lexicographic order).
    val ranked = reverse(
      array_sort(
        array(cents.map { case (cell, v) =>
          struct(
            cosine(col("embedding"), typedLit(v.toSeq)).as("sim"),
            lit(cell).as("cell")
          )
        }.toIndexedSeq: _*)
      )
    )
    val probe = queries
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        explode(slice(ranked, 1, nProbe)).as("pc")
      )
      .select(col("query_id"), col("q_emb"), col("pc.cell").as("cell"))

    // The union of probed cells as a LITERAL filter: this is what turns
    // the probe into partition pruning on the corpus read. (A join-derived
    // probe — ivfTopK's shape — is data-dependent, which a static reader
    // cannot prune on.)
    val probedCells = probe.select(col("cell")).distinct().collect().map(_.getLong(0))

    val corpus = spark.read
      .parquet(s"$dir/corpus")
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
      .select(
        col("vec_id").as("neighbor_id"),
        col("cell").cast(LongType).as("cell"),
        col("embedding").as("c_emb")
      )
    val scored = corpus
      .join(broadcast(probe), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos")
      )
    Similarity.topKExplode(scored, k)
  }
}
