package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional inverted index: the on-disk, term-partitioned form
  * of [[TextAnalysis.invertedIndex]] — the layout that turns phrase /
  * proximity search from a corpus scan into an INDEX SEEK.
  *
  * Layout under `dir` (the [[Indexes]] fingerprint + atomic-publication
  * contract, like [[IvfIndex]]/[[Pq]]/[[SemanticIndex]]):
  *
  *   - `postings/tb=<bucket>/...` — the (term, doc_id, tf, positions)
  *     postings, directory-partitioned by a TERM HASH BUCKET
  *     (`pmod(xxhash64(term), nBuckets)`) and sorted by (term, doc_id)
  *     within each bucket. Hash buckets, not raw terms: a 100 TB corpus
  *     has a multi-million-term vocabulary (directory-per-term would melt
  *     the file listing) and a df-skewed one (bucketing spreads hot terms'
  *     neighbors; the hot term itself is bounded by its own postings, and
  *     `maxRecordsPerFile` splits it into parallel-scannable files).
  *     A query term's bucket is a LITERAL at plan time, so the read is
  *     partition-pruned (`PartitionFilters` — unprobed directories are
  *     never listed), and the within-bucket (term, doc_id) sort gives
  *     parquet row-group min/max skipping on the term equality.
  *   - `top_bigram/` — one row: the corpus's most frequent adjacent token
  *     pair (deterministic tie-break), derived once at build time from
  *     postings adjacency. Corpus statistics are index metadata: a search
  *     that re-derives them pays a corpus scan per query.
  *   - `stats/` — one row: the corpus document count, the N every
  *     idf-style ranking needs. Same metadata principle.
  *
  * Search-time driver state: the two query terms' bucket ids — O(1).
  */
object TextIndex {

  val DefaultBuckets = 16

  def defaultDir(sfDir: String, docs: DataFrame, nBuckets: Int = DefaultBuckets): String =
    Indexes.fingerprintDirOn("text-index2", sfDir, docs, "doc_id", "text", s"nb=$nBuckets")

  private[graft] def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** Build once per corpus version: postings written term-bucket-
    * partitioned/sorted, plus the top-bigram and corpus-count statistics
    * (stats/ written LAST — it is the completion marker). No-op if `dir`
    * already holds a completed build.
    */
  def ensureBuilt(docs: DataFrame, dir: String, nBuckets: Int = DefaultBuckets): Unit =
    Indexes.atomicBuild(dir, "stats/_SUCCESS") { tmp =>
      val spark = docs.sparkSession
      import spark.implicits._
      val index = TextAnalysis.invertedIndex(docs)
      graft.sources.Layout.writePartitionedSorted(
        index.withColumn("tb", bucketOf(col("term"), nBuckets)),
        s"$tmp/postings",
        "tb",
        Seq("term", "doc_id")
      )
      // top adjacent pair from postings adjacency (one bounded aggregate
      // over the freshly built index — never a text re-scan), kept as
      // index metadata so a default phrase query is seek-only
      val toks = spark.read
        .parquet(s"$tmp/postings")
        .select(col("term"), col("doc_id"), explode(col("positions")).as("pos"))
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
        .parquet(s"$tmp/top_bigram")
      Seq(docs.count())
        .toDF("n_docs")
        .write
        .mode("overwrite")
        .parquet(s"$tmp/stats")
    }

  /** The postings rows for `terms`, read partition-pruned: the terms'
    * hash buckets become a literal `tb IN (...)` predicate (directories
    * outside it are never listed), then the term equality rides the
    * within-bucket sort's row-group statistics.
    */
  def postingsFor(
      spark: SparkSession,
      dir: String,
      terms: Seq[String],
      nBuckets: Int = DefaultBuckets
  ): DataFrame = {
    // bucket ids must match the build-side xxhash64 exactly — compute them
    // through the engine, one literal row per term (no corpus scan)
    import spark.implicits._
    val ids = terms.toDF("term").select(bucketOf(col("term"), nBuckets)).as[Long].collect().toSeq
    spark.read
      .parquet(s"$dir/postings")
      .filter(col("tb").isin(ids.distinct: _*) && col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("tf"), col("positions"))
  }

  /** The persisted top bigram — (w1, w2), one row of driver state. */
  def topBigram(spark: SparkSession, dir: String): (String, String) = {
    val r = spark.read.parquet(s"$dir/top_bigram").select(col("w1"), col("w2")).head()
    (r.getString(0), r.getString(1))
  }

  /** The persisted corpus document count — one long of driver state. */
  def nDocs(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/stats").head().getLong(0)

  /** tf·idf ranked retrieval answered ENTIRELY from the index: the query
    * terms' postings (partition-pruned seek), df from those same rows,
    * N from the persisted stats — zero corpus scans. Integral scoring
    * (`score = Σ tf · ((1e6·N) div df)`, integer division) so ranks are
    * bit-stable on any engine. Top-k by (score desc, doc_id) is a
    * TakeOrdered over the seek's few rows, never a global sort.
    */
  def searchTopK(
      spark: SparkSession,
      dir: String,
      terms: Seq[String],
      k: Int,
      nBuckets: Int = DefaultBuckets
  ): DataFrame = {
    val n = nDocs(spark, dir)
    val p = postingsFor(spark, dir, terms.distinct, nBuckets)
    val dfreq = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    p.join(broadcast(dfreq), Seq("term"))
      .select(
        col("doc_id"),
        (col("tf") * call_function("div", lit(1000000L * n), col("df"))).as("w")
      )
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).cast("long").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Boolean retrieval answered ENTIRELY from the index: documents
    * containing ALL `must` terms and NONE of `mustNot`, with the summed
    * must-term frequency as a ranking signal. One partition-pruned seek
    * for all terms together (their buckets union into one literal
    * predicate), an AND via count-distinct-terms == |must| (no self-join
    * per term — the classic postings-intersection done as one aggregate),
    * and NOT via a left-anti join against the exclusion postings. Cost is
    * O(Σ df) seek rows at any corpus size — zero corpus scans.
    */
  def booleanSearch(
      spark: SparkSession,
      dir: String,
      must: Seq[String],
      mustNot: Seq[String],
      nBuckets: Int = DefaultBuckets
  ): DataFrame = {
    require(must.nonEmpty, "at least one required term")
    val p = postingsFor(spark, dir, (must ++ mustNot).distinct, nBuckets)
    val hits = p
      .filter(col("term").isin(must: _*))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("term")).as("n_terms"),
        sum(col("tf")).cast("long").as("tf_sum")
      )
      .filter(col("n_terms") === must.distinct.size)
    val excluded = p.filter(col("term").isin(mustNot: _*)).select(col("doc_id")).distinct()
    hits
      .join(excluded, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("tf_sum"))
  }

  /** Exact-phrase search answered ENTIRELY from the index: read the two
    * terms' postings (partition-pruned seek, O(df) rows), join on doc and
    * check position adjacency — [[TextAnalysis.phraseSearch]] over a
    * pruned read instead of a corpus-wide rebuild.
    */
  def phraseSearchIndexed(
      spark: SparkSession,
      dir: String,
      w1: String,
      w2: String,
      nBuckets: Int = DefaultBuckets
  ): DataFrame =
    TextAnalysis.phraseSearch(postingsFor(spark, dir, Seq(w1, w2), nBuckets), w1, w2)
}
