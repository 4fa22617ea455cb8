package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Cols._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteTopK]]: exact cosine top-k — a broadcast of the (small) query
  *     set against the full corpus scan. This is the correctness baseline
  *     and also the right plan at any corpus size when |queries| is small:
  *     the corpus is never shuffled, each partition emits only its local
  *     top-k via the per-query window.
  *   - [[ivfTopK]]: IVF-style two-stage search — cluster centroids (here the
  *     `label` column plays the coarse-quantizer cell id, exactly the shape
  *     a k-means assignment would produce) are ranked per query, then the
  *     exact search runs only inside the nProbe nearest cells. At 100 TB the
  *     corpus is bucketed/partitioned BY cell id, so a probe touches only
  *     nProbe partitions — partition pruning does the work of an index.
  */
object Similarity {

  /** Exact cosine top-k: one row per (query, rank<=k neighbor). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"),
      col("embedding").as("q_emb")
    )
    val c = corpus.select(
      col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb")
    )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos")
      )
      .withColumn("rank", lng(row_number().over(w)))
      .filter(col("rank") <= k)
  }

  /** Per-cell centroids: element-wise mean via posexplode → (cell, pos)
    * partial-aggregable sums → array reassembly. No driver-side state, so
    * it scales to any corpus (cells × dim rows after the first aggregate).
    */
  def centroids(corpus: DataFrame, cellCol: String = "label"): DataFrame =
    corpus
      .select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")
        ).as("centroid")
      )

  /** IVF search: rank cells by query↔centroid cosine, take nProbe cells,
    * exact-search only those. Returns (query_id, neighbor_id, rank, cos).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nProbe: Int,
      cellCol: String = "label"
  ): DataFrame = {
    val cents = centroids(corpus, cellCol)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val wCell = Window
      .partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell"))
    val probed = q
      .join(broadcast(cents))
      .select(
        col("query_id"),
        col("q_emb"),
        col("cell"),
        cosine(col("q_emb"), col("centroid")).as("ccos")
      )
      .withColumn("crank", row_number().over(wCell))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cell"))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"),
      col(cellCol).as("cell"),
      col("embedding").as("c_emb")
    )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos")
      )
      .withColumn("rank", lng(row_number().over(w)))
      .filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: within-cell pairwise cosine >= thr.
    * The cell id bounds the quadratic term exactly like an IVF cell.
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double, cellCol: String = "label"): DataFrame = {
    val d = corpus.select(col("vec_id"), col(cellCol).as("cell"), col("embedding"))
    val l = d.as("l")
    val r = d.as("r")
    l.join(r, col("l.cell") === col("r.cell") && col("l.vec_id") < col("r.vec_id"))
      .select(
        col("l.vec_id").as("a_id"),
        col("r.vec_id").as("b_id"),
        cosine(col("l.embedding"), col("r.embedding")).as("cos")
      )
      .filter(col("cos") >= threshold)
  }
}
