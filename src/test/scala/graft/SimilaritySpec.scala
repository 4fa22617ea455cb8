package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k: ranks are 1..k per query, cosine non-increasing") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity
      .bruteTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Long)]
      .collect()
      .toSeq
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._4) === Seq(1L, 2L, 3L, 4L, 5L))
      val cos = rows.sortBy(_._4).map(_._3)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(rows.forall(r => r._2 !== r._1), "self excluded")
    }
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id")
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
    val brute = topkSet(Similarity.bruteTopK(queries, emb, k = 5))
    val ivf = topkSet(Similarity.ivfTopK(queries, emb, k = 5, nProbe = 3))
    val recalls = brute.map { case (q, trueSet) =>
      ivf.getOrElse(q, Set.empty).intersect(trueSet).size.toDouble / trueSet.size
    }
    val meanRecall = recalls.sum / recalls.size
    // labels in the synthetic table are random, not k-means cells, so the
    // information-free floor for nProbe=3 of 10 cells is ~0.3; centroid
    // ranking should add a little. Real clustered cells would score >0.9.
    assert(meanRecall >= 0.3, s"mean recall@5 with nProbe=3/10 was $meanRecall")
  }

  test("centroids have the embedding dimension and one row per cell") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.centroids(emb).collect()
    assert(cents.length === 10)
    assert(cents.forall(_.getSeq[Double](1).size === 64))
  }
}
