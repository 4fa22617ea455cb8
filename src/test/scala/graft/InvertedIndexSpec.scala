package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Inverted-index guarantees behind `t_inverted_index`/`t_phrase_search`:
  * postings correctness on a hand fixture, phrase adjacency semantics
  * (overlapping and repeated matches), and the seek property — the
  * phrase plan filters the index to the two query terms before any join.
  */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "to be or not to be"),
    (2L, "be to be to be"),
    (3L, "nothing relevant here")
  ).toDF("doc_id", "text")

  test("postings: tf and sorted positions per (term, doc)") {
    val idx = TextAnalysis.invertedIndex(docs)
    val be = idx
      .filter(col("term") === "be")
      .orderBy("doc_id")
      .select("doc_id", "tf", "positions")
      .as[(Long, Long, Seq[Long])]
      .collect()
      .toSeq
    assert(be === Seq((1L, 2L, Seq(1L, 5L)), (2L, 3L, Seq(0L, 2L, 4L))))
  }

  test("phrase search finds every adjacency, including repeats") {
    val idx = TextAnalysis.invertedIndex(docs)
    val hits = TextAnalysis
      .phraseSearch(idx, "to", "be")
      .orderBy("doc_id", "pos")
      .select("doc_id", "pos")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(hits === Seq((1L, 0L), (1L, 4L), (2L, 1L), (2L, 3L)))
    assert(TextAnalysis.phraseSearch(idx, "be", "nothing").count() === 0)
  }

  test("phrase plan seeks: term filters reach the index side before the join") {
    val idx = TextAnalysis.invertedIndex(docs)
    val plan = TextAnalysis
      .phraseSearch(idx, "to", "be")
      .queryExecution
      .optimizedPlan
      .toString
    assert(
      plan.contains("term#") && (plan.contains("= to") || plan.contains("(to)")),
      s"expected the term predicate pushed into the index scan:\n${plan.take(1200)}"
    )
  }
}
