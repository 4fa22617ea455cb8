package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram

/** Unigram-LM trainer guarantees behind `t_unigram_vocab` /
  * `t_unigram_encode`: the integer Viterbi objective (fewest pieces →
  * max summed frequency → lex-min segmentation) on hand-computed cases,
  * the hard-EM recount/prune arithmetic on a fixture vocabulary,
  * unconditional segmentability (chars survive pruning at freq 0), and
  * training determinism.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("viterbi: fewest pieces dominates, then summed frequency") {
    val vocab = Map("a" -> 5L, "b" -> 5L, "ab" -> 4L, "aa" -> 6L)
    // "aab": a|a|b (3 pieces, 15) loses to 2-piece options; aa|b (11)
    // beats a|ab (9)
    assert(Unigram.viterbi(vocab, 4, "aab") === ((2, 11L, "aa b")))
  }

  test("viterbi: lex-min segmentation breaks exact (np, sf) ties") {
    val vocab = Map("a" -> 2L, "aa" -> 2L)
    // "aaa": a|aa and aa|a both (2 pieces, 4); 'a aa' < 'aa a' byte-wise
    assert(Unigram.viterbi(vocab, 4, "aaa") === ((2, 4L, "a aa")))
  }

  test("viterbi: maxPieceLen bounds the match window") {
    val vocab = Map("a" -> 1L, "b" -> 1L, "abab" -> 100L)
    // with the window capped at 2, the 4-char piece is unreachable
    assert(Unigram.viterbi(vocab, 2, "abab") === ((4, 4L, "a b a b")))
    assert(Unigram.viterbi(vocab, 4, "abab") === ((1, 100L, "abab")))
  }

  test("viterbi: a word the vocab cannot cover returns the empty verdict") {
    assert(Unigram.viterbi(Map("a" -> 1L), 4, "ab") === ((0, 0L, "")))
  }

  test("hand-computed EM: seed, round-1 recount/prune, round-2 fixed point") {
    val words = Seq(("abab", 10L), ("ab", 5L), ("cd", 3L)).toDF("word", "cnt")
    // seed: chars a:25 b:25 c:3 d:3; multi top-3 by (freq desc, piece asc)
    // over ab:25 / ba:10 / aba:10 / bab:10 / abab:10 / cd:3 -> ab, aba, abab
    val seed = Unigram.seedVocab(words, 3, 4).as[(String, Long)].collect().toMap
    assert(seed === Map(
      "a" -> 25L, "b" -> 25L, "c" -> 3L, "d" -> 3L,
      "ab" -> 25L, "aba" -> 10L, "abab" -> 10L
    ))
    // round 1 winners: abab -> [abab], ab -> [ab], cd -> [c, d]
    // recount: abab:10 ab:5 c:3 d:3; chars a,b re-frequency to 0 but stay
    val r1 = Unigram.trainRound(words, Unigram.seedVocab(words, 3, 4), 3, 4)
      .as[(String, Long)].collect().toMap
    assert(r1 === Map(
      "a" -> 0L, "b" -> 0L, "c" -> 3L, "d" -> 3L,
      "abab" -> 10L, "ab" -> 5L
    ))
    // round 2 is a fixed point of round 1's table
    val r2 = Unigram.train(words, 3, 4, 2).as[(String, Long)].collect().toMap
    assert(r2 === r1, "EM reached its fixed point on this fixture")
  }

  test("chars never prune: every word stays segmentable at any budget") {
    val words = Seq(("zq", 1L), ("xv", 1L)).toDF("word", "cnt")
    val trained = Unigram.train(words, 0, 4, 2) // zero multi-piece budget
    val seg = Unigram.segmentWords(words, trained, 4)
      .select("word", "n_pieces").as[(String, Long)].collect().toMap
    assert(seg === Map("zq" -> 2L, "xv" -> 2L), "char fallback segments everything")
  }

  test("training is deterministic: two runs produce identical tables") {
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta alpha"),
      (1L, "beta gamma delta beta gamma")
    ).toDF("doc_id", "text")
    val words = graft.operators.TextAnalysis.wordCounts(docs)
      .select(org.apache.spark.sql.functions.col("token").as("word"),
        org.apache.spark.sql.functions.col("cnt"))
    def run() = Unigram.train(words, 16, 4, 2)
      .orderBy("piece").collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("encodeStats: integral fertility over a tiny corpus") {
    val docs = Seq((0L, "abab ab"), (1L, "cd cd cd")).toDF("doc_id", "text")
    val words = graft.operators.TextAnalysis.wordCounts(docs)
      .select(org.apache.spark.sql.functions.col("token").as("word"),
        org.apache.spark.sql.functions.col("cnt"))
    val pieces = Unigram.train(words, 3, 4, 2)
    val out = Unigram.encodeStats(docs, pieces, 4)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_pieces", "pieces_per_100w")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // seed multi top-3 over {ab:3, cd:3, aba:1, abab:1, ba:1, bab:1} =
    // ab, cd, aba — so 'abab' segments as ab|ab (2 pieces), 'ab' as 1:
    // doc 0 = 3 pieces / 2 words -> integral fertility 150
    assert(out.head === ((0L, 2L, 3L, 150L)))
    assert(out(1)._2 === 3L)
    assert(out(1)._4 === out(1)._3 * 100 / 3)
  }
}
