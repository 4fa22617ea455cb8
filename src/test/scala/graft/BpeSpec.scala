package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** BPE trainer guarantees behind `t_bpe_merges` and vocabulary coverage
  * behind `t_vocab_coverage`: canonical greedy merge application
  * (including same-character runs, where a naive sentinel string-replace
  * under-merges), composition of later merges over earlier merged
  * symbols, the deterministic (count desc, pair asc) tiebreak, and
  * integral OOV stats.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("same-character runs merge canonically: aaaa -> [aa][aa] -> [aaaa]") {
    // word 'aaaa' has pairs (a,a) x3; greedy left-to-right application
    // must yield 'aa aa' (a sentinel ' a a '-replace would leave 'aa a a'
    // and step 2 would then learn (aa,a) instead of (aa,aa)).
    val m = TextAnalysis.bpeTrain(docs("aaaa aaaa aaaa"), 2)
      .orderBy("step")
      .as[(Long, String, String, String, Long)]
      .collect()
    assert(m(0) === ((1L, "a", "a", "aa", 9L)), "3 words x 3 adjacent pairs")
    assert(m(1) === ((2L, "aa", "aa", "aaaa", 3L)), "canonical fold leaves [aa][aa]")
  }

  test("merges compose over merged symbols and repeat non-overlapping: abab") {
    val m = TextAnalysis.bpeTrain(docs("abab abab"), 2)
      .orderBy("step")
      .as[(Long, String, String, String, Long)]
      .collect()
    // pairs of 'a b a b': (a,b) x2, (b,a) x1 per word
    assert(m(0) === ((1L, "a", "b", "ab", 4L)))
    assert(m(1) === ((2L, "ab", "ab", "abab", 2L)), "both (a,b) occurrences merged in one step")
  }

  test("tiebreak is (support desc, pair asc)") {
    // 'cd' and 'ab' tie at 2 occurrences; 'a b' < 'c d' lexicographically
    val m = TextAnalysis.bpeTrain(docs("ab cd", "ab cd"), 1)
      .as[(Long, String, String, String, Long)]
      .collect()
    assert(m(0) === ((1L, "a", "b", "ab", 2L)))
  }

  test("trainer stops early when no pairs remain") {
    // single two-char word: step 1 merges it fully; step 2 has no pairs
    val m = TextAnalysis.bpeTrain(docs("ab ab"), 5).collect()
    assert(m.length === 1)
  }

  test("oovStats: exact counts and integral permille against top-V vocab") {
    // corpus tokens: 'aa' x3, 'bb' x2, 'cc' x1 -> top-2 vocab = {aa, bb}
    val d = docs("aa aa bb", "aa bb cc")
    val r = TextAnalysis.oovStats(d, 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)]
      .collect()
    assert(r(0) === ((0L, 3L, 0L, 0L)))
    assert(r(1) === ((1L, 3L, 1L, 333L)), "1000*1 div 3 = 333, integral")
  }
}
