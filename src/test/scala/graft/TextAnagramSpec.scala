package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Anagrams, Text}

/** Pins the reference semantics from SURVEY.md §2.2 items 1–6. */
class TextAnagramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokensOf(text: String, dropStop: Boolean = true): Seq[String] = {
    val c = if (dropStop) Text.tokens(col("text")) else Text.tokensAll(col("text"))
    Seq(text).toDF("text").select(c).as[Seq[String]].head()
  }

  test("tokenizer removes ALL apostrophes (reference intent, not its missing-g bug)") {
    // the reference's /'/  without g only strips the first: don't -> dont but
    // can't -> can + t. We pin the documented intent: every apostrophe goes.
    assert(tokensOf("don't can't o'clock") === Seq("dont", "cant", "oclock"))
  }

  test("non-letter runs become single separators") {
    assert(tokensOf("foo,,bar!!baz 42 qux") === Seq("foo", "bar", "baz", "qux"))
  }

  test("tokens of length <= 1 are dropped before stop-word check") {
    assert(tokensOf("a I x ok") === Seq("ok"))
  }

  test("stop words are dropped; case folded first") {
    assert(tokensOf("The CAT and the hat") === Seq("cat", "hat"))
  }

  test("anagram key = characters sorted ascending (src/index.js:66)") {
    val keys = Seq("listen", "silent", "enlist", "cat")
      .toDF("word")
      .select(Anagrams.anagramKey(col("word")))
      .as[String]
      .collect()
    assert(keys.toSeq === Seq("eilnst", "eilnst", "eilnst", "act"))
  }

  test("pipeline: groups >1 distinct word, members deduped + sorted") {
    val docs = Seq(
      "listen silent listen",
      "the enlist cat act act",
      "tac zzz"
    ).toDF("text")
    val got = Anagrams
      .pipeline(docs)
      .orderBy("key")
      .as[(String, String, Long)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        ("act", "act cat tac", 3L),
        ("eilnst", "enlist listen silent", 3L)
      )
    )
  }

  test("group filter: singleton keys dropped at minSize=2, kept at 1") {
    val docs = Seq("cat act zzz").toDF("text")
    assert(Anagrams.pipeline(docs).count() === 1)
    assert(Anagrams.pipeline(docs, minSize = 1).count() === 2)
  }

  test("renderLines matches the reference output line format (src/index.js:112)") {
    val docs = Seq("cat act").toDF("text")
    val line = Anagrams
      .renderLines(Anagrams.pipeline(docs))
      .as[String]
      .head()
    assert(line === "act: { act, cat }")
  }

  test("property: anagram key is invariant under character permutation") {
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(200)(rnd.alphanumeric.filter(_.isLower).take(rnd.nextInt(12) + 1).mkString)
    val shuffled = words.map(w => rnd.shuffle(w.toList).mkString)
    val df = words.zip(shuffled).toDF("w", "s")
    val bad = df
      .filter(Anagrams.anagramKey(col("w")) =!= Anagrams.anagramKey(col("s")))
      .count()
    assert(bad === 0)
  }
}
