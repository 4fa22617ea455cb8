package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Trained language-ID (Cavnar–Trenkle rank profiles): the oracle query
  * `t_langid_trained` runs on the synthetic corpus, whose labels carry no
  * vocabulary signal (chance-floor accuracy, pinned there). THIS suite is
  * the learning-behavior pin: plant per-language marker vocabulary in a
  * fixture, verify the same plan recovers it on held-out docs.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic fixture: shared filler words everywhere, plus per-lang
    * marker words woven through each doc — docs of the same language share
    * vocabulary mass the way real text does. Train/test split follows the
    * operator's doc_id % 10 rule; ids are laid out so every language has
    * train AND test docs.
    */
  private def fixture(nPerLang: Int): org.apache.spark.sql.DataFrame = {
    val langs = Seq("aa", "bb", "cc")
    val filler = Seq("stream", "table", "batch", "query", "join")
    val rows = for {
      (lang, li) <- langs.zipWithIndex
      i <- 0 until nPerLang
    } yield {
      val id = (li * nPerLang + i).toLong
      val markers = (0 until 6).map(k => s"${lang}word${(i + k) % 8}")
      val words = (markers ++ filler ++ markers).mkString(" ")
      (id, lang, words)
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("planted per-language vocabulary is recovered near-perfectly on held-out docs") {
    val docs = fixture(20)
    val out = TextAnalysis
      .langIdTrained(docs)
      .select("doc_id", "lang", "pred_lang", "correct")
      .collect()
    assert(out.nonEmpty, "fixture must produce held-out docs")
    val acc = out.map(_.getLong(3)).sum.toDouble / out.length
    assert(acc === 1.0, s"planted signal must be fully recovered, got $acc of ${out.length}")
  }

  test("classification is deterministic and ties break to the first language") {
    val docs = fixture(20)
    val a = TextAnalysis.langIdTrained(docs).orderBy("doc_id").collect().map(_.toString).toSeq
    val b = TextAnalysis.langIdTrained(docs).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
    // a doc of pure shared filler is equidistant from every profile's
    // marker mass only through the filler ranks; whatever the distances,
    // two runs must agree — and a fully-out-of-profile doc must fall back
    // to the lexicographically-first language on an exact tie
    val blank = Seq((108L, "aa", "zz yy xx ww vv")).toDF("doc_id", "lang", "text")
    val pred = TextAnalysis
      .langIdTrained(fixture(20).unionByName(blank))
      .filter(col("doc_id") === 108L)
      .select("pred_lang", "pred_dist")
      .collect()
    assert(pred.length === 1)
    assert(pred(0).getString(0) === "aa", "exact tie must break to the first language")
  }
}
