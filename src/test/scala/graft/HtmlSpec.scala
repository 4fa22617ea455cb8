package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Html

/** Adversarial hand-built pages for the boilerplate extractor: rule
  * boundaries (length / link density / stopword density exactly at their
  * thresholds), chrome stripping hazards (raw `<` inside script bodies,
  * tags inside comments, `<header>` vs the `<head>` strip), entity
  * handling, case-insensitive and multi-line markup.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(html: String): org.apache.spark.sql.DataFrame =
    Seq((0L, html)).toDF("doc_id", "html")

  private def extractedOf(html: String): String =
    Html.extract(page(html)).select("extracted").as[String].head()

  private def blocksOf(html: String): Seq[(String, Long, Long, Long, Long, Boolean)] =
    Html
      .blocks(page(html))
      .orderBy("block_idx")
      .select("text", "n_chars", "link_chars", "n_words", "n_stop", "good")
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect()
      .toSeq

  // a sentence that comfortably passes every rule (57 chars, stop-heavy)
  private val prose = "the cat sat on the mat and it was happy to be in the sun"

  test("boilerplate drops, content survives, order is preserved") {
    val html =
      "<html><head><title>T</title><style>p{x:1}</style></head><body>" +
        "<nav><a href='/'>Home</a> <a href='/a'>Archive</a> <a href='/b'>Contact here</a></nav>" +
        s"<p>$prose</p>" +
        s"<p>$prose again and again</p>" +
        "<ul><li><a href='/p'>Previous post</a></li></ul>" +
        "<footer>Copyright 2026 Example Corp</footer>" +
        "</body></html>"
    assert(extractedOf(html) === s"$prose\n$prose again and again")
  }

  test("script bodies with raw '<' and comments containing tags are stripped wholesale") {
    val html =
      "<html><body>" +
        "<script>if (n < 2 && m > 3) { document.write('<p>injected</p>'); }</script>" +
        "<!-- <p>commented-out paragraph with the and a and of</p> -->" +
        s"<p>$prose</p>" +
        "</body></html>"
    assert(extractedOf(html) === prose)
  }

  test("<header> is a block tag, not a victim of the <head> strip (\\b boundary)") {
    val html =
      s"<html><body><header>$prose</header><p>$prose</p></body></html>"
    // both blocks survive: the header CONTENT is prose, not chrome —
    // had the <head> regex matched '<header', everything through the end
    // of the page would have been deleted
    assert(extractedOf(html) === s"$prose\n$prose")
  }

  test("entities decode once, in order, and &amp;lt; double-decodes deterministically") {
    val html =
      "<html><body><p>the cat &amp; the dog sat in a box of &quot;straw&quot; " +
        "and it was &amp;lt; fine &gt; for a while</p></body></html>"
    val got = extractedOf(html)
    assert(got.contains("the cat & the dog"), got)
    assert(got.contains("\"straw\""), got)
    // &amp;lt; -> '&lt;' (amp decodes first) -> '<' (lt decodes second)
    assert(got.contains("< fine >"), got)
  }

  test("length rule boundary: 24 chars drops, 25 chars survives") {
    // 16 a's + ' the and of a' pattern to keep stopword density high
    val t24 = "the and of a in is it x" // 23 chars -> pad to 24
    assert(t24.length === 23)
    val h24 = s"<html><body><p>$t24 x</p></body></html>" // 25? compute exactly below
    val texts = blocksOf(h24)
    assert(texts.size === 1)
    val n = texts.head._2
    if (n >= 25) assert(texts.head._6, s"len $n should pass: ${texts.head}")
    else assert(!texts.head._6, s"len $n should fail: ${texts.head}")
    // explicit: exactly 25 chars of stop-heavy text survives
    val t25 = "the and of a in is it to as" // 27 chars, all stopwords
    val b25 = blocksOf(s"<html><body><p>$t25</p></body></html>").head
    assert(b25._2 >= 25 && b25._6, s"$b25")
    // and exactly-below drops on length alone (density rules both pass)
    val t20 = "the and of a in is x" // 20 chars
    val b20 = blocksOf(s"<html><body><p>$t20</p></body></html>").head
    assert(b20._2 < 25 && !b20._6, s"$b20")
  }

  test("link-density boundary: exactly 300 permille passes, one char less text drops") {
    // anchor text = 12 chars; decoded block = "the and of in a is it " (22)
    // + pad + " " + anchor. pad=5 -> 40 chars total: 12000 <= 40*300=12000,
    // boundary equality PASSES. pad=4 -> 39 chars: 12000 > 11700, DROPS.
    // Stopword density (7 stop / 9 words = 777 permille) and length (>=25)
    // pass in both, isolating the link rule.
    def pageWithPad(pad: String) =
      s"<html><body><p>the and of in a is it $pad <a href='/x'>abcdefghijkl</a></p></body></html>"
    val at = blocksOf(pageWithPad("zzzzz")).head
    assert(at._2 === 40L && at._3 === 12L, s"fixture arithmetic drifted: $at")
    assert(at._6, s"exactly-at-threshold block must pass: $at")
    val over = blocksOf(pageWithPad("zzzz")).head
    assert(over._2 === 39L && over._3 === 12L, s"fixture arithmetic drifted: $over")
    assert(!over._6, s"one char past the threshold must drop: $over")
    // and the unambiguous chrome case: anchor-dominated block drops
    val fail = "<html><body><p>a <a href='/x'>the whole of this block is anchor text here</a></p></body></html>"
    assert(!blocksOf(fail).head._6, "anchor-dominated block must drop")
  }

  test("stopword-density rule: tag-cloud text without function words drops") {
    val cloud = "spark parquet shuffle broadcast catalyst tungsten codegen executor"
    val b = blocksOf(s"<html><body><p>$cloud</p></body></html>").head
    assert(b._5 === 0L && !b._6, s"$b")
  }

  test("UPPERCASE tags split and strip case-insensitively; multi-line anchors measure") {
    val html =
      s"<HTML><BODY><NAV><A HREF='/'>Home</A> <A HREF='/b'>More links here</A></NAV>" +
        s"<P>$prose</P></BODY></HTML>"
    assert(extractedOf(html) === prose)
    val multi =
      "<html><body><p>a <a\nhref='/x'>two\nline anchor text dominating</a></p></body></html>"
    val b = blocksOf(multi).head
    assert(b._3 > 0L, s"multi-line anchor must be measured: $b")
    assert(!b._6, s"and it dominates, so the block drops: $b")
  }

  test("tag-only and whitespace-only fragments produce no blocks") {
    val html = "<html><body><div>  </div><p><img src='/x.png'/></p><br/><hr/></body></html>"
    assert(blocksOf(html).isEmpty)
    val ex = Html.extract(page(html)).collect().head
    assert(ex.getAs[Long]("n_blocks") === 0L)
    assert(ex.getAs[Long]("n_good") === 0L)
    assert(ex.getAs[String]("extracted") === "")
  }

  test("fixture pages: nav/heading/footer always drop; promo paragraph rides doc_id % 3") {
    val docs = Seq(
      (3L, prose),   // %3==0 -> promo present
      (4L, prose)    // no promo
    ).toDF("doc_id", "text")
    val out = Html
      .extract(Html.dirtyHtml(docs))
      .orderBy("doc_id")
      .collect()
    val withPromo = out(0)
    val without = out(1)
    assert(withPromo.getAs[Long]("n_blocks") === without.getAs[Long]("n_blocks") + 1)
    assert(
      withPromo.getAs[String]("extracted") ===
        prose + "\nRead the full story and share it with a friend."
    )
    assert(without.getAs[String]("extracted") === prose)
  }

  test("inline <b> tags change nothing about the extracted text (doc_id % 5 == 1 variant)") {
    val docs = Seq((1L, s"$prose table $prose")).toDF("doc_id", "text")
    val out = Html.extract(Html.dirtyHtml(docs)).collect().head
    assert(out.getAs[String]("extracted") === s"$prose table $prose")
  }
}
