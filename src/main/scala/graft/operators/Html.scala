package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the gate every web-scale corpus passes
  * BEFORE any text-quality work: strip markup chrome, split the page into
  * block-level fragments, and classify each block as content vs
  * boilerplate by integer link-density and stopword-density rules (the
  * published jusText / trafilatura heuristics: Pomikálek 2011 "Removing
  * boilerplate and duplicate content from web corpora"; Barbaresi 2021
  * trafilatura). A block survives when it is long enough, NOT dominated by
  * anchor text (navigation/related-links chrome), and carries enough
  * function words to be prose rather than a tag cloud or a copyright line.
  *
  * All densities are integer cross-multiplications (`link_chars * 1000 <=
  * n_chars * maxLinkPermille`), never floating division, so verdicts replay
  * bit-identically on any engine — the same discipline as the corpus
  * quality gates.
  *
  * Scale shape: the whole operator is PER-ROW Catalyst array expressions
  * (split → transform → filter → aggregate) — embarrassingly parallel,
  * zero shuffles, no UDF. At 100 TB the cost is one scan of the raw pages;
  * nothing here grows driver state or keys a shuffle.
  *
  * The reference corpus is plain text, so [[dirtyHtml]] wraps each
  * document into a deterministic dirty page (head + script/style chrome,
  * link-dense nav, heading, content paragraphs with inline tags and
  * entities, related-links list, footer) — built with plain string
  * concatenation so the DuckDB oracle replays the construction verbatim
  * ([[dirtyHtmlSqlExpr]]).
  */
object Html {

  /** Function words for the prose-density rule — tag clouds, headings, and
    * copyright lines carry almost none of these.
    */
  val StopWords: Seq[String] = Seq(
    "a", "an", "the", "of", "to", "in", "and", "is", "it", "that",
    "for", "on", "with", "as", "at", "by"
  )

  /** Minimum decoded block length (chars) for a content block. */
  val MinBlockChars = 25
  /** Maximum anchor-text share of a content block, in permille. */
  val MaxLinkPermille = 300
  /** Minimum stopword share of a content block's words, in permille. */
  val MinStopPermille = 80

  /** Block-level tags: splitting on these yields the candidate fragments;
    * inline tags (`<a>`, `<b>`, ...) stay inside fragments for the
    * link-density measurement and are stripped afterwards.
    */
  private val BlockTagRe =
    "(?i)</?(?:html|body|nav|header|footer|main|section|article|aside|div|p|ul|ol|li|h[1-6]|table|thead|tbody|tr|td|th|br|title|blockquote|pre|figure)\\b[^>]*>"

  private val HeadRe = "(?is)<head\\b[^>]*>.*?</head\\s*>"
  private val ScriptRe = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  private val StyleRe = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  private val CommentRe = "(?s)<!--.*?-->"
  private val AnchorRe = "(?is)<a\\b[^>]*>(.*?)</a\\s*>"
  private val AnyTagRe = "<[^>]*>"
  private val WordSplitRe = "[^a-z0-9]+"

  /** Entity decode pairs, applied IN ORDER (both engines use the same
    * order, so the classic `&amp;lt;` double-decode is at least
    * deterministic).
    */
  private val Entities = Seq(
    "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " "
  )

  private def decodeEntities(t: Column): Column =
    Entities.foldLeft(t) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }

  /** Drop non-content chrome wholesale: `<head>` (and everything in it),
    * `<script>`/`<style>` bodies, comments.
    */
  private def stripChrome(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, HeadRe, " "),
          ScriptRe, " "),
        StyleRe, " "),
      CommentRe, " ")

  /** Per-fragment measurement struct: decoded collapsed text, its length,
    * anchor-text chars (measured BEFORE tag strip), word and stopword
    * counts. One `transform` over the split — per-row, shuffle-free.
    */
  private def blockStructs(html: Column): Column =
    transform(split(stripChrome(html), BlockTagRe), f => {
      val linkChars = coalesce(
        aggregate(
          regexp_extract_all(f, lit(AnchorRe), lit(1)),
          lit(0L),
          (acc, x) => acc + length(x).cast("long")
        ),
        lit(0L)
      )
      val text = trim(
        regexp_replace(
          decodeEntities(regexp_replace(f, AnyTagRe, " ")),
          "\\s+", " ")
      )
      val words = filter(split(lower(text), WordSplitRe), w => length(w) > lit(0))
      val nStop = size(filter(words, w => array_contains(typedLit(StopWords), w)))
      struct(
        text.as("text"),
        length(text).cast("long").as("n_chars"),
        linkChars.as("link_chars"),
        size(words).cast("long").as("n_words"),
        nStop.cast("long").as("n_stop")
      )
    })

  /** The jusText-style content rule, integer-exact. */
  private def goodBlock(b: Column): Column =
    b.getField("n_chars") >= lit(MinBlockChars.toLong) &&
      b.getField("link_chars") * lit(1000L) <= b.getField("n_chars") * lit(MaxLinkPermille.toLong) &&
      b.getField("n_stop") * lit(1000L) >= b.getField("n_words") * lit(MinStopPermille.toLong)

  /** Exploded per-block classification frame — the introspection surface
    * for specs and debugging: one row per nonempty block in document
    * order, with the measured densities and the verdict.
    */
  def blocks(html: DataFrame): DataFrame =
    html
      .select(
        col("doc_id"),
        posexplode(filter(blockStructs(col("html")), b => b.getField("n_chars") > 0))
          .as(Seq("block_idx", "b"))
      )
      .select(
        col("doc_id"),
        col("block_idx"),
        col("b.text").as("text"),
        col("b.n_chars").as("n_chars"),
        col("b.link_chars").as("link_chars"),
        col("b.n_words").as("n_words"),
        col("b.n_stop").as("n_stop"),
        goodBlock(col("b")).as("good")
      )

  /** Main extraction: (doc_id, html) → (doc_id, n_blocks, n_good,
    * content_chars, extracted) where `extracted` is the good blocks'
    * decoded text joined by newlines, in document order.
    */
  def extract(html: DataFrame): DataFrame = {
    val bs = filter(blockStructs(col("html")), b => b.getField("n_chars") > 0)
    html
      .select(col("doc_id"), bs.as("blocks"))
      .select(col("doc_id"), col("blocks"), filter(col("blocks"), b => goodBlock(b)).as("goods"))
      .select(
        col("doc_id"),
        size(col("blocks")).cast("long").as("n_blocks"),
        size(col("goods")).cast("long").as("n_good"),
        coalesce(
          aggregate(col("goods"), lit(0L), (a, b) => a + b.getField("n_chars")),
          lit(0L)
        ).as("content_chars"),
        coalesce(
          array_join(transform(col("goods"), b => b.getField("text")), "\n"),
          lit("")
        ).as("extracted")
      )
  }

  /** Deterministic dirty-page fixture over (doc_id, text): full chrome —
    * head with title/style/script (script body contains a raw `<`), a
    * link-dense nav, a short heading, the document text as the content
    * paragraph (docs ≡ 1 mod 5 get inline `<b>` tags; docs ≡ 0 mod 3 get a
    * second, borderline promo paragraph), a related-links list, and an
    * entity-laden footer. Pure string concatenation, replayed verbatim by
    * [[dirtyHtmlSqlExpr]].
    */
  def dirtyHtml(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        lit("<html><head><title>Doc "),
        col("doc_id").cast("string"),
        lit(" &amp; friends</title>"),
        lit("<style>p { margin: 0; }</style>"),
        lit("<script>var n = 1; if (n < 2) { n = 2; }</script></head>"),
        lit("<body><nav><a href=\"/\">Home</a> <a href=\"/archive\">Archive</a> <a href=\"/contact\">Contact us</a></nav>"),
        lit("<h1>Doc "),
        col("doc_id").cast("string"),
        lit(" heading</h1>"),
        lit("<!-- boilerplate chrome ends here -->"),
        lit("<div><p>"),
        when(col("doc_id") % 5 === 1, replace(col("text"), lit("table"), lit("<b>table</b>")))
          .otherwise(col("text")),
        lit("</p>"),
        when(
          col("doc_id") % 3 === 0,
          lit("<p>Read the <a href=\"/story\">full story</a> and share it with a friend.</p>")
        ).otherwise(lit("")),
        lit("</div>"),
        lit("<ul><li><a href=\"/prev\">Previous post</a></li><li><a href=\"/next\">Next post</a></li></ul>"),
        lit("<footer>&copy; 2026 Example &amp; Sons &mdash; <a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a></footer>"),
        lit("</body></html>")
      ).as("html")
    )

  // ---- DuckDB mirrors (the oracle replays construction + extraction) ----

  /** DuckDB expression equal to [[dirtyHtml]]'s `html` column, over
    * columns (doc_id, text). Joined into ONE line: a `||` at the start of
    * a continuation line would be eaten by the `stripMargin` of any CTE
    * template this gets interpolated into.
    */
  val dirtyHtmlSqlExpr: String = Seq(
    "'<html><head><title>Doc '",
    "doc_id",
    "' &amp; friends</title>'",
    "'<style>p { margin: 0; }</style>'",
    "'<script>var n = 1; if (n < 2) { n = 2; }</script></head>'",
    "'<body><nav><a href=\"/\">Home</a> <a href=\"/archive\">Archive</a> <a href=\"/contact\">Contact us</a></nav>'",
    "'<h1>Doc '",
    "doc_id",
    "' heading</h1>'",
    "'<!-- boilerplate chrome ends here -->'",
    "'<div><p>'",
    "(CASE WHEN doc_id % 5 = 1 THEN replace(text, 'table', '<b>table</b>') ELSE text END)",
    "'</p>'",
    "(CASE WHEN doc_id % 3 = 0 THEN '<p>Read the <a href=\"/story\">full story</a> and share it with a friend.</p>' ELSE '' END)",
    "'</div>'",
    "'<ul><li><a href=\"/prev\">Previous post</a></li><li><a href=\"/next\">Next post</a></li></ul>'",
    "'<footer>&copy; 2026 Example &amp; Sons &mdash; <a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a></footer>'",
    "'</body></html>'"
  ).mkString(" || ")

  /** DuckDB CTE chain replaying [[extract]] over [[dirtyHtml]] of relation
    * `rel` — ends in CTE `hg` with columns (doc_id, blocks, goods).
    */
  def extractCtes(rel: String): String = {
    val stopList = StopWords.map(w => s"'$w'").mkString(", ")
    s"""hh AS (
       |  SELECT doc_id, $dirtyHtmlSqlExpr AS html FROM $rel
       |),
       |hc AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?is)<head\\b[^>]*>.*?</head\\s*>', ' ', 'g'),
       |      '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
       |      '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
       |      '(?s)<!--.*?-->', ' ', 'g') AS body
       |  FROM hh
       |),
       |hb AS (
       |  SELECT doc_id,
       |    list_transform(
       |      string_split_regex(body, '(?i)</?(?:html|body|nav|header|footer|main|section|article|aside|div|p|ul|ol|li|h[1-6]|table|thead|tbody|tr|td|th|br|title|blockquote|pre|figure)\\b[^>]*>'),
       |      f -> {
       |        'text': trim(regexp_replace(
       |          replace(replace(replace(replace(replace(replace(
       |            regexp_replace(f, '<[^>]*>', ' ', 'g'),
       |            '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
       |          '\\s+', ' ', 'g')),
       |        'link_chars': coalesce(list_sum(list_transform(
       |          regexp_extract_all(f, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), x -> length(x))), 0)::BIGINT
       |      }) AS frags
       |  FROM hc
       |),
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(
       |      list_filter(frags, f -> length(f['text']) > 0),
       |      f -> {
       |        'text': f['text'],
       |        'n_chars': length(f['text'])::BIGINT,
       |        'link_chars': f['link_chars'],
       |        'n_words': len(list_filter(string_split_regex(lower(f['text']), '[^a-z0-9]+'), w -> length(w) > 0))::BIGINT,
       |        'n_stop': len(list_filter(string_split_regex(lower(f['text']), '[^a-z0-9]+'),
       |          w -> list_contains([$stopList], w)))::BIGINT
       |      }) AS blocks
       |  FROM hb
       |),
       |hg AS (
       |  SELECT doc_id, blocks,
       |    list_filter(blocks, x ->
       |      x['n_chars'] >= $MinBlockChars
       |      AND x['link_chars'] * 1000 <= x['n_chars'] * $MaxLinkPermille
       |      AND x['n_stop'] * 1000 >= x['n_words'] * $MinStopPermille) AS goods
       |  FROM hs
       |)""".stripMargin
  }

  /** Full DuckDB oracle for the `t_extract` query shape. */
  def extractOracleSql(rel: String = "documents"): String =
    s"""WITH ${extractCtes(rel)}
       |SELECT doc_id,
       |  len(blocks)::BIGINT AS n_blocks,
       |  len(goods)::BIGINT AS n_good,
       |  coalesce(list_sum(list_transform(goods, x -> x['n_chars'])), 0)::BIGINT AS content_chars,
       |  coalesce(array_to_string(list_transform(goods, x -> x['text']), chr(10)), '') AS extracted
       |FROM hg
       |ORDER BY doc_id""".stripMargin
}
