package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenize + normalize + filter — the reference's reader phase
  * (`/root/reference/src/index.js:48-55`), re-expressed as pure Catalyst
  * expressions so it stays inside whole-stage codegen and the parquet scan
  * only materializes the text column.
  *
  * Semantics pinned by SURVEY.md §2.2 items 1–2:
  *   lowercase → remove ALL apostrophes (the reference's missing `g` flag is
  *   an acknowledged bug; we implement the documented intent) → collapse
  *   `[^a-z]+` runs to a single space → split → keep tokens of length > 1 →
  *   drop stop words.
  */
object Text {

  /** Stop words. The reference ships its list out-of-band in a GCS object
    * (`/root/reference/src/index.js:141-142`); we pin a fixed default so the
    * DuckDB oracle can embed the identical literal list.
    */
  val StopWords: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "is", "it", "that", "as", "for",
    "was", "with", "are", "be", "by", "on", "not", "at", "this", "but",
    "from", "or", "have", "an", "they", "which", "one", "all", "we", "can"
  )

  /** The stop list as a SQL literal list body, shared with oracle SQL. */
  def stopListSql: String = StopWords.map(w => s"'$w'").mkString(", ")

  /** lowercase, strip apostrophes, non-letters → single space. */
  def normalize(text: Column): Column =
    regexp_replace(regexp_replace(lower(text), "'", ""), "[^a-z]+", " ")

  /** All tokens of length > 1 (empty boundary tokens fall out with them). */
  def tokensAll(text: Column): Column =
    filter(split(normalize(text), " "), w => length(w) > 1)

  /** Tokens with stop words removed via an IN-list predicate (stays in
    * codegen). For big external stop lists prefer
    * [[StopWordsOp.antiJoin]] (broadcast anti-join).
    */
  def tokens(text: Column): Column = tokens(text, StopWords)

  /** Same, against a caller-supplied stop list (e.g. one loaded from the
    * reference's comma-separated config file via
    * [[graft.sources.TextSource.stopWordsFile]]).
    */
  def tokens(text: Column, stopWords: Seq[String]): Column =
    filter(tokensAll(text), w => !w.isin(stopWords: _*))

  /** DuckDB expression producing the same token list from column `c`
    * (before length/stop filtering — those are WHERE clauses at the
    * unnested level). chr(39) is the apostrophe.
    */
  def tokensSqlAll(c: String): String =
    s"string_split_regex(regexp_replace(replace(lower($c), chr(39), ''), '[^a-z]+', ' ', 'g'), ' ')"
}
