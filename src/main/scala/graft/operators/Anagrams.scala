package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.util.Cols._

/** The reference's whole pipeline (scan → tokenize → key-extract → shuffle →
  * group/distinct/having/sort → sink), as composable DataFrame stages.
  *
  * Reference phases it replaces (SURVEY.md §2.1):
  *   - `_map` (`/root/reference/src/index.js:64-69`)  → [[anagramKey]]
  *   - `_shuffle` + GCS barrier (`src/index.js:82-91,260-301`) → the implicit
  *     Exchange under `groupBy` (hash partition on `key`; Spark's pmod-based
  *     partitioning fixes the reference's negative-bucket row loss,
  *     SURVEY.md §2.2 item 7)
  *   - `_reduce` (`src/index.js:101-116`) → `collect_set` + HAVING + sort
  *   - `clean` (`src/index.js:364-391`) → [[renderLines]] + single-file sink.
  *
  * Scale posture: the only shuffle is the group-by on `key`; map-side partial
  * aggregation (partial `collect_set`) shrinks it, and the result cardinality
  * is bounded by distinct-word count, not corpus size, so the final
  * `coalesce(1)` sink stays safe at 100 TB of input.
  */
object Anagrams {

  /** word → its characters sorted ascending — the anagram group key
    * (`/root/reference/src/index.js:66`). Native codegen char sort
    * ([[graft.functions.SortChars]]); equals
    * `array_join(array_sort(split(word, "")), "")` without the per-token
    * array-of-one-char-strings allocation that dominated the round-1
    * flagship profile.
    */
  def anagramKey(word: Column): Column =
    ExpressionUtils.column(graft.functions.SortChars(ExpressionUtils.expression(word)))

  /** documents(textCol) → one row per surviving token. */
  def words(docs: DataFrame, textCol: String = "text", dropStop: Boolean = true): DataFrame = {
    val toks = if (dropStop) Text.tokens(col(textCol)) else Text.tokensAll(col(textCol))
    docs.select(explode(toks).as("word"))
  }

  /** Group words by anagram key; keep groups with >= minSize distinct words;
    * members sorted and joined to a canonical string (global row order is
    * undefined in the reference — SURVEY.md §2.2 item 6).
    */
  def groups(words: DataFrame, minSize: Int = 2): DataFrame =
    words
      .groupBy(anagramKey(col("word")).as("key"))
      .agg(sort_array(collect_set(col("word"))).as("ws"))
      .select(
        col("key"),
        array_join(col("ws"), " ").as("members"),
        size(col("ws")).cast(LongType).as("n_words")
      )
      .filter(col("n_words") >= minSize)

  /** Whole reference query: documents → anagram groups. */
  def pipeline(docs: DataFrame, minSize: Int = 2): DataFrame =
    groups(words(docs), minSize)

  /** Render in the reference's output line format `key: { a, b }`
    * (`/root/reference/src/index.js:112`).
    */
  def renderLines(groups: DataFrame): DataFrame =
    groups.select(
      concat(
        col("key"),
        lit(": { "),
        regexp_replace(col("members"), " ", ", "),
        lit(" }")
      ).as("value")
    )

  /** Single merged text file, the reference's `clean` sink. Safe because the
    * group table is small (bounded by vocabulary, not corpus).
    */
  def writeSingleText(groups: DataFrame, path: String): Unit =
    renderLines(groups).coalesce(1).write.mode("overwrite").text(path)
}
