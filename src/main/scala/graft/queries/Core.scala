package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Anagrams, StopWordsOp, Text}

/** Parity queries: the reference's anagram pipeline and its stages
  * (SURVEY.md §2.1), each with a DuckDB oracle.
  */
object Core {

  private val stop = Text.stopListSql
  private def toks = Text.tokensSqlAll("text")

  /** Shared oracle CTE: documents → surviving tokens (one row per token). */
  private val wordsCte =
    s"""WITH toks AS (
       |  SELECT unnest($toks) AS word FROM documents
       |), words AS (
       |  SELECT word FROM toks WHERE length(word) > 1 AND word NOT IN ($stop)
       |)""".stripMargin

  private def anagramOracle(minSize: Int) =
    s"""$wordsCte, keyed AS (
       |  SELECT list_aggregate(list_sort(string_split(word, '')), 'string_agg', '') AS key, word
       |  FROM words
       |)
       |SELECT key,
       |       array_to_string(list_sort(list(DISTINCT word)), ' ') AS members,
       |       count(DISTINCT word) AS n_words
       |FROM keyed GROUP BY key HAVING count(DISTINCT word) >= $minSize
       |ORDER BY key""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "anagrams",
      (s, d) => Anagrams.pipeline(Tables.documents(s, d)).orderBy("key"),
      Some(anagramOracle(2)),
      doc = "The reference's whole query: anagram groups with >1 distinct word."
    ),
    Q(
      "anagram_groups_all",
      (s, d) => Anagrams.pipeline(Tables.documents(s, d), minSize = 1).orderBy("key"),
      Some(anagramOracle(1)),
      doc = "Same grouping without the HAVING filter (non-empty on the synthetic " +
        "vocab, which contains no true anagram pairs — keeps the group/collect_set/" +
        "sort semantics oracle-checked with real rows)."
    ),
    Q(
      "wordcount",
      (s, d) =>
        Anagrams
          .words(Tables.documents(s, d))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .orderBy("word"),
      Some(
        s"""$wordsCte
           |SELECT word, count(*) AS n FROM words GROUP BY word ORDER BY word""".stripMargin
      ),
      doc = "Tokenize → explode → count: the reference's read+map phases under a " +
        "plain aggregate; flagship smoke query."
    ),
    Q(
      "wordcount_antijoin",
      (s, d) => {
        val words = Tables
          .documents(s, d)
          .select(explode(Text.tokensAll(col("text"))).as("word"))
        StopWordsOp
          .antiJoin(words, "word", StopWordsOp.asDf(s))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .orderBy("word")
      },
      Some(
        s"""WITH toks AS (
           |  SELECT unnest($toks) AS word FROM documents
           |), words AS (
           |  SELECT word FROM toks WHERE length(word) > 1
           |    AND NOT EXISTS (SELECT 1 FROM (VALUES ${Text.StopWords
            .map(w => s"('$w')")
            .mkString(",")}) sw(w) WHERE sw.w = word)
           |)
           |SELECT word, count(*) AS n FROM words GROUP BY word ORDER BY word""".stripMargin
      ),
      doc = "Stop-word removal as an explicit broadcast anti-join (the reference " +
        "ships the stop list into every task; we broadcast the dimension instead)."
    ),
    Q(
      "anagram_render",
      (s, d) =>
        Anagrams
          .renderLines(Anagrams.pipeline(Tables.documents(s, d), minSize = 1))
          .orderBy("value"),
      Some(
        s"""$wordsCte, keyed AS (
           |  SELECT list_aggregate(list_sort(string_split(word, '')), 'string_agg', '') AS key, word
           |  FROM words
           |), grp AS (
           |  SELECT key, array_to_string(list_sort(list(DISTINCT word)), ', ') AS m
           |  FROM keyed GROUP BY key
           |)
           |SELECT key || ': { ' || m || ' }' AS value FROM grp ORDER BY value""".stripMargin
      ),
      doc = "The reference sink's line rendering `key: { a, b }` " +
        "(/root/reference/src/index.js:112)."
    )
  )
}
