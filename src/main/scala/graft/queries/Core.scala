package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Anagrams, StopWordsOp, Text}
import graft.sources.TextSource
import graft.util.Cols

/** Parity queries: the reference's anagram pipeline and its stages
  * (SURVEY.md §2.1), each with a DuckDB oracle.
  */
object Core {

  private val stop = Text.stopListSql
  private def toks = Text.tokensSqlAll("text")

  /** In-repo golden corpus (FIXTURES.md §A.1). Declared before `all`: vals
    * referenced during that Seq's initialization must already be assigned.
    */
  private val CorpusDir = "/root/repo/src/test/resources/corpus_tiny"
  private val StopWordsPath = "/root/repo/src/test/resources/stop_words.txt"

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
    ),
    Q(
      "anagrams_txt",
      (s, _) => {
        // The reference's real input contract: a directory of .txt files plus
        // a comma-separated stop-word file. The golden fixture corpus lives
        // in-repo (FIXTURES.md §A.1) — the sf dir param is unused by design.
        val docs = TextSource
          .readTxtDir(s, CorpusDir)
          .select(col("value").as("text"))
        val sw = TextSource.stopWordsFile(s, StopWordsPath)
        Anagrams
          .groups(docs.select(explode(Text.tokens(col("text"), sw)).as("word")))
          .orderBy("key")
      },
      Some(
        s"""WITH f AS (SELECT content AS text FROM read_text('$CorpusDir/*.txt')),
           |toks AS (SELECT unnest(${Text.tokensSqlAll("text")}) AS word FROM f),
           |words AS (SELECT word FROM toks
           |          WHERE length(word) > 1 AND word NOT IN ('the','a','an','and','she','are')),
           |keyed AS (
           |  SELECT list_aggregate(list_sort(string_split(word, '')), 'string_agg', '') AS key, word
           |  FROM words
           |)
           |SELECT key,
           |       array_to_string(list_sort(list(DISTINCT word)), ' ') AS members,
           |       count(DISTINCT word) AS n_words
           |FROM keyed GROUP BY key HAVING count(DISTINCT word) >= 2
           |ORDER BY key""".stripMargin
      ),
      doc = "End-to-end flagship over the golden .txt corpus: directory scan " +
        "with suffix filter, stop words from the reference's comma-separated " +
        "file format, real anagram groups (acst/dorsw/eilnst) — non-vacuous " +
        "HAVING>=2 coverage the synthetic vocabulary cannot provide."
    ),
    Q(
      "djb2_buckets",
      (s, d) => {
        val keys = Anagrams
          .words(Tables.documents(s, d))
          .select(Anagrams.anagramKey(col("word")).as("key"))
        keys
          .groupBy(
            pmod(
              Cols.nativeCol(graft.functions.Djb2(Cols.nativeExpr(col("key")))),
              lit(10)
            ).as("bucket")
          )
          .agg(
            count(lit(1)).as("n_words"),
            countDistinct(col("key")).as("n_keys")
          )
          .orderBy("bucket")
      },
      Some {
        // djb2 with int32 wrap each step (the reference's hashStr,
        // /root/reference/src/index.js:32-39), then non-negative pmod —
        // the evident intent its signed % violates (SURVEY.md §2.2 item 7).
        val djb2 =
          """list_reduce(list_prepend(5381::BIGINT,
            |    list_transform(string_split(key, ''), c -> ascii(c)::BIGINT)),
            |    (h, c) -> ((((h*33 + c + 2147483648) % 4294967296) + 4294967296)
            |               % 4294967296) - 2147483648)""".stripMargin
        s"""$wordsCte, keyed AS (
           |  SELECT list_aggregate(list_sort(string_split(word, '')), 'string_agg', '') AS key
           |  FROM words
           |)
           |SELECT (((($djb2) % 10) + 10) % 10)::INT AS bucket,
           |       count(*) AS n_words,
           |       count(DISTINCT key) AS n_keys
           |FROM keyed GROUP BY 1 ORDER BY bucket""".stripMargin
      },
      doc = "The reference's shuffle partitioner as data: pmod(djb2(key), 10) " +
        "bucket histogram, bit-exact vs an int32-wrapping DuckDB mirror."
    ),
    // ---- the spark.sql(...) entry path: temp views + registered native
    // functions, exercised end to end. Same result contract as the
    // DataFrame API — this query IS a SQL string.
    Q(
      "q_sql_api",
      (s, d) => {
        graft.Graft.registerSql(s, d)
        s.sql(
          """SELECT pmod(djb2(n_name), 4) AS bucket,
            |       COUNT(*) AS n_nations,
            |       MIN(n_name) AS first_name
            |FROM nation
            |GROUP BY pmod(djb2(n_name), 4)
            |ORDER BY bucket""".stripMargin
        )
      },
      Some {
        val djb2 =
          """list_reduce(list_prepend(5381::BIGINT,
            |    list_transform(string_split(n_name, ''), c -> ascii(c)::BIGINT)),
            |    (h, c) -> ((((h*33 + c + 2147483648) % 4294967296) + 4294967296)
            |               % 4294967296) - 2147483648)""".stripMargin
        s"""SELECT (((($djb2) % 4) + 4) % 4)::INT AS bucket,
           |       COUNT(*) AS n_nations,
           |       MIN(n_name) AS first_name
           |FROM nation GROUP BY 1 ORDER BY bucket""".stripMargin
      },
      doc = "SQL API end to end: Graft.registerSql views + native function " +
        "registration, then a pure spark.sql text using djb2 — proving the " +
        "engine's SQL face returns the same bit-checked results as the " +
        "DataFrame face."
    )
  )
}
