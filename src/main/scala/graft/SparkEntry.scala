package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word-count over the reference tokenizer: scan → flatMap → filter →
    * shuffle → agg (the anagram pipeline's spine). The full `anagrams`
    * query is registered too — 0 groups on the synthetic vocabulary, which
    * contains no anagram pairs — and `anagrams_txt` runs the pipeline
    * end-to-end over the golden .txt corpus with REAL anagram groups
    * (acst/dorsw/eilnst), so the HAVING>=2 path is oracle-checked
    * non-vacuously.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.runners("wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.runners

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose values are engine-
    * specific (sketches, ANN recall) — those get rows-only checks plus
    * ScalaTest assertions.
    */
  def oracleSql: Map[String, String] = Registry.oracles
}
