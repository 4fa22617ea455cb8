package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw text-directory ingestion — the reference's actual input contract
  * (`/root/reference/src/index.js:141-146`): list a directory, keep `*.txt`,
  * read free text; stop words arrive as one comma-separated line from a
  * config object (`src/index.js:141-142,179`).
  *
  * Spark-first shape: `spark.read.text` over the directory with a
  * `pathGlobFilter` does the listing+filter inside the data source (one task
  * per file split — the reference's one-reader-per-file fan-out becomes task
  * scheduling), and works unchanged on any Hadoop-compatible FS (local,
  * HDFS, S3, GCS) at any file count.
  */
object TextSource {

  /** All `*.txt` files under `dir` as (path, line) rows. */
  def readTxtDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("pathGlobFilter", "*.txt")
      .text(dir)
      .select(input_file_name().as("path"), col("value"))

  /** Stop words from a comma-separated text file (the reference's config
    * format). Read through the same Hadoop FS layer as the corpus, then
    * collected — it is a O(bytes-of-config) driver value that downstream
    * operators broadcast, never a data-plane read.
    */
  def stopWordsFile(spark: SparkSession, path: String): Seq[String] =
    spark.read
      .text(path)
      .collect()
      .iterator
      .map(_.getString(0))
      .mkString(",")
      .split(",")
      .iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq
}
