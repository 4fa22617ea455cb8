package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stop-word removal as a broadcast anti-join — the reference ships the stop
  * list inside every trigger message and probes a Set
  * (`/root/reference/src/index.js:152,179`), i.e. a broadcast anti-join by
  * hand. On a cluster the stop list is a small dimension table: broadcasting
  * it keeps the big side shuffle-free regardless of corpus size.
  */
object StopWordsOp {

  /** The stop list as a single-column DataFrame ("sw"). */
  def asDf(spark: SparkSession, words: Seq[String] = Text.StopWords): DataFrame = {
    import spark.implicits._
    words.toDF("sw")
  }

  /** Remove rows of `words` whose `wordCol` appears in the stop list.
    * `broadcast()` pins the strategy: never shuffle the corpus for this.
    */
  def antiJoin(words: DataFrame, wordCol: String, stop: DataFrame): DataFrame =
    words.join(broadcast(stop), words(wordCol) === stop("sw"), "left_anti")
}
