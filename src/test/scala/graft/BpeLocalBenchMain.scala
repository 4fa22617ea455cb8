package graft

import org.apache.spark.sql.functions.col

/** Test-scope measurement main for the driver-local BPE trainer at a
  * production vocabulary size:
  *
  *   sbt "Test/runMain graft.BpeLocalBenchMain <sfDir> <nMerges>"
  *
  * Prints total seconds and ms/merge. Exists to put a MEASURED number
  * behind the 32k-merge claim in BASELINE.md (the round-10 "weak" item
  * was the batched trainer's extrapolated ~1.2 h driver-sequential tail
  * at 32k merges).
  */
object BpeLocalBenchMain {
  def main(args: Array[String]): Unit = {
    val source = if (args.length > 0) args(0) else "synthetic:200000"
    val nMerges = if (args.length > 1) args(1).toInt else 32768
    val spark = TestSpark.spark
    import spark.implicits._
    // The parquet fixture's ~30-word vocabulary exhausts its pair supply
    // within ~90 merges, so the production-vocabulary measurement uses a
    // synthetic corpus-scale word table: N distinct md5-hex "words"
    // (16-char, 16-symbol alphabet — a deep pair space, the BpeSpec
    // production shape scaled up) with Zipf-ish counts.
    val words = (if (source.startsWith("synthetic:")) {
                   val n = source.stripPrefix("synthetic:").toInt
                   def md5Hex(s: String): String =
                     java.security.MessageDigest
                       .getInstance("MD5")
                       .digest(s.getBytes("UTF-8"))
                       .map("%02x".format(_))
                       .mkString
                   spark
                     .range(n)
                     .select(col("id"))
                     .as[Long]
                     .map(i => (md5Hex(s"w$i"), 1L + i % 97))
                     .toDF("word", "cnt")
                 } else
                   graft.operators.TextAnalysis
                     .wordCounts(Tables.documents(spark, source))
                     .select(col("token").as("word"), col("cnt")))
      .localCheckpoint(true)
    val nWords = words.count()
    val t0 = System.nanoTime()
    val (merges, _) =
      graft.operators.TextAnalysis.bpeTrainWordsLocal(words, nMerges, maxWords = 20000000)
    val n = merges.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(
      f"[bpe-local] words=$nWords merges=$n of requested $nMerges in $sec%.1f s " +
        f"(${sec * 1000 / math.max(n, 1)}%.2f ms/merge)"
    )
    spark.stop()
  }
}
