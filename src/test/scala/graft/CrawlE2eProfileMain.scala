package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split profile of `pipe_crawl_e2e` (WARC walk → HTTP decode →
  * extraction → gates): times each cumulative prefix of the pipeline so
  * the scale bound can be ATTRIBUTED, not guessed. Run at two scales and
  * compare ratios:
  *
  *   Test/runMain graft.CrawlE2eProfileMain /root/testdata/sf0.1
  *   Test/runMain graft.CrawlE2eProfileMain target/sf1
  *
  * Each stage is forced with a noop write, best of 2, on a local[32]
  * session mirroring Bench's config.
  */
object CrawlE2eProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Warc

    val docs = Tables.documents(spark, sfDir)
    val dir = Warc.ensureFixtureDir(sfDir, docs)

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      println(f"[crawlprof] $name%-28s $best%8.2f s")
    }

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // 1. container walk only: record framing + gunzip, no HTTP decode
    time("walk(read+filter)") {
      Warc.read(spark, dir)
        .filter(col("malformed").isNull && col("warc_type") === "response")
        .select(col("target_uri"), col("content_length"))
    }
    // 2. + block bytes materialized (the decompression cost is unavoidable
    // for framing; this isolates carrying the payload)
    time("walk+block") {
      Warc.read(spark, dir)
        .filter(col("malformed").isNull && col("warc_type") === "response")
        .select(col("target_uri"), length(col("block")).as("bl"))
    }
    // 3. + HTTP slice (respread + header regex + body codec)
    time("responses(httpSlice)") {
      Warc.responses(spark, dir).select(col("target_uri"), length(col("body_text")))
    }
    // 4. extraction over the UNBARRIERED decoded slice — rebuilt here
    // without fixturePages' localCheckpoint so the CollapseProject
    // decode-duplication diagnostic stays live (fixturePages itself now
    // carries the barrier; this stage reproduces the pre-fix plan)
    val rawPages = Warc
      .responses(spark, dir)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("body_text").as("html")
      )
    time("extract(no barrier)") {
      graft.operators.Html
        .extract(rawPages)
        .filter(col("n_good") > 0)
        .select(col("doc_id"), length(col("extracted")))
    }
    // 4b. extraction behind the decoded-slice barrier (the production
    // path): if 4 >> 4b, CollapseProject is re-running the HTTP body
    // decode per extraction-expression reference
    time("extract(ckpt pages)") {
      graft.operators.Html
        .extract(Warc.fixturePages(spark, dir))
        .filter(col("n_good") > 0)
        .select(col("doc_id"), length(col("extracted")))
    }
    // 5. full query (gates + sort)
    time("full pipe_crawl_e2e") {
      Registry.runners("pipe_crawl_e2e")(spark, sfDir)
    }
    spark.stop()
  }
}
