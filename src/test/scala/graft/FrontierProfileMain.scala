package graft

import org.apache.spark.sql.SparkSession

/** Cold-path profile of `pipe_frontier_e2e`'s fixed overhead: separates
  * query CONSTRUCTION (the eager localCheckpoint discovery barrier) from
  * EXECUTION (gate + schedule + sort), twice each, at a given sf dir.
  *
  *   Test/runMain graft.FrontierProfileMain /root/testdata/sf0.001
  */
object FrontierProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
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
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    for (q <- Seq("u_outlinks", "u_frontier_schedule", "u_robots", "u_crawl_delay",
                  "u_redirects", "pipe_frontier_e2e");
         i <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = Registry.runners(q)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[frontprof] $q%-20s run $i construct ${(t1 - t0) / 1e9}%6.2f s  execute ${(t2 - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
