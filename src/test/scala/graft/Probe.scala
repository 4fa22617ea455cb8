package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (test scope): time named queries at a given sf dir and dump
  * results + oracle SQL for a local DuckDB diff.
  * `sbt "Test/runMain graft.Probe <sfDir> <outDir> q1 q2 ..."`
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val q = Registry.byName(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once()
      val t2 = once()
      if (sys.env.contains("PROBE_EXPLAIN")) {
        val df = q.run(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString.take(6000))
      }
      q.run(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"TIMED $name%-20s $t1%8.2f s  warm $t2%8.2f s")
    }
    val sqls = names.flatMap(n => Registry.byName(n).oracle.map(n -> _))
    val json = sqls
      .map { case (k, v) =>
        "\"" + k + "\": \"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t") + "\""
      }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
