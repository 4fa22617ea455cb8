package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke probe (test scope, not library surface): runs every registered
  * query once against a small sf dir. `sbt "Test/runMain graft.Smoke [dir]"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0
    Registry.all.foreach { q =>
      try {
        val n = q.run(spark, d).count()
        println(s"OK   ${q.name}: $n rows")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"FAIL ${q.name}: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
