package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // conv-based md5Long parity probe: expect 419982666956583591 for 'hello'
    spark
      .range(1)
      .select(conv(substring(md5(lit("hello")), 1, 15), 16, 10).cast("long").as("h"))
      .show(false)
    // events via the nanosAsLong loader
    val ev = Tables.events(spark, d)
    ev.printSchema()
    ev.select(min("ts"), max("ts")).show(false)
    // run every registered query once at sf0.001
    Registry.all.foreach { q =>
      try {
        val n = q.run(spark, d).count()
        println(s"OK   ${q.name}: $n rows")
      } catch {
        case e: Throwable =>
          println(s"FAIL ${q.name}: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
