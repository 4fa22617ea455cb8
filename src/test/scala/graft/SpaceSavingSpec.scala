package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SpaceSavingAgg

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: "hot" 60x, "warm" 25x, then 15 singletons
  private def skewed: Seq[String] =
    Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++ (0 until 15).map(i => s"cold$i")

  private def summarize(capacity: Int, parts: Int): Map[String, (Long, Long)] =
    skewed
      .toDF("item")
      .repartition(parts)
      .agg(SpaceSavingAgg.spaceSaving(col("item"), capacity, capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .as[(String, Long, Long)]
      .collect()
      .map { case (k, est, err) => k -> (est, err) }
      .toMap

  test("exact regime (capacity >= distinct): the summary IS the frequency table") {
    for (parts <- Seq(1, 7)) {
      val s = summarize(capacity = 64, parts)
      assert(s("hot") === ((60L, 0L)))
      assert(s("warm") === ((25L, 0L)))
      assert(s.size === 17)
      assert(s.count { case (k, _) => k.startsWith("cold") } === 15)
    }
  }

  test("eviction regime keeps the SpaceSaving guarantees under merge") {
    // capacity 4 over 17 distinct items, N=100: every item with true
    // count > N/4 = 25 must be present; estimates never undercount and
    // est - err never overcounts.
    val truth = Map("hot" -> 60L, "warm" -> 25L) ++
      (0 until 15).map(i => s"cold$i" -> 1L)
    for (parts <- Seq(1, 5)) {
      val s = summarize(capacity = 4, parts)
      assert(s.size === 4)
      assert(s.contains("hot"), s"must keep the >N/capacity item: $s")
      s.foreach { case (k, (est, err)) =>
        val t = truth(k)
        assert(est >= t, s"$k: est $est < true $t")
        assert(est - err <= t, s"$k: est-err ${est - err} > true $t")
      }
    }
  }

  test("streaming heavy hitters (Complete mode) equal the batch summary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(SpaceSavingAgg.spaceSaving(col("value"), 64, 3).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
    val q = agg(stream.toDF())
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      stream.addData(skewed.take(50): _*)
      q.processAllAvailable()
      stream.addData(skewed.drop(50): _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_out").as[(String, Long)].collect().toSet
      val batch = agg(skewed.toDF("value")).as[(String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.contains(("hot", 60L)))
    } finally q.stop()
  }
}
