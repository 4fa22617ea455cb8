package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{UserEvent, UserStats}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hourlyStats under streaming equals the same transform under batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:55:00", "click", 2.0),
      ("2024-01-01 10:30:00", "view", 5.0),
      ("2024-01-01 11:10:00", "click", 3.0)
    ).map { case (t, ty, v) => (Timestamp.valueOf(t), ty, v) }

    val stream = MemoryStream[(Timestamp, String, Double)]
    val streamingDf = EventStreams.hourlyStats(
      stream.toDF().toDF("event_time", "event_type", "value")
    )
    val q = streamingDf.writeStream
      .format("memory")
      .queryName("hourly_out")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark
        .table("hourly_out")
        .orderBy("window_start", "event_type")
        .as[(Timestamp, String, Long, Double)]
        .collect()
        .toSeq
      val batch = EventStreams
        .hourlyStats(rows.toDF("event_time", "event_type", "value"))
        .orderBy("window_start", "event_type")
        .as[(Timestamp, String, Long, Double)]
        .collect()
        .toSeq
      assert(streamed === batch)
      assert(
        batch === Seq(
          (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 3.0),
          (Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1L, 5.0),
          (Timestamp.valueOf("2024-01-01 11:00:00"), "click", 1L, 3.0)
        )
      )
    } finally q.stop()
  }

  test("stateful per-user rollup accumulates across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStreams
      .runningUserStats(stream.toDS())
      .writeStream
      .format("memory")
      .queryName("user_stats")
      .outputMode(OutputMode.Update())
      .start()
    try {
      stream.addData(UserEvent(1L, "click", 1.0), UserEvent(1L, "view", 2.0))
      q.processAllAvailable()
      stream.addData(UserEvent(1L, "click", 4.0), UserEvent(2L, "click", 7.0))
      q.processAllAvailable()
      val latest = spark
        .table("user_stats")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_value"))
        .as[(Long, Long, Double)]
        .collect()
        .toMap0
      assert(latest(1L) === (3L, 7.0))
      assert(latest(2L) === (1L, 7.0))
    } finally q.stop()
  }

  implicit class Tup3Ops(rows: Array[(Long, Long, Double)]) {
    def toMap0: Map[Long, (Long, Double)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("event-time derivation from int64 nanos is exact") {
    import spark.implicits._
    val ns = 1704067200123456789L // 2024-01-01 00:00:00.123456789
    val got = Seq(ns)
      .toDF("ts")
      .select(expr("timestamp_micros(ts DIV 1000)").as("event_time"))
      .as[Timestamp]
      .head()
    assert(got === Timestamp.valueOf("2024-01-01 00:00:00.123456"))
  }
}
