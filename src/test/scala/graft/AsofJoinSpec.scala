package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Pins the as-of join's edge semantics: <= ties, no-prior-row nulls,
  * latest-wins among multiple earlier rows, per-key isolation.
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leftAsof: latest <= match per key; ties inclusive; null when none") {
    val left = Seq(
      (1L, 10L, "l-a"), // tie with right at t=10 → sees it
      (1L, 20L, "l-b"), // after r@15 → sees 200
      (1L, 5L, "l-c"), // before any right row → null
      (2L, 50L, "l-d") // other key: only key-2 rights visible
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0),
      (1L, 15L, 200.0),
      (2L, 49L, 300.0),
      (3L, 1L, 999.0) // never joined: key 3 has no left rows
    ).toDF("k", "t", "v")
    val got = AsofJoin
      .leftAsof(left, right, "k", "t", "v", "asof_v")
      .select("tag", "asof_v")
      .as[(String, Option[Double])]
      .collect()
      .toMap
    assert(got === Map(
      "l-a" -> Some(100.0),
      "l-b" -> Some(200.0),
      "l-c" -> None,
      "l-d" -> Some(300.0)
    ))
  }

  test("leftAsof tieCol: equal-time right rows resolve to the greatest tie, partition-order-free") {
    val left = Seq((1L, 10L, "l")).toDF("k", "t", "tag")
    // two right rows at the SAME (key, time): without a tiebreak the
    // carried payload depends on partition order; with tieCol the
    // greatest tie id must win under ANY physical ordering
    Seq(
      Seq((1L, 10L, "low", "<id:1>"), (1L, 10L, "high", "<id:2>")),
      Seq((1L, 10L, "high", "<id:2>"), (1L, 10L, "low", "<id:1>"))
    ).foreach { rows =>
      val right = rows.toDF("k", "t", "v", "rid").repartition(4)
      val got = AsofJoin
        .leftAsof(left, right, "k", "t", "v", "av", tieCol = Some("rid"))
        .select("av")
        .as[String]
        .head()
      assert(got === "high")
    }
  }

  test("leftAsof preserves every left row exactly once") {
    val left = Seq((1L, 1L, "x"), (1L, 1L, "y"), (9L, 9L, "z")).toDF("k", "t", "tag")
    val right = Seq((1L, 0L, 1.0)).toDF("k", "t", "v")
    val out = AsofJoin.leftAsof(left, right, "k", "t", "v", "av")
    assert(out.count() === 3)
  }
}
