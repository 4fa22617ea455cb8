package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.{RowCheck, UniqueCheck}

/** Expectations-suite guarantees: exact violation counts on injected bad
  * rows, null handling (a null never silently passes a guarded check),
  * and the single-scan plan shape — all row checks against one table are
  * one aggregate over one scan, not one scan per check.
  */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("row + uniqueness checks count injected violations exactly") {
    val df = Seq(
      (1L, 10, "ok"),
      (2L, -5, "ok"), // range violation
      (2L, 20, "ok"), // duplicate key
      (3L, 30, null), // null violation (guarded)
      (4L, 200, "ok") // range violation
    ).toDF("id", "v", "s")
    val rep = Expectations
      .evaluate(
        "t",
        df,
        Seq(
          UniqueCheck("t.id_unique", col("id")),
          RowCheck("t.v_0_100", not(coalesce(col("v").between(0, 100), lit(false)))),
          RowCheck("t.s_not_null", col("s").isNull)
        )
      )
      .orderBy("check_name")
      .as[(String, String, Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(
      rep === Seq(
        ("t.id_unique", "t", 1L, 5L, false),
        ("t.s_not_null", "t", 1L, 5L, false),
        ("t.v_0_100", "t", 2L, 5L, false)
      )
    )
  }

  test("foreign key counts orphans; duplicate parent keys do not multiply") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "orphan"), (1L, "c")).toDF("fk", "x")
    val parent = Seq((1L, "p"), (1L, "p-dup"), (2L, "q")).toDF("pk", "y")
    val rep = Expectations
      .foreignKey("c.fk_p", "child", child, "fk", parent, "pk")
      .as[(String, String, Long, Long, Boolean)]
      .collect()
      .head
    assert(rep === (("c.fk_p", "child", 1L, 4L, false)), "total stays 4 despite dup parent")
  }

  test("all-pass contract reports passed=true everywhere") {
    val df = Seq((1L, 5), (2L, 6)).toDF("id", "v")
    val rep = Expectations
      .evaluate(
        "t",
        df,
        Seq(
          UniqueCheck("t.id_unique", col("id")),
          RowCheck("t.v_pos", not(coalesce(col("v") > 0, lit(false))))
        )
      )
      .select("passed")
      .as[Boolean]
      .collect()
    assert(rep.forall(identity))
  }

  test("observe(): pipeline counters ride the SAME pass as the transform") {
    // the monitoring twin of the expectations suite: a cleaning filter
    // instrumented with observe() reports input/drop counters from the
    // one existing action — no second scan, no separate count() job
    val obs = org.apache.spark.sql.Observation("gate")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = docs
      .observe(
        obs,
        count(lit(1)).as("n_in"),
        sum(when(length(col("text")) < 100, 1L).otherwise(0L)).as("n_short")
      )
      .filter(length(col("text")) >= 100)
      .count()
    val m = obs.get
    val nIn = m("n_in").asInstanceOf[Long]
    val nShort = m("n_short").asInstanceOf[Long]
    assert(nIn > 0 && kept === nIn - nShort, s"in=$nIn short=$nShort kept=$kept")
  }

  test("row checks share ONE scan: a multi-check evaluate plans a single relation") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
    val rep = Expectations.evaluate(
      "t",
      df,
      Seq(
        RowCheck("a", col("v") > 5),
        RowCheck("b", col("v") < 1),
        RowCheck("c", col("id") > 900)
      )
    )
    val scans = rep.queryExecution.optimizedPlan
      .collect { case r: org.apache.spark.sql.catalyst.plans.logical.LeafNode => r }
    assert(scans.size === 1, s"expected one scan for three row checks, got ${scans.size}")
  }

  test("empty input is vacuously valid: 0 violations, passed=true (not NULL-unboxed false)") {
    import spark.implicits._
    // a vacuously-valid empty micro-batch must PASS: sum(when(...)) over
    // zero rows is NULL, and an unguarded report would unbox passed=NULL
    // to false — quarantining empty batches and rejecting empty commits
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val rep = Expectations
      .evaluate("t", empty, Seq(
        RowCheck("r", col("v") < 0),
        UniqueCheck("u", col("id"))
      ))
      .collect()
    assert(rep.length === 2)
    rep.foreach { r =>
      assert(r.getAs[Long]("violations") === 0L, r.toString)
      assert(r.getAs[Long]("total") === 0L)
      assert(r.getAs[Boolean]("passed"), "empty input must pass, not NULL->false")
    }
    val fk = Expectations
      .foreignKey("fk", "child", empty, "id", Seq((1L, 1L)).toDF("id", "v"), "id")
      .collect()
    assert(fk.head.getAs[Long]("violations") === 0L)
    assert(fk.head.getAs[Boolean]("passed"))
  }
}
