package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Percentiles

/** The bounded two-pass exact percentile must be BIT-IDENTICAL to Spark's
  * built-in `percentile` (whose interpolation formula it replicates) — the
  * built-in is the semantics anchor; the operator exists to bound state.
  */
class PercentilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("two-pass exact percentiles == built-in percentile, bit-exact") {
    val li = Tables.lineitem(spark, sf)
    val base = li.selectExpr(
      "l_returnflag",
      "stack(2, 'qty', CAST(l_quantity AS DOUBLE), " +
        "'price', CAST(l_extendedprice AS DOUBLE)) AS (vc, v)"
    )
    val got = Percentiles
      .exactPercentiles(
        base,
        Seq("l_returnflag"),
        Map("qty" -> Seq(0.25, 0.5, 0.75), "price" -> Seq(0.25, 0.5, 0.75))
      )
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val expected = li
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75))").as("q"),
        expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.25, 0.5, 0.75))").as("pr")
      )
      .collect()
      .flatMap { r =>
        val flag = r.getString(0)
        val ps = Seq(0.25, 0.5, 0.75)
        ps.zip(r.getSeq[Double](1)).map { case (p, v) => (flag, "qty", p) -> v } ++
          ps.zip(r.getSeq[Double](2)).map { case (p, v) => (flag, "price", p) -> v }
      }
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(
        java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(expected(k)),
        s"$k: got $v expected ${expected(k)}"
      )
    }
  }

  test("edge cases: single-row group, constant group, two-row interpolation") {
    import spark.implicits._
    val df = Seq(
      ("one", 42.0),
      ("const", 7.0), ("const", 7.0), ("const", 7.0),
      ("two", 1.0), ("two", 2.0)
    ).toDF("g", "v").withColumn("vc", lit("x"))
    val got = Percentiles
      .exactPercentiles(df, Seq("g"), Map("x" -> Seq(0.0, 0.5, 1.0)), nBuckets = 4)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    assert(got(("one", 0.0)) == 42.0 && got(("one", 0.5)) == 42.0 && got(("one", 1.0)) == 42.0)
    assert(got(("const", 0.5)) == 7.0 && got(("const", 1.0)) == 7.0)
    assert(got(("two", 0.0)) == 1.0 && got(("two", 0.5)) == 1.5 && got(("two", 1.0)) == 2.0)
  }

  test("degenerate buckets are skew-free: constant and 99%-one-value groups rank distinct values") {
    import spark.implicits._
    // constant group: mn == mx, width fallback 1.0 — every row lands in
    // bucket 0. 99%-one-value group: the hot value's bucket holds almost
    // all rows. Pass 2 ranks DISTINCT values, so both collapse: the hot
    // value is ONE window row regardless of its duplicate count.
    val constant = (0 until 10000).map(_ => ("const", 5.0))
    val hot = (0 until 9900).map(_ => ("hot", 1.0)) ++
      (0 until 100).map(i => ("hot", 2.0 + i))
    val df = (constant ++ hot).toDF("g", "v").withColumn("vc", lit("x"))
    val ps = Seq(0.01, 0.5, 0.99)
    val got = Percentiles
      .exactPercentiles(df, Seq("g"), Map("x" -> ps), nBuckets = 16)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val expected = df
      .groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("q"))
      .collect()
      .flatMap(r => ps.zip(r.getSeq[Double](1)).map { case (p, v) => (r.getString(0), p) -> v })
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(
        java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(expected(k)),
        s"$k: got $v expected ${expected(k)}"
      )
    }
    // and the plan property itself: the pass-2 window input is an
    // aggregate over (group, bucket, v) — partial_count visible — so the
    // hot value cannot materialize one row per duplicate into the sort
    val plan = Percentiles
      .exactPercentiles(df, Seq("g"), Map("x" -> ps), nBuckets = 16)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("partial_count"), plan.take(1500))
  }
}
