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
}
