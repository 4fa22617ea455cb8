package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL accuracy bound backing `q_approx_distinct`'s rows-only correctness
  * entry: approx_count_distinct's relative error vs the exact distinct count
  * on real table columns at the default rsd (0.05).
  */
class ApproxDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct is within 3*rsd of exact on lineitem keys") {
    val l = Tables.lineitem(spark, sf)
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach { c =>
      val exact = l.select(countDistinct(col(c))).head().getLong(0).toDouble
      val approx = l.select(approx_count_distinct(col(c))).head().getLong(0).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.15, s"$c: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("approx_percentile tracks exact percentile within the accuracy bound") {
    val l = Tables.lineitem(spark, sf)
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val exact = l
        .select(expr(s"percentile(l_extendedprice, $p)"))
        .head()
        .getDouble(0)
      val approx = l
        .select(expr(s"approx_percentile(l_extendedprice, $p, 1000)"))
        .head()
        .getDouble(0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05, s"p=$p approx=$approx exact=$exact relErr=$relErr")
    }
  }
}
