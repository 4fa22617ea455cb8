package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HllAgg

/** HyperLogLog guarantees behind `t_hll_distinct`: accuracy inside the
  * published ~1.04/√m bound on a cardinality the fixture can't reach,
  * duplicate-insensitivity, max-merge partitioning invariance, and
  * map-side partial aggregation (the fixed-size state is the point).
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 256

  private def keys(n: Int) =
    (0 until n).map(i => s"hll-key-$i").toDF("k")

  test("estimate within 4 standard errors (1.04/sqrt(m)) at 50k distinct") {
    val n = 50000
    val est = keys(n)
      .agg(HllAgg.hll(col("k"), m).as("sk"))
      .select(HllAgg.estimate(col("sk"), m))
      .head()
      .getLong(0)
    val bound = (4 * 1.04 / math.sqrt(m.toDouble) * n).toLong
    assert(
      math.abs(est - n) <= bound,
      s"estimate $est vs true $n is outside +/-$bound"
    )
  }

  test("duplicates don't move the sketch: multiset and set agree exactly") {
    val ks = keys(5000)
    def words(df: org.apache.spark.sql.DataFrame) =
      df.agg(HllAgg.hll(col("k"), m)).head().getSeq[Int](0)
    val tripled = ks.union(ks).union(ks)
    assert(words(tripled) === words(ks), "hll must be a pure function of the SET")
  }

  test("sketch is partitioning-invariant (max-merge associativity)") {
    val ks = keys(10000)
    val a = ks.coalesce(1).agg(HllAgg.hll(col("k"), m)).head().getSeq[Int](0)
    val b = ks.repartition(13).agg(HllAgg.hll(col("k"), m)).head().getSeq[Int](0)
    assert(a === b, "bucket ranks must not depend on partitioning")
  }

  test("grouped sketch partially aggregates before the exchange") {
    val df = keys(10000)
      .withColumn("g", pmod(crc32(col("k")), lit(7)))
      .repartition(8)
      .groupBy(col("g"))
      .agg(HllAgg.hll(col("k"), m).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.contains("partial_hllagg") || plan.contains("merge_hllagg"),
      s"expected map-side partial hll aggregation before the exchange:\n${plan.take(1500)}"
    )
    assert(plan.contains("Exchange hashpartitioning"), "group-by shuffles on the key")
  }
}
