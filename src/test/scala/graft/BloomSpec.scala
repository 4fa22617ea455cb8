package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFilterAgg

/** Bloom filter guarantees behind `d_bloom_delta`: the one-sided-error
  * contract (no false negatives, ever), merge associativity under
  * repartitioning, the false-positive path's existence at engineered
  * sizing, and the plan shape (one broadcast of the filter, map-only
  * probe).
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys(n: Int, tag: String) =
    (0 until n).map(i => s"$tag-key-$i").toDF("k")

  test("no false negatives: every inserted key tests positive, any bits/hashes") {
    for ((bits, hashes) <- Seq((256, 2), (1024, 3), (4096, 5))) {
      val ks = keys(500, s"m$bits")
      val filt = ks.agg(BloomFilterAgg.bloom(col("k"), bits, hashes).as("bf"))
      val missed = ks
        .crossJoin(broadcast(filt))
        .filter(!BloomFilterAgg.mightContain(col("bf"), col("k"), bits, hashes))
      assert(missed.count() === 0, s"false negative at bits=$bits hashes=$hashes")
    }
  }

  test("filter is partitioning-invariant (OR-merge associativity)") {
    val ks = keys(1000, "part")
    def words(parts: Int) = {
      val df = if (parts == 1) ks.coalesce(1) else ks.repartition(parts)
      df.agg(BloomFilterAgg.bloom(col("k"), 1024, 3)).head().getSeq[Long](0)
    }
    assert(words(1) === words(13), "bit array must not depend on partitioning")
  }

  test("false positives exist at undersized filters and are exactly the non-members that collide") {
    // 500 members into 256 bits saturates the filter enough that some of
    // 500 disjoint probes must collide on all hash positions — the path
    // d_bloom_delta's verify join exists to resolve
    val bits = 256
    val members = keys(500, "in")
    val probes = keys(500, "out")
    val filt = members.agg(BloomFilterAgg.bloom(col("k"), bits, 2).as("bf"))
    val fp = probes
      .crossJoin(broadcast(filt))
      .filter(BloomFilterAgg.mightContain(col("bf"), col("k"), bits, 2))
      .count()
    assert(fp > 0, "engineered-undersized filter must produce false positives")
    assert(fp < 500, "filter must still reject some non-members")
  }

  test("delta probe plan: filter rides ONE broadcast, probe stage is scan + project only") {
    val members = keys(2000, "corpus")
    val filt = members.agg(BloomFilterAgg.bloom(col("k"), 4096, 2).as("bf"))
    val probed = keys(2000, "delta")
      .crossJoin(broadcast(filt))
      .withColumn("c", BloomFilterAgg.mightContain(col("bf"), col("k"), 4096, 2))
      .drop("bf")
    val physical = probed.queryExecution.executedPlan.toString
    assert(
      physical.contains("BroadcastNestedLoopJoin") || physical.contains("BroadcastExchange"),
      s"filter must broadcast, not shuffle:\n$physical"
    )
    // the probe side must NOT shuffle the delta: a single exchange for the
    // one-row aggregate is fine, none may be keyed by the delta's rows
    assert(
      !physical.contains("hashpartitioning(k"),
      s"delta rows must not shuffle for a map-only probe:\n$physical"
    )
  }
}
