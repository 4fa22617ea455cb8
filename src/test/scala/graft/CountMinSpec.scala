package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinSketchAgg

/** Count-Min sketch guarantees behind `t_cm_freq`: no undercount for ANY
  * item (not just the oracle-checked top-20), merge associativity under
  * repartitioning, and the width-bounded total mass per row.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val (depth, width) = (4, 256)

  private def tokens = Tables
    .documents(spark, sf)
    .select(explode(operators.Text.tokensAll(col("text"))).as("t"))

  test("estimate never undercounts, for every token in the vocabulary") {
    val sketch = tokens.agg(CountMinSketchAgg.cmSketch(col("t"), depth, width).as("sk"))
    val bad = tokens
      .groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(sketch))
      .withColumn("est", CountMinSketchAgg.estimate(col("sk"), col("t"), depth, width))
      .filter(col("est") < col("c"))
    assert(bad.count() === 0, "CM estimates must upper-bound true counts")
  }

  test("sketch is partitioning-invariant (merge associativity)") {
    val a = tokens.coalesce(1)
      .agg(CountMinSketchAgg.cmSketch(col("t"), depth, width))
      .head().getSeq[Long](0)
    val b = tokens.repartition(13)
      .agg(CountMinSketchAgg.cmSketch(col("t"), depth, width))
      .head().getSeq[Long](0)
    assert(a === b, "counter matrix must not depend on partitioning")
  }

  test("each sketch row conserves total mass (sums to N)") {
    val n = tokens.count()
    val sk = tokens
      .agg(CountMinSketchAgg.cmSketch(col("t"), depth, width))
      .head().getSeq[Long](0)
    (0 until depth).foreach { j =>
      assert(sk.slice(j * width, (j + 1) * width).sum === n, s"row $j")
    }
  }
}
