package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries hold up
  * at 100 TB (scan-level pushdown, broadcast of small dims, partial
  * aggregation) must be visible in the plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    Registry.runners(name)(spark, sf).queryExecution.executedPlan.toString

  test("q6: filters are pushed to the parquet scan") {
    val plan = physical("q6_filter_agg")
    // the plan string truncates the PushedFilters list, so check its prefix
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual"), "range predicates reach the scan")
  }

  test("q1: scan reads only the referenced columns (pruning)") {
    val plan = physical("q1_agg")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("q5: dimension joins are broadcast, not shuffled") {
    val plan = physical("q5_join_nation")
    assert(plan.contains("BroadcastHashJoin"), "nation/supplier should broadcast")
  }

  test("wordcount: aggregation is partial (map-side combine) before exchange") {
    val plan = physical("wordcount")
    assert(
      plan.contains("partial_count") || plan.contains("HashAggregate"),
      "expected partial aggregation"
    )
    assert(plan.contains("Exchange hashpartitioning"), "group-by shuffles on the key")
  }

  test("anagram group-by partially aggregates (merge_collect_set) before its exchange") {
    val plan = physical("anagrams")
    // collect_set aggregates via ObjectHashAggregate (not codegen — expected);
    // the property that matters at scale is map-side partial aggregation
    // feeding a single hash exchange on the anagram key. Depending on AQE
    // final-plan rendering the partial shows as partial_/merge_collect_set.
    assert(
      plan.contains("partial_collect_set") || plan.contains("merge_collect_set"),
      plan.take(800)
    )
    assert(plan.contains("Exchange hashpartitioning"), plan.take(800))
  }

  test("stop-word anti-join broadcasts the stop list") {
    val plan = physical("wordcount_antijoin")
    assert(
      plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(800)
    )
  }
}
