package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketized) range join.
  *
  * A raw `|a.t - b.t| <= w` join condition has no equi-key, so Spark plans
  * it as a broadcast-nested-loop — O(N·M) comparisons and a broadcast of a
  * whole side: the plan that cannot run at 100 TB. Bucketizing time by the
  * window width turns it into an equi-join: any pair within `w` differs by
  * at most one bucket, so the left side emits (b-1, b, b+1) and the right
  * side emits b, the join key is the bucket, and an exact predicate
  * refines. Shuffle volume is 3·N + M keyed rows; per-task work is bounded
  * by the events that land in one bucket (window-width time density), not
  * by the corpus.
  */
object RangeJoin {

  /** Per left row: the number of OTHER rows within `windowNs` of its
    * timestamp (self excluded by id). Zero-match rows are kept (count 0).
    * `ts` must be integer (epoch nanos — the events table's native form).
    */
  def timeProximityCounts(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      windowNs: Long
  ): DataFrame = {
    // integer DIV, not `/`: epoch nanos exceed double's 53-bit mantissa,
    // so float division would mis-bucket near bucket boundaries
    val l = events
      .select(col(idCol).as("l_id"), col(tsCol).as("l_ts"))
      .withColumn(
        "bucket",
        explode(
          array(
            expr(s"l_ts DIV $windowNs") - 1,
            expr(s"l_ts DIV $windowNs"),
            expr(s"l_ts DIV $windowNs") + 1
          )
        )
      )
    val r = events
      .select(col(idCol).as("r_id"), col(tsCol).as("r_ts"))
      .withColumn("bucket", expr(s"r_ts DIV $windowNs"))
    // refine predicate inside the join: each qualifying pair shares exactly
    // one bucket (the right row's), so no post-join dedup is needed
    l.join(
      r,
      l("bucket") === r("bucket") &&
        abs(col("l_ts") - col("r_ts")) <= windowNs &&
        col("l_id") =!= col("r_id"),
      "left_outer"
    )
      .groupBy(col("l_id").as("event_id"))
      .agg(count(col("r_id")).as("n_nearby"))
  }
}
