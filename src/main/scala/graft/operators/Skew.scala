package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting: spread a hot grouping key over `saltN`
  * sub-keys, aggregate partially per (key, salt), then merge the partials.
  *
  * When to use: Spark's map-side partial aggregation already flattens hot
  * keys for CHEAP aggregate state (sum/count). Salting earns its exchange
  * when per-key state is LARGE — `collect_set`/`collect_list` — where a hot
  * key would otherwise funnel its entire value set through one reducer
  * task. The two-stage shape keeps each first-stage task's state at
  * ~1/saltN of the hot key's values, at the cost of one extra (tiny,
  * per-(key,salt)-row) exchange. Exact for any decomposable aggregate.
  */
object Skew {

  /** A deterministic-enough row spreader: partition-local row ids modulo
    * saltN. The salt value never reaches the result (any assignment is
    * correct — it only balances state), so nondeterminism here is benign.
    */
  def salt(saltN: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltN.toLong))

  /** Hot-key distinct-collect: per key, the sorted distinct values of
    * `valCol` (joined to a string) + their count, two-stage via salting.
    */
  def saltedCollectSet(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      saltN: Int = 8
  ): DataFrame =
    df.groupBy(col(keyCol), salt(saltN).as("_salt"))
      .agg(collect_set(col(valCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(
        sort_array(array_distinct(flatten(collect_list(col("_partial")))))
          .as("_merged")
      )
      .select(
        col(keyCol),
        // sort numerically first, stringify after (array_join wants strings)
        array_join(transform(col("_merged"), v => v.cast("string")), ",")
          .as("members"),
        size(col("_merged")).cast("long").as("n_distinct")
      )
}
