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

  /** The shared two-stage aggregate: per-(key, salt) partials, then the
    * per-key merge and canonical members-string projection. Both salted
    * variants delegate here so the formatting rule (numeric sort first,
    * stringify after — array_join wants strings) lives in ONE place.
    */
  private def twoStageCollect(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      saltCol: Column
  ): DataFrame =
    df.groupBy(col(keyCol), saltCol.as("_salt"))
      .agg(collect_set(col(valCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(
        sort_array(array_distinct(flatten(collect_list(col("_partial")))))
          .as("_merged")
      )
      .select(
        col(keyCol),
        array_join(transform(col("_merged"), v => v.cast("string")), ",")
          .as("members"),
        size(col("_merged")).cast("long").as("n_distinct")
      )

  /** Hot-key distinct-collect: per key, the sorted distinct values of
    * `valCol` (joined to a string) + their count, two-stage via salting.
    */
  def saltedCollectSet(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      saltN: Int = 8
  ): DataFrame =
    twoStageCollect(df, keyCol, valCol, salt(saltN))

  /** Keys carrying at least `minShare` of the rows — the ones worth
    * salting. One partial-aggregable count pass; the driver receives at
    * most 1/minShare keys (a HARD bound: more keys cannot each exceed the
    * share), so the collect is O(1/minShare) whatever the corpus size.
    */
  def heavyKeys(df: DataFrame, keyCol: String, minShare: Double): Seq[Any] = {
    require(minShare > 0 && minShare <= 1, "minShare in (0, 1]")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
    val total = counts.agg(sum(col("_n")).as("_tot"))
    counts
      .crossJoin(broadcast(total))
      .filter(col("_n") >= col("_tot") * minShare)
      .select(col(keyCol))
      .collect()
      .map(_.get(0))
      .toSeq
  }

  /** [[saltedCollectSet]] with AUTO-DETECTED hot keys: one counting pass
    * finds the keys above `minShare`, and only THOSE are spread over
    * saltN sub-keys — light keys take salt 0, so their stage-1 partial is
    * already the full per-key set and stage 2 merges exactly one row per
    * light key. One plan, one data pass (plus the bounded detection
    * pass); the blanket variant pays saltN-way state spreading for every
    * key, hot or not.
    */
  def autoSaltedCollectSet(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      saltN: Int = 8,
      minShare: Double = 0.1
  ): DataFrame = {
    val heavy = heavyKeys(df, keyCol, minShare)
    // NULL is a first-class skew key (missing/unparsed keys are a common
    // hot group) and `isin` is three-valued — NULL IN (...) is never TRUE
    // — so null-hotness gets its own IS NULL branch
    val nonNull = heavy.filterNot(_ == null)
    val isHot = {
      val inList =
        if (nonNull.nonEmpty) coalesce(col(keyCol).isin(nonNull: _*), lit(false))
        else lit(false)
      if (heavy.exists(_ == null)) inList || col(keyCol).isNull else inList
    }
    twoStageCollect(df, keyCol, valCol, when(isHot, salt(saltN)).otherwise(lit(0L)))
  }
}
