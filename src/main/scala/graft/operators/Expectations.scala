package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ / dbt-test / Delta
  * constraint surface): a table ships with a contract — keys are unique,
  * foreign keys resolve, values sit in their domains, derived columns are
  * consistent — and the engine evaluates the whole contract as a
  * violations report, not row-by-row assertions.
  *
  * Scale shape: ALL row-level checks against one table fold into a SINGLE
  * scan — each check is one conditional-sum slot in one zero-group
  * hash-aggregate, so the map-side partials are a handful of longs per
  * task regardless of table size. A uniqueness check adds one exact
  * `count distinct` on the key (one shuffle, Catalyst's expand+partial
  * plan); a foreign-key check is one join against the parent's distinct
  * key set. Nothing collects rows: the report is O(#checks).
  */
object Expectations {

  /** One expectation against a single table. */
  sealed trait Check { def name: String }

  /** Row-level contract: `violated` is the per-row VIOLATION predicate
    * (true = row breaks the contract). Null-safety is the caller's
    * responsibility — wrap in coalesce so a null never silently passes.
    */
  final case class RowCheck(name: String, violated: Column) extends Check

  /** Key-uniqueness contract: violations = `count(*) - count(distinct key)`,
    * so 0 iff the key is unique AND non-null. NULL-keyed rows are ALWAYS
    * violations (countDistinct ignores NULLs — one null-keyed row already
    * counts as 1): deliberate, since a "unique key" that admits NULLs isn't
    * a key, and it matches the DuckDB oracle's arithmetic bit-for-bit.
    * Callers wanting nullable-unique should filter nulls first or pair with
    * a RowCheck on key.isNull.
    */
  final case class UniqueCheck(name: String, key: Column) extends Check

  private val reportCols =
    Seq("check_name", "table_name", "violations", "total", "passed")

  /** Evaluate every `check` against `df` in one pass; returns one report
    * row per check: (check_name, table_name, violations, total, passed).
    */
  def evaluate(tableName: String, df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    // internal slot names are index-based: check names are user strings
    // (often dotted) and must not be parsed as nested-field references
    // coalesce: on an EMPTY table sum(...) is NULL, which would make
    // `passed` NULL and downstream getAs[Boolean] unbox it to false —
    // a vacuously-valid empty micro-batch must report 0 violations / pass
    val aggs = count(lit(1)).cast("long").as("_total") +: checks.zipWithIndex.map {
      case (RowCheck(_, viol), i) =>
        coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).cast("long").as(s"_v_$i")
      case (UniqueCheck(_, key), i) =>
        (count(lit(1)) - countDistinct(key)).cast("long").as(s"_v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = array(checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"_v_$i").as("violations")
      )
    }: _*)
    one
      .select(explode(pairs).as("p"), col("_total"))
      .select(
        col("p.check_name").as("check_name"),
        lit(tableName).as("table_name"),
        col("p.violations").as("violations"),
        col("_total").as("total"),
        (col("p.violations") === 0L).as("passed")
      )
  }

  /** Referential-integrity contract: every non-resolving child row is a
    * violation. One left join of the child keys against the parent's
    * distinct key set (dedup guards against row multiplication if the
    * parent key itself has duplicates — that's its own UniqueCheck), then
    * the same zero-group aggregate. Report row shape matches [[evaluate]].
    */
  def foreignKey(
      name: String,
      childTable: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String
  ): DataFrame =
    child
      .select(col(childKey).as("_ck"))
      .join(
        parent.select(col(parentKey).as("_pk")).distinct(),
        col("_ck") === col("_pk"),
        "left"
      )
      .agg(
        count(lit(1)).cast("long").as("total"),
        // coalesce: an empty child yields sum=NULL → passed=NULL otherwise
        coalesce(sum(when(col("_pk").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("violations")
      )
      .select(
        lit(name).as("check_name"),
        lit(childTable).as("table_name"),
        col("violations"),
        col("total"),
        (col("violations") === 0L).as("passed")
      )

  /** Union a set of per-table reports into one suite report, sorted for
    * deterministic presentation.
    */
  def suite(reports: Seq[DataFrame]): DataFrame =
    reports
      .reduce(_ unionByName _)
      .select(reportCols.map(col): _*)
      .orderBy("check_name")
}
