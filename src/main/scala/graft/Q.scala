package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's public surface.
  *
  * Every operator the engine claims (SURVEY.md §2) is exposed as at least one
  * `Q`: `run` builds the Spark plan against the parquet tables under `sfDir`,
  * and `oracle` (when the semantics are ANSI-SQL-expressible) is the
  * equivalent DuckDB SQL over the same tables, used by the driver's
  * hash-compare correctness gate.
  *
  * Cross-engine determinism rules (see DESIGN.md):
  *   - integer outputs are LongType on the Spark side (DuckDB counts/lengths
  *     are BIGINT);
  *   - double aggregates go through exact DECIMAL accumulation and are cast
  *     back to double at the end, so summation order cannot change the value;
  *   - timestamps are emitted as epoch seconds or formatted strings;
  *   - arrays are sorted, or joined to a canonical string.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = ""
)
