package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (edit distance) for entity dedup.
  *
  * Shape: exact-distinct the names FIRST (the cheap hash-shuffle that
  * collapses the usual heavy duplication), then a blocked pairwise
  * Levenshtein among the distinct values. The length band |len(a)-len(b)|
  * <= maxDist is a correct blocker (edit distance >= length difference)
  * and sits BEFORE the O(m·n) levenshtein in the join condition — conjunct
  * order is preserved and && short-circuits, so the expensive predicate
  * runs only on length-compatible pairs. For name sets too large for a
  * within-band quadratic, the q-gram MinHash-LSH in [[Dedup]] is the scale
  * path; this operator is the exact verifier of its candidates.
  */
object Fuzzy {

  /** Distinct-name pairs (a < b) with 1 <= levenshtein <= maxDist. */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).distinct()
    val l = names.select(col("name").as("a_name"), length(col("name")).as("a_len"))
    val r = names.select(col("name").as("b_name"), length(col("name")).as("b_len"))
    l.join(
      r,
      col("a_name") < col("b_name") &&
        abs(col("a_len") - col("b_len")) <= maxDist &&
        levenshtein(col("a_name"), col("b_name")) <= maxDist
    ).select(
      col("a_name"),
      col("b_name"),
      levenshtein(col("a_name"), col("b_name")).cast("long").as("dist")
    )
  }
}
