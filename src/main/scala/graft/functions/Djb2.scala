package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** djb2 string hash as a native Catalyst expression (with codegen) — the
  * reference's partitioner function (`/root/reference/src/index.js:32-39`:
  * h = ((h<<5)+h)+code, truncated to int32 each step over UTF-16 code
  * units).
  *
  * Deliberately NOT ported: the reference's `hash % MOD`, whose JS sign
  * semantics sends ~half the key space to negative buckets that are then
  * silently dropped (SURVEY.md §2.2 item 7). Bucketing here goes through
  * `pmod`, which implements the evident intent; the no-rows-lost property
  * the reference violates is pinned by Djb2Spec.
  */
case class Djb2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"djb2 requires a string argument, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 5381
    var i = 0
    while (i < s.length) {
      h = ((h << 5) + h) + s.charAt(i)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        java.lang.String ${ev.value}_s = $c.toString();
        int ${ev.value}_h = 5381;
        for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_s.length(); ${ev.value}_i++) {
          ${ev.value}_h = ((${ev.value}_h << 5) + ${ev.value}_h) + ${ev.value}_s.charAt(${ev.value}_i);
        }
        ${ev.value} = ${ev.value}_h;
      """
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFunctions {

  /** Register engine SQL functions on a session; idempotent. After this,
    * `expr("djb2(col)")` / SQL `SELECT djb2(x)` work, ditto `vec_dot`,
    * `vec_cosine`, `sort_chars`, `sorted_intersect_count`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("djb2", es => Djb2(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sort_chars", es => SortChars(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      es => SortedIntersectCount(es(0), es(1)),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "min_shingle_md5",
      es => MinShingleMd5(es(0), es(1).eval().asInstanceOf[Number].intValue),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "minhash_sig",
      es => MinHashSig(es(0), es(1).eval().asInstanceOf[Number].intValue),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count_long",
      es => SortedIntersectCountLong(es(0), es(1)),
      "built-in"
    )
    reg.createOrReplaceTempFunction("simhash60", es => SimHash60(es.head), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("strip_accents", es => StripAccents(es.head), "built-in")
    reg.createOrReplaceTempFunction("md5_top60", es => Md5Top60(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles",
      es => WordShingles(es(0), es(1).eval().asInstanceOf[Number].intValue),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "word_shingles_all",
      es => WordShinglesAll(es(0), es(1).eval().asInstanceOf[Number].intValue),
      "built-in"
    )
    // aggregates: SQL `cm_sketch(x, 4, 256)` / `top_k(score, id, 10)`
    reg.createOrReplaceTempFunction(
      "cm_sketch",
      es =>
        CountMinSketchAgg(
          es(0),
          es(1).eval().asInstanceOf[Number].intValue,
          es(2).eval().asInstanceOf[Number].intValue
        ).toAggregateExpression(),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "top_k",
      es =>
        TopKByScore(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression(),
      "built-in"
    )
  }
}
