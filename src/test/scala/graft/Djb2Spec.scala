package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The reference's partitioner, with its row-loss bug fixed (SURVEY.md §2.2
  * item 7): hashing must send every key to a bucket in [0, MOD) and lose
  * nothing across the shuffle — the property the reference fails.
  */
class Djb2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** djb2 with int32 wrap, reference algorithm, computed independently. */
  private def djb2Ref(s: String): Int = {
    var h = 5381
    for (c <- s) h = ((h << 5) + h) + c
    h
  }

  test("djb2 expression matches the int32-wrapped reference algorithm") {
    GraftFunctions.register(spark)
    val words = Seq("triangle", "integral", "a", "", "hello world", "ZZZzzz")
    val got = words
      .toDF("w")
      .select(expr("djb2(w)"))
      .as[Int]
      .collect()
      .toSeq
    assert(got === words.map(djb2Ref))
  }

  test("reference keys really do hash negative (the bug we must not port)") {
    // verified against the JS: "triangle" -> -9, "integral" -> -1 with MOD=10
    assert(djb2Ref("aeginrst") < 0 || djb2Ref("triangle") < 0)
  }

  test("property: pmod(djb2) bucketing loses no rows and stays in range") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(5000)(rnd.alphanumeric.take(rnd.nextInt(15) + 1).mkString)
    val mod = 10
    val buckets = words
      .toDF("w")
      .select(expr(s"pmod(djb2(w), $mod)").as("b"))
      .groupBy("b")
      .count()
      .collect()
    val total = buckets.map(_.getLong(1)).sum
    assert(total === words.size, "no rows lost across the bucketing shuffle")
    assert(buckets.forall { r => val b = r.getInt(0); b >= 0 && b < mod },
      "all buckets in [0, MOD)")
  }

  test("djb2 participates in codegen (no interpreted fallback errors)") {
    GraftFunctions.register(spark)
    val n = spark
      .range(1000)
      .select(expr("djb2(CAST(id AS STRING))").as("h"))
      .filter(col("h").isNotNull)
      .count()
    assert(n === 1000)
  }
}
