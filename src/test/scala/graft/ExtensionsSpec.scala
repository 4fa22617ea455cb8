package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.util.Cols

/** The Catalyst optimizer extension (graft.plans.GraftExtensions) must
  * rewrite the portable md5-60 idiom into the native kernel, without
  * changing a single value.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples =
    Seq("", "a", "listen", "the quick brown fox", "doc#42", "üß")

  test("md5Long chain is rewritten to the native Md5Top60 expression") {
    // Must be a file-backed plan: over a literal LocalRelation the optimizer
    // constant-folds the whole projection away before anything is visible.
    val df = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(Cols.md5Long(col("text")).as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(
      optimized.toLowerCase.contains("md5top60"),
      s"rule did not fire; optimized plan:\n$optimized"
    )
    assert(!optimized.contains("conv("), "the interpreted chain should be gone")
  }

  test("rewrite is value-identical to the hex-substring-conv chain") {
    // Reference values computed on the driver straight from MessageDigest.
    def expected(s: String): Long = {
      val d = java.security.MessageDigest
        .getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val got = samples
      .toDF("s")
      .select(col("s"), Cols.md5Long(col("s")).as("h"))
      .as[(String, Long)]
      .collect()
      .toMap
    samples.foreach { s =>
      assert(got(s) === expected(s), s"mismatch for input '$s'")
    }
  }

  test("rewrite fires on SQL text too (session-wide, not DSL-only)") {
    Tables
      .documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("ext_probe")
    val df = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS h FROM ext_probe"
    )
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("md5top60"), optimized)
  }

  test("custom aggregates work from SQL text: cm_sketch and top_k") {
    graft.functions.GraftFunctions.register(spark)
    Tables
      .documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("agg_probe")
    val sk = spark
      .sql("SELECT cm_sketch(lang, 2, 64) AS sk FROM agg_probe")
      .head()
      .getSeq[Long](0)
    val n = Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(sk.length === 128)
    assert(sk.slice(0, 64).sum === n, "row 0 mass = row count")
    val tk = spark
      .sql("SELECT top_k(CAST(n_chars AS DOUBLE), doc_id, 3) AS tk FROM agg_probe")
      .head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(tk.length === 3)
    assert(tk.map(_.getDouble(1)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
