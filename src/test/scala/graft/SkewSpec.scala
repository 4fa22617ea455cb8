package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Auto-salting guarantees: heavy-key detection respects the 1/minShare
  * bound, detection never changes results (auto == blanket == plain), and
  * light keys stay on the unsalted path.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skewed() = {
    // one hot key with 80% of rows, many light keys
    val hot = (1 to 800).map(i => ("hot", i % 37))
    val light = (1 to 200).map(i => (s"k${i % 20}", i))
    spark.createDataFrame(hot ++ light).toDF("k", "v").repartition(8)
  }

  test("heavyKeys: only above-share keys, never more than 1/minShare of them") {
    val hk = Skew.heavyKeys(skewed(), "k", minShare = 0.1)
    assert(hk === Seq("hot"))
    val all = Skew.heavyKeys(skewed(), "k", minShare = 0.0001)
    assert(all.size === 21, "at a vanishing share every key qualifies")
  }

  test("autoSaltedCollectSet equals the blanket-salted and plain results") {
    val df = skewed()
    def canon(res: org.apache.spark.sql.DataFrame) =
      res.select("k", "members", "n_distinct").as[(String, String, Long)].collect().sortBy(_._1).toSeq
    val auto = canon(Skew.autoSaltedCollectSet(df, "k", "v", saltN = 8, minShare = 0.1))
    val blanket = canon(Skew.saltedCollectSet(df, "k", "v", saltN = 8))
    assert(auto === blanket)
    val plain = df
      .groupBy("k")
      .agg(sort_array(collect_set(col("v"))).as("m"))
      .select(
        col("k"),
        array_join(transform(col("m"), v => v.cast("string")), ",").as("members"),
        size(col("m")).cast("long").as("n_distinct")
      )
    assert(auto === canon(plain))
  }

  test("a NULL hot key is spread too (isin is three-valued; IS NULL branch required)") {
    import spark.implicits._
    val hotNull = (1 to 800).map(i => (Option.empty[String], i % 37)) ++
      (1 to 200).map(i => (Some(s"k${i % 20}"), i))
    val df = hotNull.toDF("k", "v").repartition(8)
    val heavy = Skew.heavyKeys(df, "k", minShare = 0.1)
    assert(heavy === Seq(null), "the null key carries 80% of rows")
    // result correctness under the null-hot corpus
    val auto = Skew
      .autoSaltedCollectSet(df, "k", "v", saltN = 8, minShare = 0.1)
      .filter(col("k").isNull)
      .select("n_distinct")
      .as[Long]
      .collect()
    assert(auto === Array(37L))
    // and the hot NULL group is actually spread across salts in stage 1
    val nonNull = heavy.filterNot(_ == null)
    val isHot = {
      val inList =
        if (nonNull.nonEmpty) coalesce(col("k").isin(nonNull: _*), lit(false))
        else lit(false)
      if (heavy.exists(_ == null)) inList || col("k").isNull else inList
    }
    val spread = df
      .groupBy(col("k"), when(isHot, Skew.salt(8)).otherwise(lit(0L)).as("_salt"))
      .agg(count(lit(1)))
      .filter(col("k").isNull)
      .count()
    assert(spread > 1L, "null-keyed rows must not funnel into one (null, 0) group")
  }

  test("light keys take salt 0: stage-1 emits one partial per light key") {
    val df = skewed()
    val heavy = Skew.heavyKeys(df, "k", minShare = 0.1)
    val saltCol =
      when(col("k").isin(heavy: _*), Skew.salt(8)).otherwise(lit(0L))
    val stage1 = df.groupBy(col("k"), saltCol.as("_salt")).agg(count(lit(1)))
    val perKey = stage1.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(perKey("hot") > 1L, "the hot key is spread over salts")
    assert(perKey.filter(_._1 != "hot").values.forall(_ == 1L), "light keys are not spread")
  }
}
