package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Split

/** Determinism and boundedness properties of the dataset-assembly
  * operators behind `q_sample_stratified` and `q_pack_sequences` (the
  * value-level results are oracle-checked; these pin the properties the
  * oracle can't see: partitioning-invariance and state bounds).
  */
class SplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stratifiedSample is invariant under repartitioning and caps at k") {
    val docs = Tables.documents(spark, sf)
    val a = Split.stratifiedSample(docs, "doc_id", "source", k = 3)
    val b = Split.stratifiedSample(docs.repartition(7), "doc_id", "source", k = 3)
    assert(
      a.orderBy("source", "sample_rank").collect().toSeq ==
        b.orderBy("source", "sample_rank").collect().toSeq,
      "sample must be a pure function of ids, not of partitioning"
    )
    val perStratum = a.groupBy("source").count().collect()
    assert(perStratum.forall(_.getLong(1) <= 3), "no stratum may exceed k")
  }

  test("stratifiedSample picks the k smallest 52-bit hashes per stratum") {
    val docs = Tables.documents(spark, sf)
    val h52 = pmod(
      graft.util.Cols.md5Long(concat(col("doc_id").cast("string"), lit("#sample"))),
      lit(Split.TwoPow52)
    )
    // reference formulation: full window sort (the shape the aggregate
    // replaces at scale) — both must select the identical id set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("h"), col("doc_id"))
    val viaWindow = docs
      .select(col("source"), col("doc_id"), h52.as("h"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= 4)
      .select("source", "sample_rank", "doc_id")
    val viaAgg = Split.stratifiedSample(docs, "doc_id", "source", k = 4)
    assert(
      viaAgg.orderBy("source", "sample_rank").collect().toSeq ==
        viaWindow.orderBy("source", "sample_rank").collect().toSeq
    )
  }

  test("packSequences: packs are contiguous and boundaries respect the budget") {
    val docs = Tables.documents(spark, sf)
    val packed = Split
      .packSequences(
        docs.select(
          col("doc_id"),
          col("source"),
          size(operators.Text.tokensAll(col("text"))).as("n_tokens")
        ),
        "doc_id",
        "source",
        col("n_tokens"),
        budget = 128
      )
      .select("source", "doc_id", "n_tok", "cum", "pack_id")
      .collect()
      .groupBy(_.getString(0))

    packed.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // pack_id is exactly the budget-division of the doc's start offset
      sorted.foreach { r =>
        val start = r.getLong(3) - r.getLong(2)
        assert(r.getLong(4) == start / 128, s"$src doc ${r.getLong(1)}")
      }
      // pack ids are non-decreasing in doc order and start at pack 0
      assert(sorted.head.getLong(4) == 0L)
      assert(
        sorted.sliding(2).forall(p => p.length < 2 || p(0).getLong(4) <= p(1).getLong(4))
      )
    }
  }

  test("packSequences: two-level prefix sum is shardSize-invariant and sharded") {
    val docs = Tables
      .documents(spark, sf)
      .select(
        col("doc_id"),
        col("source"),
        size(operators.Text.tokensAll(col("text"))).as("n_tokens")
      )
    def run(shardSize: Long) = Split
      .packSequences(docs, "doc_id", "source", col("n_tokens"), budget = 128, shardSize)
      .select("source", "doc_id", "n_tok", "cum", "pack_id")
    // the prefix sum is associative: ANY shard granularity must produce the
    // identical cum/pack_id assignment (incl. shardSize=1, one doc per shard)
    val ref = run(1L << 20).orderBy("source", "doc_id").collect().toSeq
    assert(run(32L).orderBy("source", "doc_id").collect().toSeq == ref)
    assert(run(1L).orderBy("source", "doc_id").collect().toSeq == ref)

    // scale shape: the per-row running-sum window must partition by
    // (group, shard) — never one sort partition per source. The offsets
    // window (groups × shards rows) is the only group-partitioned one.
    val plan = run(32L).queryExecution.executedPlan.toString
    assert(
      "hashpartitioning\\([^)]*_shard".r.findFirstIn(plan).isDefined,
      s"expected the row-level window exchange to include _shard:\n$plan"
    )
  }

  test("targetMix: rates achieve the feasible max under the target shares") {
    val docs = Tables.documents(spark, sf)
    val targets = Seq(
      ("en", 400000L),
      ("zh", 150000L),
      ("es", 150000L),
      ("de", 150000L),
      ("fr", 150000L)
    )
    val out = Split.targetMix(docs, "doc_id", "lang", targets)
    val rates = out
      .select("lang", "n_domain", "target_ppm", "rate_ppm")
      .distinct()
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rates.keySet == targets.map(_._1).toSet, "one rate row per domain")
    // every rate is admissible and at least one domain is the binding
    // constraint (its expected kept count ~= its full count)
    assert(rates.values.forall { case (_, _, rate) => rate >= 0L && rate <= 1000000L })
    val t = rates.values.map { case (n, ppm, _) => n * 1000000L / ppm }.min
    rates.foreach { case (lang, (n, ppm, rate)) =>
      assert(rate == t * ppm / n, s"$lang rate must be floor(T*share/count)")
    }
    assert(
      rates.values.exists { case (n, ppm, _) => t == n * 1000000L / ppm },
      "the scarcest domain must bind the feasible total"
    )
    // determinism: same verdict set under repartitioning
    val again = Split
      .targetMix(docs.repartition(7), "doc_id", "lang", targets)
      .filter(col("accepted"))
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val first =
      out.filter(col("accepted")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first, "acceptance must be a pure function of ids")
  }

  test("domainReweight: uniform loss keeps weights uniform; harder domains gain") {
    import spark.implicits._
    val uniform = Seq(("a", 10L, 500000L), ("b", 20L, 500000L), ("c", 5L, 500000L))
      .toDF("source", "n_docs", "loss_ppm")
    val wU = Split
      .domainReweight(uniform, iters = 3)
      .select("source", "w_ppm")
      .as[(String, Long)]
      .collect()
      .toMap
    assert(wU.values.toSet.size === 1, "equal losses must keep equal weights")
    val skewed = Seq(("easy", 10L, 100000L), ("mid", 10L, 500000L), ("hard", 10L, 900000L))
      .toDF("source", "n_docs", "loss_ppm")
    val w = Split
      .domainReweight(skewed, iters = 3)
      .select("source", "w_ppm")
      .as[(String, Long)]
      .collect()
      .toMap
    assert(w("hard") > w("mid") && w("mid") > w("easy"), s"monotone in loss: $w")
    val tot = w.values.sum
    assert(tot <= 1000000L && tot > 1000000L - w.size, s"ppm-normalized (floor): $tot")
  }

  test("domainReweight is deterministic across partitioning") {
    import spark.implicits._
    def run(parts: Int) = Split
      .domainReweight(
        Seq(("a", 1L, 250000L), ("b", 1L, 750000L), ("c", 1L, 600000L), ("d", 1L, 10000L))
          .toDF("source", "n_docs", "loss_ppm")
          .repartition(parts),
        iters = 4
      )
      .select("source", "w_ppm")
      .as[(String, Long)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(run(1) === run(7))
  }

  test("targetMix rejects share vectors that do not sum to 1e6 ppm") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Split.targetMix(docs, "doc_id", "lang", Seq(("en", 500000L)))
    }
  }

  test("shardedRowNumber: bit-identical to the per-key window under heavy skew; range-sharded plan") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // one mega key holding ~90% of rows + a tail of small keys — the
    // shape that makes a single partitionBy(key) window a one-task sort
    val rows = (1 to 5000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "mega", f"v$i%05d")
    }
    val df = rows.toDF("part", "ord")
    val expected = df
      .withColumn("rn", row_number().over(Window.partitionBy("part").orderBy("ord")).cast("long"))
      .as[(String, String, Long)]
      .collect()
      .toSet
    val sharded = Split.shardedRowNumber(df, "part", "ord", shards = 8, out = "rn")
    val got = sharded.as[(String, String, Long)].collect().toSet
    assert(got === expected, "sharded ranks must equal the single-window form")
    // plan pin: the only window partitions on (_pid, key) — never the
    // bare key, so no sort task is ever sized by one key's rows. (The
    // range exchange itself is inside the localCheckpoint barrier and
    // shows as Scan ExistingRDD here; the mega key spanning shards is
    // what the bit-identity above proves.)
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_pid"), "rank window must be pid-sharded")
    // the tiny offsets window partitions by key ORDERED BY _pid (counts
    // frame, keys+shards rows) — fine; what must not exist is a
    // row-level window partitioned by the bare key ordered by ord
    assert(
      !"windowspecdefinition\\(part#\\d+, ord#".r.findFirstIn(plan).isDefined,
      "no row-level window may partition on the bare key"
    )
    // the mega key really spans several range shards: its per-shard
    // offsets are non-trivial (> 1 distinct offset)
    val megaOffsets = got.filter(_._1 == "mega").map(r => (r._3 - 1) / 1000).toSet
    assert(megaOffsets.size > 1, "mega key must span multiple shards")
  }

  test("shardedRowNumber: composite order keys match the single window past 10^6 ids") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // score-major, id-minor ranks where ids exceed 10^6 — the regime the
    // retired `score*10^6 + id` packed key silently misordered (an id of
    // 3_000_000 adds 3 score units to the packed key); the composite form
    // must still equal the single-window rank bit-for-bit
    val rows = (0 until 4000).map { i =>
      val lang = if (i % 5 == 0) "de" else "en"
      (1000000L + i.toLong * 7L, lang, (i % 13).toLong)
    }
    val df = rows.toDF("doc_id", "lang", "score")
    val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
    val expected = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .as[(Long, String, Long, Long)]
      .collect()
      .toSet
    val got = Split
      .shardedRowNumber(df, "lang", Seq(col("score"), col("doc_id")), shards = 8, out = "rn")
      .select("doc_id", "lang", "score", "rn")
      .as[(Long, String, Long, Long)]
      .collect()
      .toSet
    assert(got === expected)
    // descending sort orders ride the same path (the crawlBudget shape:
    // rem DESC, id ASC)
    val wd = Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
    val expDesc = df
      .withColumn("rn", row_number().over(wd).cast("long"))
      .as[(Long, String, Long, Long)]
      .collect()
      .toSet
    val gotDesc = Split
      .shardedRowNumber(df, "lang", Seq(col("score").desc, col("doc_id")), shards = 8, out = "rn")
      .select("doc_id", "lang", "score", "rn")
      .as[(Long, String, Long, Long)]
      .collect()
      .toSet
    assert(gotDesc === expDesc)
  }

  test("temperature sampling: rate = sqrt(n_min/n_domain) ppm, smallest domain kept whole") {
    // 100 'small' docs, 400 'big' docs: rate(small) = 1e6,
    // rate(big) = isqrt(100e12/400) = isqrt(2.5e11) = 500000 exactly
    val d = ((0 until 100).map(i => (i.toLong, "small")) ++
      (100 until 500).map(i => (i.toLong, "big"))).toDF("doc_id", "lang")
    val out = Split.temperatureSample(d, "doc_id", "lang")
    val rates = out
      .select(col("lang"), col("rate_ppm"))
      .distinct()
      .as[(String, Long)]
      .collect()
      .toMap
    assert(rates("small") === 1000000L)
    assert(rates("big") === 500000L)
    // every small doc survives; accept verdicts follow the bucket exactly
    val rows = out
      .select(col("lang"), col("mix_bucket"), col("rate_ppm"), col("accepted"))
      .as[(String, Long, Long, Boolean)]
      .collect()
    assert(rows.filter(_._1 == "small").forall(_._4))
    assert(rows.forall(r => r._4 === (r._2 < r._3)))
    // both rates above land EXACTLY on perfect squares (1e12 and 2.5e11),
    // so any off-by-one in the isqrt correction shows as 999999/500001
  }
}
