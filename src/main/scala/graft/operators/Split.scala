package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.util.Cols._

/** Deterministic dataset splitting for training pipelines.
  *
  * A train/val/test split at 100 TB cannot be a random() sample: it must be
  * reproducible across reruns, stable under repartitioning, and decided
  * row-locally (no shuffle, no state). The standard answer is a hash split:
  * bucket = hash(id) mod 100, split by cumulative bucket ranges. Membership
  * is a pure function of the id — the same row lands in the same split on
  * any cluster, any partitioning, any engine (md5-derived here so the
  * DuckDB oracle reproduces it bit-for-bit).
  */
object Split {

  /** (name, percent) split spec; percents must sum to 100. */
  val DefaultSplits: Seq[(String, Int)] =
    Seq(("train", 80), ("val", 10), ("test", 10))

  /** 0..99 bucket of an id column — the hash-split decision value. */
  def bucket100(id: Column): Column = pmod(md5Long(id), lit(100))

  /** Split label for an id, by cumulative bucket ranges. Map-only. */
  def splitLabel(id: Column, splits: Seq[(String, Int)] = DefaultSplits): Column = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val b = bucket100(id)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), hi), elseCol) => when(b < hi, name).otherwise(elseCol)
    }
  }

  /** df + (bucket, split) columns; no shuffle, schema-preserving. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)] = DefaultSplits
  ): DataFrame =
    df.withColumn("bucket", bucket100(col(idCol)))
      .withColumn("split", splitLabel(col(idCol), splits))

  /** Deterministic stratified sample: the k rows of each stratum whose
    * salted id-hash is smallest — "cap every domain at k docs", decided by
    * a pure function of the id, so the sample is identical across reruns,
    * partitionings, and engines.
    *
    * Shape at scale: the bounded [[graft.functions.TopKByScore]] aggregate
    * keeps O(k) state per stratum and reduces every map partition to ≤ k
    * candidates per stratum BEFORE the exchange — a `row_number()` window
    * would shuffle and sort every row of the stratum instead. One shuffle
    * of ≤ k·strata rows total.
    *
    * The hash is folded to 52 bits so its double image (TopKByScore scores
    * are doubles) is exact; ties (same 52-bit hash) break by lower id, the
    * same total order the oracle's `ORDER BY h52, id` produces.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int,
      salt: String = "#sample"
  ): DataFrame = {
    val h52 = pmod(
      md5Long(concat(col(idCol).cast("string"), lit(salt))),
      lit(TwoPow52)
    )
    df.groupBy(col(strataCol))
      .agg(
        graft.functions.TopKByScore
          .topK(-h52.cast("double"), col(idCol), k)
          .as("picked")
      )
      .select(col(strataCol), posexplode(col("picked")).as(Seq("pos", "pick")))
      .select(
        col(strataCol),
        (col("pos") + 1).cast("long").as("sample_rank"),
        col("pick.id").as(idCol)
      )
  }

  /** 2^52: the largest power-of-two hash domain whose values are exact as
    * doubles (TopKByScore's score type).
    */
  val TwoPow52: Long = 1L << 52

  /** Sequence packing for training: assign each document to the fixed
    * token-budget pack where its first token lands, given the documents of
    * each group concatenated in id order. `pack_id = (cum_before) div
    * budget` where cum_before is the running token count of all earlier
    * docs in the group — the standard "pack documents into budget-length
    * sequences, split at boundaries" layout, computed without materializing
    * any sequence.
    *
    * Shape at scale: packing is an ordered prefix-sum, but a single window
    * `partitionBy(group).orderBy(id)` would sort one partition PER GROUP —
    * with a handful of sources over 100 TB that is one task sorting
    * terabytes. This is the classic two-level prefix sum instead:
    *
    *   1. shard each group by contiguous id range (`shard = id div
    *      shardSize` — ranges, not hashes, so shard order IS id order);
    *   2. one partial-aggregable pass computes per-(group, shard) token
    *      totals; a window over that TINY frame (groups × shards rows)
    *      turns them into per-shard starting offsets;
    *   3. broadcast the offsets back and run the running sum WITHIN each
    *      (group, shard) — sort partitions are bounded by shardSize rows
    *      regardless of group skew; `cum = offset + local running sum`.
    *
    * All arithmetic is exact LONG and the result is bit-identical for any
    * shardSize (the prefix sum is associative), which the spec pins.
    *
    * Note: `df` (and therefore `nTokens`) is evaluated TWICE — once for
    * the shard-total aggregate, once for the row-level pass. If the token
    * count is expensive (a tokenizer over raw text), pre-materialize the
    * narrow (id, group, n_tok) projection (persist/localCheckpoint) and
    * pass the column through; the aggregate pass prunes to those three
    * columns either way.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      nTokens: Column,
      budget: Int,
      shardSize: Long = 1L << 20
  ): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val base = df
      .withColumn("n_tok", nTokens.cast("long"))
      .withColumn("_shard", expr(s"cast(`$idCol` as bigint) div ${shardSize}L"))
    // per-(group, shard) totals -> cumulative offset of each shard within
    // its group. The window runs over groups × shards rows (corpus-size
    // independent), and the offsets frame broadcasts.
    val offsets = base
      .groupBy(col(groupCol), col("_shard"))
      .agg(sum(col("n_tok")).as("_shard_tok"))
      .withColumn(
        "_offset",
        coalesce(
          sum(col("_shard_tok")).over(
            W.partitionBy(col(groupCol))
              .orderBy(col("_shard"))
              .rowsBetween(W.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col(groupCol), col("_shard"), col("_offset"))
    val wLocal = W
      .partitionBy(col(groupCol), col("_shard"))
      .orderBy(col(idCol))
      .rowsBetween(W.unboundedPreceding, 0)
    base
      .join(broadcast(offsets), Seq(groupCol, "_shard"))
      .withColumn("cum", col("_offset") + sum(col("n_tok")).over(wLocal))
      .withColumn("pack_id", expr(s"(cum - n_tok) div ${budget.toLong}"))
      .drop("_shard", "_offset")
  }

  /** Two-level `row_number() OVER (PARTITION BY part ORDER BY ord)` —
    * bit-identical ranks without ever sorting one partition PER KEY.
    * The [[packSequences]] sharded-prefix-sum recipe generalized to
    * string order keys, where id-range sharding is unavailable: a RANGE
    * exchange on `(part, ord)` bounds every sort partition by corpus
    * size / shards regardless of key skew (a mega-domain spans MANY
    * range partitions), then
    *
    *   1. per-(range-partition, key) counts — a tiny frame: contiguous
    *      ranges mean ≤ keys + shards − 1 rows;
    *   2. a window over THAT frame turns counts into per-partition
    *      starting offsets (range partition ids are ordered by key
    *      range, so cumulating by pid IS cumulating by order);
    *   3. offsets broadcast back; local `row_number` within
    *      (pid, key) + offset = the global per-key rank.
    *
    * The range-partitioned frame is localCheckpointed: both passes must
    * observe the SAME materialized partition ids (and the barrier also
    * stops the order-key expression tree re-deriving upstream work —
    * the CollapseProject lesson). Ranks equal the single-window form
    * whenever `ord` is unique per key (ties otherwise tie-break
    * arbitrarily, exactly like `row_number` itself).
    */
  def shardedRowNumber(
      df: DataFrame,
      partCol: String,
      orderCol: String,
      shards: Int,
      out: String = "rn"
  ): DataFrame =
    shardedRowNumber(df, partCol, Seq(col(orderCol)), shards, out)

  /** [[shardedRowNumber]] with a COMPOSITE order: `orderCols` may be any
    * column expressions, including `.desc` sort orders — the natural form
    * for "score major, id minor" ranks, which would otherwise force the
    * caller to pack both fields into one sortable scalar (the
    * `score*10^6 + id` packing this replaces silently misorders once the
    * minor field outgrows its multiplier, and zero-padded string keys pay
    * 20-byte-per-field shuffles). The range exchange and the local
    * `row_number` see the SAME sort expressions, so the two-level rank
    * equals the single-window `row_number() OVER (PARTITION BY part ORDER
    * BY orderCols)` whenever the composite key is unique per key (ties
    * tie-break arbitrarily, exactly like `row_number` itself).
    */
  def shardedRowNumber(
      df: DataFrame,
      partCol: String,
      orderCols: Seq[Column],
      shards: Int,
      out: String
  ): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(orderCols.nonEmpty, "at least one order column")
    val W = org.apache.spark.sql.expressions.Window
    val pinned = df
      .repartitionByRange(shards, (col(partCol) +: orderCols): _*)
      .localCheckpoint()
      .withColumn("_pid", spark_partition_id().cast("long"))
    val offsets = pinned
      .groupBy(col("_pid"), col(partCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn(
        "_off",
        coalesce(
          sum(col("_c")).over(
            W.partitionBy(col(partCol))
              .orderBy(col("_pid"))
              .rowsBetween(W.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col("_pid"), col(partCol), col("_off"))
    pinned
      .join(broadcast(offsets), Seq("_pid", partCol))
      .withColumn(
        out,
        col("_off") + row_number()
          .over(W.partitionBy(col("_pid"), col(partCol)).orderBy(orderCols: _*))
          .cast("long")
      )
      .drop("_pid", "_off")
  }

  /** Weighted dataset mixing: keep each row with its source's sampling
    * percent, decided by an md5 bucket of the id salted with "#mix" (so the
    * mix decision is independent of the train/val/test bucket of the same
    * id). Map-only and deterministic — rerunning the mix, on any cluster,
    * keeps exactly the same rows.
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      percents: Map[String, Int],
      defaultPercent: Int = 0
  ): DataFrame = {
    val mixBucket = pmod(md5Long(concat(col(idCol).cast("string"), lit("#mix"))), lit(100))
    val rate = percents.foldLeft(lit(defaultPercent)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, p).otherwise(acc)
    }
    df.withColumn("mix_bucket", mixBucket)
      .withColumn("mix_rate", rate)
      .filter(col("mix_bucket") < col("mix_rate"))
  }

  /** Target-DISTRIBUTION resampling (domain-reweighting materialization):
    * where [[weightedMix]] takes per-domain rates as given, this derives
    * them from a target composition — "the shipped corpus should be 40%
    * domain A, 15% domain B, …" — keeping the LARGEST corpus consistent
    * with those shares. The feasible total is capped by the scarcest
    * domain, `T = min_d floor(count_d * 1e6 / target_ppm_d)`; each domain
    * then keeps `rate_ppm_d = floor(T * target_ppm_d / count_d)` of its
    * rows, decided row-locally by a salted md5 bucket in [0, 1e6). All
    * arithmetic is integer (parts-per-million), so the derivation is
    * bit-reproducible on any engine.
    *
    * Shape at scale: one partial-aggregable count per domain (|domains|
    * rows), a min over that tiny frame, rates broadcast back — the corpus
    * itself sees exactly one map-only accept pass, zero data shuffles.
    * Expected kept rows per domain ≈ T * target_ppm_d / 1e6, so achieved
    * shares converge to the targets as domains grow; domains without a
    * target entry are dropped (inner join), domains targeted but absent
    * simply cannot constrain the min.
    */
  def targetMix(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targetsPpm: Seq[(String, Long)],
      salt: String = "#tmix"
  ): DataFrame = {
    require(targetsPpm.map(_._2).sum == 1000000L, "target shares must sum to 1e6 ppm")
    require(targetsPpm.forall(_._2 > 0L), "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetsPpm.toDF(domainCol, "target_ppm")
    val caps = df
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_domain"))
      .join(broadcast(targets), Seq(domainCol))
      .withColumn("cap", expr("n_domain * 1000000L div target_ppm"))
    val total = caps.agg(min(col("cap")).as("feasible_total"))
    val rates = caps
      .crossJoin(broadcast(total))
      .select(
        col(domainCol),
        col("n_domain"),
        col("target_ppm"),
        expr("feasible_total * target_ppm div n_domain").as("rate_ppm")
      )
    val bkt = pmod(md5Long(concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(rates), Seq(domainCol))
      .withColumn("mix_bucket", bkt)
      .withColumn("accepted", col("mix_bucket") < col("rate_ppm"))
  }

  /** Exact integer square root (nonnegative long), cross-engine: a
    * double `sqrt` seed corrected by ±1 — IEEE sqrt is within 1 ulp, and
    * the corrections run in DECIMAL so the squares of ~3e9 seeds cannot
    * wrap. Both engines evaluate the identical formula.
    */
  private def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast(LongType)
    val d = DecimalType(38, 0)
    when(((s0 + 1).cast(d) * (s0 + 1).cast(d)) <= x.cast(d), s0 + 1)
      .when((s0.cast(d) * s0.cast(d)) > x.cast(d), s0 - 1)
      .otherwise(s0)
  }

  /** Temperature-based language/domain sampling at α = 1/2 (the
    * XLM-R / mT5 multilingual recipe) as a deterministic downsampling
    * filter: sampling shares ∝ n_d^α means keep rate ∝ n_d^(α−1) =
    * 1/√n_d, normalized so the SMALLEST domain is kept whole —
    * rate_d = √(n_min / n_d), computed integer-exactly as
    * isqrt(n_min·10^12 div n_d) ppm (valid while the smallest domain
    * holds ≤ 9.2e6 docs — past that, scale the fixed-point down one
    * decade). Membership is the salted-md5 bucket, so the SAME docs
    * survive on any cluster, any partitioning, any rerun.
    *
    * Shape at scale: one count aggregate (|domains| rows), a 1-row
    * min crossed back in broadcast, then a map-only bucket compare —
    * the corpus is touched once.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      salt: String = "#tsamp"
  ): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_domain"))
    val mn = counts.agg(min(col("n_domain")).as("n_min"))
    val rates = counts
      .crossJoin(broadcast(mn))
      .select(
        col(domainCol),
        col("n_domain"),
        isqrt(expr("n_min * 1000000000000 div n_domain")).as("rate_ppm")
      )
    val bkt = pmod(md5Long(concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(rates), Seq(domainCol))
      .withColumn("mix_bucket", bkt)
      .withColumn("accepted", col("mix_bucket") < col("rate_ppm"))
  }

  /** Loss-driven domain reweighting (the DoReMi idea, Xie et al. 2023,
    * in its deterministic multiplicative-weights core): domains where the
    * reference LM does badly get UP-weighted, so the next mixture spends
    * more of the token budget where the model has most to learn.
    *
    * `domainLoss` must provide one row per domain: (domain, n_docs,
    * loss_ppm ∈ [0, 1e6]). Weights start uniform (1e6 ppm each) and run
    * `iters` multiplicative-weights rounds, all integer-exact:
    * u_d = w_d·(1e6 + loss_d), then renormalize w_d = u_d·1e6 div Σu —
    * a closed-form both engines replay bit-identically (no exp/softmax
    * floats). Bounds: u ≤ 2e12, u·1e6 ≤ 2e18 < 2^63.
    *
    * Shape at scale: the corpus is touched ONCE (by whatever computed
    * `domainLoss`); every iteration runs on the |domains|-row frame
    * (localCheckpointed so the loss derivation isn't replayed per round)
    * — a scalar sum crossed back in, no windows, no corpus scans.
    */
  def domainReweight(domainLoss: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one reweighting round")
    var w = domainLoss
      .localCheckpoint(true)
      .withColumn("w", lit(1000000L))
    for (_ <- 1 to iters) {
      val u = w.withColumn("u", col("w") * (lit(1000000L) + col("loss_ppm")))
      val tot = u.agg(sum(col("u")).as("tot"))
      w = u
        .crossJoin(broadcast(tot))
        .withColumn("w", expr("(u * 1000000L) div tot"))
        .drop("u", "tot")
    }
    w.withColumnRenamed("w", "w_ppm")
  }
}
