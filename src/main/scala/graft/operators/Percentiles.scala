package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-memory EXACT percentiles (two-pass histogram bucketing).
  *
  * Spark's built-in `percentile` buffers every value of a group in one
  * aggregation buffer and sorts it at eval — unbounded per-group state, the
  * classic scale cliff (a 100 TB group OOMs one task). The reference's
  * aggregation surface has the same exact-quantile semantics, so we keep
  * exactness but bound the state:
  *
  *   - pass 1a: per-group `count/min/max` (partial-aggregable scan);
  *   - pass 1b: per-group fixed-width HISTOGRAM of `nBuckets` bucket counts
  *     (partial-aggregable scan; state = O(nBuckets) per group);
  *   - driver-free bucket select: a running sum over the ≤ nBuckets rows per
  *     group locates, for each requested percentile, the bucket containing
  *     the lower / upper interpolation index (`floor(p·(n−1))`,
  *     `ceil(p·(n−1))`);
  *   - pass 2: ONLY the hit buckets are ranked, over DISTINCT values (a
  *     partial-aggregable per-value count, then a window over ≤ the
  *     bucket's distinct-value count — bounded by ≈ n/nBuckets rows and
  *     immune to hot-value skew: a constant or 99%-one-value group
  *     contributes one window row per distinct value, not per duplicate),
  *     and the two indexed values are interpolated with EXACTLY Spark's
  *     `Percentile.getPercentile` formula
  *     `(hi − pos)·lower + (pos − lo)·higher`, so results are bit-identical
  *     to the built-in (and to DuckDB's `quantile_cont` on this data).
  *
  * Every shuffle is partial-aggregable; the only non-aggregate sort touches
  * ≈ |hit buckets| · n/nBuckets rows. No driver state at all.
  */
object Percentiles {

  /** Exact percentiles over an unpivoted (groupCols..., vc, v) relation.
    *
    * `vc` names the measure a row belongs to (so several measure columns
    * ride one scan via `stack`), `psByVc` the percentiles wanted per
    * measure. Returns (groupCols..., vc, p, pct) with `pct` the exact
    * linear-interpolated percentile as a double.
    */
  def exactPercentiles(
      base: DataFrame,
      groupCols: Seq[String],
      psByVc: Map[String, Seq[Double]],
      nBuckets: Int = 256
  ): DataFrame = {
    val g: Seq[String] = groupCols :+ "vc"
    def gc: Seq[Column] = g.map(col)
    val rows = base.filter(col("v").isNotNull)

    // pass 1a: group stats → bucket width (degenerate min==max group → one
    // bucket; its rows are all the same value, so the "sort" is trivial).
    val stats = rows
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn(
        "width",
        when(col("mx") > col("mn"), (col("mx") - col("mn")) / nBuckets)
          .otherwise(lit(1.0))
      )

    // The bucket of a row — identical expression in pass 1b and pass 2, so
    // float rounding can't disagree between the passes.
    val bucketOf: Column =
      least(
        floor((col("v") - col("mn")) / col("width")).cast(LongType),
        lit(nBuckets - 1L)
      )

    val bucketed = rows
      .join(broadcast(stats), g)
      .withColumn("bucket", bucketOf)

    // pass 1b: histogram + running count over the ≤ nBuckets rows per group
    // (bounded window partition).
    val wCum = Window.partitionBy(gc: _*).orderBy(col("bucket"))
    val bcounts = bucketed
      .groupBy(gc :+ col("bucket"): _*)
      .agg(count(lit(1)).as("bc"))
      .withColumn("cum_end", sum(col("bc")).over(wCum))
      .withColumn("cum_before", col("cum_end") - col("bc"))

    // Requested interpolation indices: pos = p·(n−1), lower = floor(pos),
    // higher = ceil(pos) — Spark Percentile's index arithmetic verbatim.
    val psExpr: Column = {
      val entries = psByVc.toSeq
      entries.tail.foldLeft(
        when(col("vc") === entries.head._1, typedlit(entries.head._2))
      ) { case (acc, (k, ps)) => acc.when(col("vc") === k, typedlit(ps)) }
    }
    val needed = stats
      .select(gc :+ col("n") :+ explode(psExpr).as("p"): _*)
      .withColumn("pos", col("p") * (col("n") - 1).cast(DoubleType))
      .withColumn("lo_idx", floor(col("pos")).cast(LongType))
      .withColumn("hi_idx", ceil(col("pos")).cast(LongType))
      .select(
        gc ++ Seq(col("p"), col("pos"), col("lo_idx"), col("hi_idx")) :+
          explode(
            array(
              struct(lit("lo").as("role"), col("lo_idx").as("idx")),
              struct(lit("hi").as("role"), col("hi_idx").as("idx"))
            )
          ).as("ri"): _*
      )
      .select(
        gc ++ Seq(
          col("p"),
          col("pos"),
          col("lo_idx"),
          col("hi_idx"),
          col("ri.role").as("role"),
          col("ri.idx").as("idx")
        ): _*
      )

    // Which bucket holds each requested index: a tiny range join between
    // two bounded relations (groups·|ps|·2 × groups·nBuckets).
    val nd = needed.as("nd")
    val bb = bcounts.as("bb")
    val targets = nd
      .join(
        bb,
        g.map(c => col(s"nd.$c") === col(s"bb.$c")).reduce(_ && _) &&
          col("nd.idx") >= col("bb.cum_before") && col("nd.idx") < col("bb.cum_end")
      )
      .select(
        g.map(c => col(s"nd.$c").as(c)) ++ Seq(
          col("nd.p").as("p"),
          col("nd.pos").as("pos"),
          col("nd.lo_idx").as("lo_idx"),
          col("nd.hi_idx").as("hi_idx"),
          col("nd.role").as("role"),
          col("nd.idx").as("idx"),
          col("bb.bucket").as("bucket"),
          col("bb.cum_before").as("cum_before")
        ): _*
      )

    // pass 2: locate the requested indices inside ONLY the hit buckets —
    // over DISTINCT VALUES, not rows. Per (group, bucket, v) counts come
    // from a partial-aggregable groupBy (map-side combine collapses
    // duplicate values before the exchange), and the rank window then
    // partitions over the bucket's DISTINCT values. This is what removes
    // the degenerate-bucket cliff: a constant group (mn == mx, width
    // fallback 1.0 — everything in bucket 0) or a 99%-one-value column
    // collapses to one window row per distinct value, so the hot value
    // contributes ONE row to the sort no matter how many duplicates it
    // has. Worst case (all-distinct bucket) stays the documented
    // ≈ n/nBuckets bound. Bucketing is monotone in v, so the value at
    // global index i is the v whose cumulative row range covers i.
    val hitBuckets = targets
      .select(gc ++ Seq(col("bucket"), col("cum_before")): _*)
      .distinct()
    val wRank =
      Window.partitionBy(gc :+ col("bucket"): _*).orderBy(col("v"))
    val indexed = bucketed
      .join(broadcast(hitBuckets), g :+ "bucket")
      .groupBy(gc ++ Seq(col("bucket"), col("cum_before"), col("v")): _*)
      .agg(count(lit(1)).as("vn"))
      .withColumn("cum_v_end", sum(col("vn")).over(wRank) + col("cum_before"))
      .withColumn("cum_v_before", col("cum_v_end") - col("vn"))
      .select(gc ++ Seq(col("cum_v_before"), col("cum_v_end"), col("v")): _*)

    val tg = targets.as("tg")
    val ix = indexed.as("ix")
    val picked = ix
      .join(
        broadcast(tg),
        g.map(c => col(s"tg.$c") === col(s"ix.$c")).reduce(_ && _) &&
          col("tg.idx") >= col("ix.cum_v_before") && col("tg.idx") < col("ix.cum_v_end")
      )
      .select(
        g.map(c => col(s"tg.$c").as(c)) ++ Seq(
          col("tg.p").as("p"),
          col("tg.pos").as("pos"),
          col("tg.lo_idx").as("lo_idx"),
          col("tg.hi_idx").as("hi_idx"),
          col("tg.role").as("role"),
          col("ix.v").as("v")
        ): _*
      )

    // Spark Percentile.getPercentile verbatim:
    //   if (higher == lower) lowerKey
    //   else (higher − pos)·lowerKey + (pos − lower)·higherKey
    picked
      .groupBy(gc :+ col("p"): _*)
      .agg(
        max(col("pos")).as("pos"),
        max(col("lo_idx")).as("lo_idx"),
        max(col("hi_idx")).as("hi_idx"),
        max(when(col("role") === "lo", col("v"))).as("lov"),
        max(when(col("role") === "hi", col("v"))).as("hiv")
      )
      .select(
        gc ++ Seq(
          col("p"),
          when(col("lo_idx") === col("hi_idx"), col("lov"))
            .otherwise(
              (col("hi_idx").cast(DoubleType) - col("pos")) * col("lov") +
                (col("pos") - col("lo_idx").cast(DoubleType)) * col("hiv")
            )
            .as("pct")
        ): _*
      )
  }
}
