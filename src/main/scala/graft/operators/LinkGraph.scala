package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link-graph analytics: damped PageRank over a (src, dst)
  * edge list in EXACT integer fixed-point — the ranking Common Crawl
  * itself publishes beside every crawl (host/domain-level web graph +
  * centrality ranks), and the signal crawl schedulers feed back into
  * frontier prioritization.
  *
  * Each PageRank round is one map→shuffle→reduce: contributions fan out
  * along edges (map), hash-shuffle on the destination host, and sum
  * (reduce) — i.e. the reference's single round
  * (`/root/reference/src/index.js:163-204`, map → shuffle-on-key →
  * reduce) ITERATED, with the reduce output of round t feeding round
  * t+1's map. Spark expresses the whole unrolled chain as one
  * declarative plan; Catalyst reuses the edge-list exchange across
  * rounds.
  *
  * Arithmetic is integer fixed-point ([[RankScale]] units per unit of
  * rank) so results are bit-deterministic and partition-order-free:
  * floating-point PageRank sums in shuffle arrival order and never
  * reproduces across runs, which breaks both the oracle replay and any
  * cross-engine parity check. Floor division leaks sub-unit mass (the
  * standard price; ranks stay a fixed point of the ORDERING long before
  * they'd be a fixed point of the real-valued system).
  *
  * Scale posture (100 TB): the host graph is corpus-linear in edges but
  * host-bounded in nodes (~10^8 hosts for the full web). Each round is
  * one join + one hash aggregation — both keyed shuffles, no all-pairs
  * stage. Per-round partial aggregation caps the hub problem map-side;
  * a mega-hub's in-mass sum is bounded by total mass N·RankScale ≈
  * 10^17 < Long.MaxValue at RankScale=10^9, and past ~10^9 hosts the
  * sum lane lifts to DECIMAL(38,0) the way BM25's scores did
  * ([[TextIndex]]). For many rounds on a real cluster, checkpoint the
  * rank table every few rounds to cut lineage — at the fixture's 3
  * rounds the unrolled plan is the faster form.
  */
object LinkGraph {

  /** Fixed-point units per unit of rank (10^9: sub-ppb resolution,
    * total-mass headroom to ~10^9 hosts in an int64 sum lane).
    */
  val RankScale: Long = 1000000000L

  /** Damping factor 0.85 as an exact rational. */
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  /** `iters` rounds of damped PageRank over `edges` (columns `src`,
    * `dst`; self-loops and duplicate edges are dropped — host-level web
    * graphs are simple digraphs). Every node starts at [[RankScale]]
    * (the un-normalized formulation: total mass ≈ N, invariant under
    * the update), then
    *
    *   r(v) ← (15·RankScale) DIV 100 + (85 · Σ_{u→v} r(u) DIV outdeg(u)) DIV 100
    *
    * — all floor divisions on nonnegative longs, so Spark `DIV` and the
    * oracle's `//` agree bitwise. Dangling hosts (no outlinks) keep
    * receiving teleport mass but forward none: their mass leaks, the
    * deterministic variant of the usual dangling-mass redistribution.
    *
    * Returns (`h`, `rank`): host and fixed-point rank after `iters`
    * rounds.
    */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    // Materialize the edge list ONCE: it feeds outdegrees, the node set,
    // and every round's contribution join — left lazy, each of those
    // references re-runs the whole upstream derivation (scan + normalize
    // + explode + joins), turning 3 rounds into ~16 corpus passes.
    // localCheckpoint also truncates lineage so round t's plan doesn't
    // nest round t-1's; at production scale swap for a reliable
    // checkpoint dir (same call shape, fault-tolerant storage).
    val e = edges
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e
      .select(col("src").as("h"))
      .union(e.select(col("dst").as("h")))
      .distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var r = nodes.withColumn("rank", lit(RankScale))
    for (it <- 1 to iters) {
      val contrib = e
        .join(deg, "src")
        .join(r.withColumnRenamed("h", "src"), "src")
        .select(col("dst"), expr("rank DIV outdeg").as("c"))
      val inMass = contrib.groupBy(col("dst")).agg(sum(col("c")).as("m"))
      r = nodes
        .join(inMass.withColumnRenamed("dst", "h"), Seq("h"), "left")
        .select(
          col("h"),
          (lit((DampDen - DampNum) * RankScale / DampDen) +
            expr(s"($DampNum * coalesce(m, CAST(0 AS BIGINT))) DIV $DampDen")).as("rank")
        )
      // truncate lineage between rounds; the LAST round stays lazy so the
      // caller composes (and plan-audits) a real join+agg plan, not an
      // opaque materialized-RDD scan
      if (it < iters) r = r.localCheckpoint()
    }
    r
  }

  /** [[pageRank]] with an EPSILON STOP and optional dangling-mass
    * redistribution — the published formulation's two knobs the
    * fixed-round form leaves out.
    *
    *   - Convergence: after each round the max absolute rank movement
    *     (integer [[RankScale]] units) is checked on the driver; the
    *     walk stops at the first round where it drops below
    *     `epsilonUnits`, else at `maxIters`. Integer arithmetic makes
    *     the round count itself bit-deterministic — the same corpus
    *     always converges at the same round on any cluster, so the
    *     oracle can replay the unrolled recurrence and re-derive BOTH
    *     the ranks and the stopping round.
    *   - Dangling mass: hosts without outlinks forward nothing; by
    *     default their mass leaks (the [[pageRank]] contract). With
    *     `redistributeDangling` each node instead receives
    *     `danglingMass DIV n` extra in-mass per round (the uniform
    *     redistribution of the published formulation; the sub-`n`
    *     remainder still leaks — exact-integer price, documented).
    *     Redistribution CHANGES the ranking on leaky graphs, pinned in
    *     UrlSpec.
    *
    * Returns (`h`, `rank`, `rounds`) with `rounds` the executed count.
    * Per-round cost adds one tiny driver action (the max-delta check —
    * |hosts|-row aggregate) and, when redistributing, one anti-join sum
    * over the rank table; everything stays keyed shuffles, no all-pairs.
    */
  def pageRankConverged(
      edges: DataFrame,
      maxIters: Int = 6,
      epsilonUnits: Long = RankScale / 10,
      redistributeDangling: Boolean = false
  ): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e
      .select(col("src").as("h"))
      .union(e.select(col("dst").as("h")))
      .distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nNodes = math.max(1L, nodes.count())
    var r = nodes.withColumn("rank", lit(RankScale)).localCheckpoint()
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val dangleShare =
        if (redistributeDangling) {
          val dm = r
            .join(deg.withColumnRenamed("src", "h"), Seq("h"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0L)))
            .head()
            .getLong(0)
          dm / nNodes
        } else 0L
      val contrib = e
        .join(deg, "src")
        .join(r.withColumnRenamed("h", "src"), "src")
        .select(col("dst"), expr("rank DIV outdeg").as("c"))
      val inMass = contrib.groupBy(col("dst")).agg(sum(col("c")).as("m"))
      val rNew = nodes
        .join(inMass.withColumnRenamed("dst", "h"), Seq("h"), "left")
        .select(
          col("h"),
          (lit((DampDen - DampNum) * RankScale / DampDen) +
            expr(s"($DampNum * (coalesce(m, CAST(0 AS BIGINT)) + ${dangleShare}L)) DIV $DampDen"))
            .as("rank")
        )
        .localCheckpoint()
      val delta = rNew
        .join(r.select(col("h"), col("rank").as("prev")), "h")
        .agg(coalesce(max(abs(col("rank") - col("prev"))), lit(0L)))
        .head()
        .getLong(0)
      r = rNew
      rounds += 1
      converged = delta < epsilonUnits
    }
    r.withColumn("rounds", lit(rounds.toLong))
  }

  /** Crawl-budget apportionment by rank share — largest-remainder
    * (Hamilton) method, the exact-integer way to split `budget` fetch
    * slots proportionally so they SUM TO THE BUDGET EXACTLY:
    * `base_h = budget·rank_h div Σrank`, and the `budget − Σbase`
    * leftover slots go one each to the largest remainders
    * (`budget·rank_h mod Σrank`), ties broken by higher rank then host
    * name — fully deterministic, both engines replay every slot.
    *
    * The `budget·rank` products run in DECIMAL(38,0): with ranks in
    * [[RankScale]] units a web-scale host table overflows int64 there.
    * The remainder ranking is a GLOBAL order over the host dimension —
    * ranked with the two-level [[Split.shardedRowNumber]] (constant
    * partition key: the range exchange still bounds every sort
    * partition), not a single-partition window. Input `ranks` must have
    * columns (`h`, `rank`); returns (domain, rank, base, rem, rn, alloc).
    */
  def crawlBudget(ranks: DataFrame, budget: Long, shards: Int = 32): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    val tot = ranks.agg(sum(col("rank")).as("t"))
    val q = ranks
      .crossJoin(broadcast(tot))
      .withColumn(
        "base",
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * rank) DIV t AS BIGINT)")
      )
      .withColumn(
        "rem",
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * rank) % t AS BIGINT)")
      )
      .withColumn("_k", lit(1))
    // composite sort order (rem DESC, rank DESC, h ASC) straight through
    // the two-level rank — no packed key, no 40-byte string shuffle
    val ranked = Split.shardedRowNumber(
      q,
      "_k",
      Seq(col("rem").desc, col("rank").desc, col("h")),
      shards,
      out = "rn"
    )
    val lv = ranked.agg((lit(budget) - sum(col("base"))).as("leftover"))
    ranked
      .crossJoin(broadcast(lv))
      .select(
        col("h").as("domain"),
        col("rank"),
        col("base"),
        col("rem"),
        col("rn"),
        (col("base") + when(col("rn") <= col("leftover"), 1L).otherwise(0L)).as("alloc")
      )
  }
}
