package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution over a fetched archive: every crawler
  * follows 3xx `Location` chains to a terminal URL before frontier
  * canonicalization, bounding hops (RFC 9110 recommends clients cap
  * around 5) and refusing loops. Common Crawl publishes exactly this
  * as per-capture redirect metadata.
  *
  * Input is the archive's HTTP-sliced responses
  * ([[graft.sources.Warc.httpSlice]] rows: `target_uri`, `http_status`,
  * `http_location`); `Location` may be RELATIVE (RFC 7231), so targets
  * resolve RFC 3986 against the fetch URI and canonicalize.
  *
  * Each hop is one keyed join of the narrow chain-state table against
  * the redirect edge list — the iterated map-shuffle-reduce shape of
  * [[LinkGraph.pageRank]], unrolled `maxHops` times. The base
  * projection (url, status, location) materializes ONCE
  * (localCheckpoint — the projection-barrier lesson: left lazy, every
  * hop and the terminal joins would re-run the archive parse); chain
  * state is O(1) columns per fetched URL, never the blocks.
  */
object Redirects {

  /** Resolve every fetched URL's redirect chain. Output: one row per
    * DISTINCT fetched URL (the latest capture of a multiply-captured URI
    * governs its chain):
    *
    *   - `url` — the fetch URI (chain origin);
    *   - `final_url` — the terminal URL (null for `cycle`/`truncated`);
    *   - `hops` — redirects followed (0 for a direct non-redirect);
    *   - `status` — `ok` (terminal is a fetched non-redirect),
    *     `dangling` (terminal was never fetched), `cycle` (the next
    *     target was already visited — detection STOPS the walk, the
    *     state freezes), or `truncated` (still redirecting after
    *     `maxHops`).
    */
  def resolve(responses: DataFrame, maxHops: Int = 3): DataFrame = {
    // A real archive routinely holds SEVERAL captures of the same URI;
    // un-deduplicated they would fan out every hop join and the terminal
    // fetched/still_loc joins (duplicated rows per origin, cross-
    // multiplied chains). Keep ONE capture per URL — the latest by
    // WARC-Date when the input carries it (the httpSlice contract),
    // max(struct) tie-breaking deterministically on (status, loc); the
    // aggregate combines map-side, one row per URL crosses the exchange.
    val capDate =
      if (responses.columns.contains("warc_date")) col("warc_date") else lit("")
    val basis = responses
      .select(
        col("target_uri").as("url"),
        capDate.as("cap_date"),
        col("http_status").as("status"),
        when(
          col("http_status").between(300, 399) && col("http_location") =!= "",
          Urls.normalizeUrl(Urls.resolveUrl(col("target_uri"), col("http_location")))
        ).as("loc")
      )
      .groupBy(col("url"))
      .agg(max(struct(col("cap_date"), col("status"), col("loc"))).as("w"))
      .select(col("url"), col("w.status").as("status"), col("w.loc").as("loc"))
      .localCheckpoint()
    val e = basis.where(col("loc").isNotNull).select(col("url").as("cur"), col("loc"))

    var st = basis.select(
      col("url").as("origin"),
      col("url").as("cur"),
      lit(0L).as("hops"),
      lit(false).as("cycle"),
      array(col("url")).as("visited")
    )
    for (_ <- 1 to maxHops) {
      val advance =
        col("loc").isNotNull && !col("cycle") && !array_contains(col("visited"), col("loc"))
      st = st
        .join(e, Seq("cur"), "left")
        .select(
          col("origin"),
          when(advance, col("loc")).otherwise(col("cur")).as("cur"),
          when(advance, col("hops") + 1).otherwise(col("hops")).as("hops"),
          (col("cycle") ||
            (col("loc").isNotNull && array_contains(col("visited"), col("loc")))).as("cycle"),
          when(advance, concat(col("visited"), array(col("loc"))))
            .otherwise(col("visited"))
            .as("visited")
        )
    }
    val fetched = basis.select(col("url").as("cur"), col("status").as("cur_status"))
    st
      .join(e.withColumnRenamed("loc", "still_loc"), Seq("cur"), "left")
      .join(fetched, Seq("cur"), "left")
      .select(
        col("origin").as("url"),
        when(col("cycle"), lit("cycle"))
          .when(col("still_loc").isNotNull, lit("truncated"))
          .when(col("cur_status").isNotNull, lit("ok"))
          .otherwise(lit("dangling"))
          .as("status"),
        col("cur"),
        col("hops")
      )
      .select(
        col("url"),
        when(col("status").isin("cycle", "truncated"), lit(null).cast("string"))
          .otherwise(col("cur"))
          .as("final_url"),
        col("hops"),
        col("status")
      )
  }
}
