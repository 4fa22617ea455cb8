package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and the crawl-politeness gate (RFC 9309, the
  * Robots Exclusion Protocol): per-domain robots files parse into
  * user-agent-scoped Allow/Disallow rules; each frontier URL is judged
  * by the most specific matching group's LONGEST matching rule, Allow
  * winning length ties — the gate every compliant crawler runs between
  * frontier scheduling and fetch.
  *
  * Implemented subset (documented, like [[Urls.TwoLevelSuffixes]] vs
  * the full public-suffix list): prefix patterns plus the `$` end
  * anchor; `*` wildcards and multi-user-agent group headers are out of
  * scope. The ALGORITHM (group scoping, longest-match octet precedence,
  * Allow tie-break) is the RFC's.
  *
  * Scale posture: robots files are per-HOST (~10^8 rows at full-web
  * scale, a dimension table), so the gate is a broadcast join against
  * the corpus-linear frontier; the rule argmax is a `max(struct)` that
  * COMBINES MAP-SIDE (partial_max before the exchange — struct max
  * plans as SortAggregate, but only one row per URL crosses the wire,
  * never one per matched rule) and never windows the frontier. Parsing
  * is one per-domain window over robots LINES (files are KB-bounded by
  * crawler convention — Google caps at 500 KiB — so partitions are
  * tiny), confined to the broadcast side.
  *
  * Generalizes the reference's broadcast stop-list gate
  * (`/root/reference/src/index.js:155-160`, a word is dropped if it
  * appears in the broadcast set) from set membership to scoped
  * longest-prefix rule resolution.
  */
object Robots {

  /** The engine's crawler product token (the fixture scopes groups to it). */
  val Agent = "graftbot"

  /** Deterministic per-domain robots.txt fixture. Seeded from the
    * domain string itself (source index × suffix index) so both engines
    * construct identical bytes:
    *
    *   - a `*` group disallowing `/p/{(seed+3)%7}`, plus — when
    *     seed≡1 (mod 4) — a `$`-anchored `/p/{(seed+5)%7}$`;
    *   - when seed is even, a `graftbot` group disallowing
    *     `/p/{seed%7}`, with — when 3|seed — an `Allow` override for
    *     exactly the `?id=` form (longer match ⇒ wins over the
    *     Disallow).
    *
    * Domains WITHOUT a graftbot group exercise the fall-back-to-`*`
    * scoping; domains with one exercise group specificity (their `*`
    * rules must NOT apply to graftbot). `Crawl-delay` lines land in the
    * `*` group when seed≡1 (mod 3) and in the graftbot group when
    * 10|seed — so specific-group delays, fall-back-to-`*` delays, and
    * default-delay domains are all non-vacuous.
    */
  def robotsTxt(domain: Column): Column = {
    val k = regexp_extract(domain, "^src([0-9]+)", 1).cast("long")
    val s = when(domain.endsWith(".co.uk"), 3L)
      .when(domain.endsWith(".com"), 0L)
      .when(domain.endsWith(".org"), 1L)
      .when(domain.endsWith(".net"), 2L)
      .otherwise(4L)
    val seed = k * 5 + s
    val d1 = pmod(seed, lit(7L)).cast("string")
    val d2 = pmod(seed + 3, lit(7L)).cast("string")
    val d3 = pmod(seed + 5, lit(7L)).cast("string")
    val star = concat(
      lit("User-agent: *\nDisallow: /p/"),
      d2,
      when(pmod(seed, lit(4L)) === 1, concat(lit("\nDisallow: /p/"), d3, lit("$")))
        .otherwise(lit("")),
      when(
        pmod(seed, lit(3L)) === 1,
        concat(lit("\nCrawl-delay: "), (pmod(seed, lit(5L)) + 1).cast("string"))
      ).otherwise(lit(""))
    )
    val bot = when(
      pmod(seed, lit(2L)) === 0,
      concat(
        lit(s"\nUser-agent: $Agent\nDisallow: /p/"),
        d1,
        when(pmod(seed, lit(3L)) === 0, concat(lit("\nAllow: /p/"), d1, lit("?id="), d1))
          .otherwise(lit("")),
        when(
          pmod(seed, lit(5L)) === 0,
          concat(lit("\nCrawl-delay: "), (pmod(seed, lit(3L)) + 2).cast("string"))
        ).otherwise(lit(""))
      )
    ).otherwise(lit(""))
    concat(lit("# robots fixture\n"), star, bot)
  }

  /** DuckDB mirror of [[robotsTxt]] over a domain expression. */
  def robotsTxtSql(domain: String): String = {
    val k = s"CAST(regexp_extract($domain, '^src([0-9]+)', 1) AS BIGINT)"
    val sfx =
      s"""CASE WHEN ends_with($domain, '.co.uk') THEN 3
         |     WHEN ends_with($domain, '.com') THEN 0
         |     WHEN ends_with($domain, '.org') THEN 1
         |     WHEN ends_with($domain, '.net') THEN 2
         |     ELSE 4 END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    val seed = s"($k * 5 + $sfx)"
    val d1 = s"CAST($seed % 7 AS VARCHAR)"
    val d2 = s"CAST(($seed + 3) % 7 AS VARCHAR)"
    val d3 = s"CAST(($seed + 5) % 7 AS VARCHAR)"
    s"""('# robots fixture' || chr(10)
       | || 'User-agent: *' || chr(10) || 'Disallow: /p/' || $d2
       | || CASE WHEN $seed % 4 = 1
       |      THEN chr(10) || 'Disallow: /p/' || $d3 || '$$' ELSE '' END
       | || CASE WHEN $seed % 3 = 1
       |      THEN chr(10) || 'Crawl-delay: ' || CAST($seed % 5 + 1 AS VARCHAR) ELSE '' END
       | || CASE WHEN $seed % 2 = 0
       |      THEN chr(10) || 'User-agent: $Agent' || chr(10) || 'Disallow: /p/' || $d1
       |        || CASE WHEN $seed % 3 = 0
       |             THEN chr(10) || 'Allow: /p/' || $d1 || '?id=' || $d1 ELSE '' END
       |        || CASE WHEN $seed % 5 = 0
       |             THEN chr(10) || 'Crawl-delay: ' || CAST($seed % 3 + 2 AS VARCHAR) ELSE '' END
       |      ELSE '' END)""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }

  /** Deterministic per-domain sitemap.xml fixture (the [[robotsTxt]]
    * seeding recipe): two-to-three `<url><loc>` entries per domain —
    * one `/p/` path that may collide with an already-fetched canonical
    * (non-vacuous dedup) and `/s/` paths the corpus never fetched
    * (genuinely new discoveries).
    */
  def sitemapXml(domain: Column): Column = {
    val k = regexp_extract(domain, "^src([0-9]+)", 1).cast("long")
    val s = when(domain.endsWith(".co.uk"), 3L)
      .when(domain.endsWith(".com"), 0L)
      .when(domain.endsWith(".org"), 1L)
      .when(domain.endsWith(".net"), 2L)
      .otherwise(4L)
    val seed = k * 5 + s
    val entry = (path: Column) =>
      concat(lit("<url><loc>https://"), domain, path, lit("</loc></url>"))
    concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      entry(concat(lit("/p/"), pmod(seed, lit(7L)).cast("string"))),
      entry(concat(lit("/s/"), pmod(seed, lit(5L)).cast("string"))),
      when(
        pmod(seed, lit(2L)) === 0,
        entry(concat(lit("/s/"), pmod(seed + 3, lit(5L)).cast("string")))
      ).otherwise(lit("")),
      lit("</urlset>")
    )
  }

  /** DuckDB mirror of [[sitemapXml]]. */
  def sitemapXmlSql(domain: String): String = {
    val k = s"CAST(regexp_extract($domain, '^src([0-9]+)', 1) AS BIGINT)"
    val sfx =
      s"""CASE WHEN ends_with($domain, '.co.uk') THEN 3
         |     WHEN ends_with($domain, '.com') THEN 0
         |     WHEN ends_with($domain, '.org') THEN 1
         |     WHEN ends_with($domain, '.net') THEN 2
         |     ELSE 4 END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    val seed = s"($k * 5 + $sfx)"
    def entry(path: String) = s"'<url><loc>https://' || $domain || $path || '</loc></url>'"
    s"""('<?xml version="1.0"?><urlset>'
       | || ${entry(s"'/p/' || CAST($seed % 7 AS VARCHAR)")}
       | || ${entry(s"'/s/' || CAST($seed % 5 AS VARCHAR)")}
       | || CASE WHEN $seed % 2 = 0
       |      THEN ${entry(s"'/s/' || CAST(($seed + 3) % 5 AS VARCHAR)")} ELSE '' END
       | || '</urlset>')""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }

  /** `<loc>` entries of a `(domain, xml)` sitemap table, canonicalized:
    * `(domain, link)`. Regex-on-column parsing (the href recipe) — the
    * fixture subset has no CDATA/entities; map-only at any scale.
    */
  def sitemapLinks(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(
        col("domain"),
        explode(regexp_extract_all(col("xml"), lit("<loc>([^<]*)</loc>"), lit(1))).as("raw")
      )
      .select(col("domain"), Urls.normalizeUrl(col("raw")).as("link"))

  /** Parse `(domain, txt)` robots files into scoped rules
    * `(domain, agent, allow, pattern)`. A rule line belongs to the
    * nearest preceding `User-agent:` line (single-agent groups — the
    * fixture subset); comment / blank / empty-pattern lines drop, and
    * rules before any group header drop (RFC: rules outside a group
    * have no meaning).
    */
  /** Lines of every robots file with their governing group: each line
    * carries the nearest preceding `User-agent:` as `agent` (null before
    * any group header) — the scoping pass [[parseRules]] and
    * [[parseDelays]] share.
    */
  private def scopedLines(robots: DataFrame): DataFrame = {
    val lines = robots.select(
      col("domain"),
      posexplode(split(col("txt"), "\n")).as(Seq("pos", "line"))
    )
    val ua = regexp_extract(col("line"), "^[Uu]ser-agent:\\s*(\\S+)", 1)
    val w = Window
      .partitionBy(col("domain"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines.select(
      col("domain"),
      last(when(ua =!= "", ua), ignoreNulls = true).over(w).as("agent"),
      col("line")
    )
  }

  def parseRules(robots: DataFrame): DataFrame = {
    val dir = regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S*)", 1)
    val pat = regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S*)", 2)
    scopedLines(robots)
      .select(col("domain"), col("agent"), dir.as("dir"), pat.as("pattern"))
      .where(col("dir") =!= "" && col("pattern") =!= "" && col("agent").isNotNull)
      .select(col("domain"), col("agent"), (col("dir") === "Allow").as("allow"), col("pattern"))
  }

  /** `Crawl-delay` directives (the de-facto REP extension every major
    * crawler except Google honors), group-scoped like [[parseRules]]:
    * `(domain, agent, delay_s)`.
    */
  def parseDelays(robots: DataFrame): DataFrame = {
    val delay = regexp_extract(col("line"), "^[Cc]rawl-delay:\\s*([0-9]+)", 1)
    scopedLines(robots)
      .select(col("domain"), col("agent"), delay.as("delay"))
      .where(col("delay") =!= "" && col("agent").isNotNull)
      .select(col("domain"), col("agent"), col("delay").cast("long").as("delay_s"))
  }

  /** Per-domain effective crawl delay for `agent`, with the gate's group
    * semantics: a UA is governed by exactly ONE group — its own if the
    * domain declares one (even a delay-less one: the `*` delay must not
    * leak into it), else `*`; a governing group without a delay means
    * `defaultS`. Group presence comes from the `User-agent:` headers
    * themselves, so an empty specific group still shields its agent.
    * Output: `(domain, delay_s)` for every domain in `robots`.
    */
  def effectiveDelay(robots: DataFrame, agent: String = Agent, defaultS: Long = 1L): DataFrame = {
    val groups = scopedLines(robots)
      .where(col("agent").isNotNull)
      .select(col("domain"), col("agent"))
      .distinct()
    val hasSpec = groups
      .where(col("agent") === agent)
      .select(col("domain"))
      .distinct()
      .withColumn("has_spec", lit(true))
    val scoped = parseDelays(robots)
      .join(hasSpec, Seq("domain"), "left")
      .where(
        when(coalesce(col("has_spec"), lit(false)), col("agent") === agent)
          .otherwise(col("agent") === "*")
      )
      .select(col("domain"), col("delay_s"))
    robots
      .select(col("domain"))
      .distinct()
      .join(scoped, Seq("domain"), "left")
      .select(col("domain"), coalesce(col("delay_s"), lit(defaultS)).as("delay_s"))
  }

  /** Per-URL crawl verdict for `agent` over `urls`
    * `(doc_id, domain, url_norm)`: the judged group is `agent`'s own if
    * the domain DECLARES one — presence comes from the `User-agent:`
    * headers, so an empty specific group still governs (RFC 9309: a
    * group exists by its header; `*` rules must not leak into it) —
    * else `*`; within it the longest matching rule decides, Allow
    * winning length ties (§2.2.2), both encoded in one
    * map-side-combining `max(struct(len, allow, pattern))`. Patterns
    * match the URL's path+query; a trailing `$` anchors to the exact
    * target. No matching rule ⇒ allowed.
    *
    * Output: `(doc_id, domain, allowed, rule)` with `rule` the winning
    * pattern (null when nothing matched).
    */
  def gate(urls: DataFrame, robots: DataFrame, agent: String = Agent): DataFrame = {
    val rules = parseRules(robots)
    val hasSpec = scopedLines(robots)
      .where(col("agent") === agent)
      .select(col("domain"))
      .distinct()
      .withColumn("has_spec", lit(true))
    val scoped = rules
      .join(hasSpec, Seq("domain"), "left")
      .where(
        when(coalesce(col("has_spec"), lit(false)), col("agent") === agent)
          .otherwise(col("agent") === "*")
      )
      .select(col("domain"), col("allow"), col("pattern"))
    val target = regexp_replace(col("url_norm"), "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val anchored = col("pattern").endsWith("$")
    val matched = when(anchored, col("target") === rtrim(col("pattern"), "$"))
      .otherwise(col("target").startsWith(col("pattern")))
    urls
      .withColumn("target", target)
      .join(broadcast(scoped), Seq("domain"), "left")
      .groupBy(col("doc_id"), col("domain"))
      .agg(
        max(
          when(matched, struct(length(col("pattern")).as("l"), col("allow").as("a"), col("pattern").as("p")))
        ).as("win")
      )
      .select(
        col("doc_id"),
        col("domain"),
        coalesce(col("win.a"), lit(true)).as("allowed"),
        col("win.p").as("rule")
      )
  }
}
