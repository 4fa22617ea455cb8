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
  * Pattern language: RFC 9309 §2.2.3 in full — prefix patterns,
  * mid-pattern `*` wildcards (any run of octets, compiled to anchored
  * regexes with literal escaping; non-wildcard rules keep the cheap
  * prefix fast path), and the `$` end anchor. Precedence is by the
  * PATTERN's octet length (`$`/`*` count — the wildcard-length rule,
  * pinned in RobotsSpec), Allow winning ties. Groups are header-
  * declared: consecutive `User-agent:` lines STACK onto one rule block
  * (§2.1 — each listed agent owns the whole group), and multiple groups
  * naming the same agent MERGE (their rule unions judge together).
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
    val d4 = pmod(seed + 1, lit(7L)).cast("string")
    val d6 = pmod(seed + 2, lit(7L)).cast("string")
    val star = concat(
      lit("User-agent: *\nDisallow: /p/"),
      d2,
      when(pmod(seed, lit(4L)) === 1, concat(lit("\nDisallow: /p/"), d3, lit("$")))
        .otherwise(lit("")),
      // RFC 9309 §2.2.3 wildcard lane: blocks the ?id= form of EVERY
      // path whose id lands on d4 — longer than the prefix rules, so it
      // also exercises the wildcard-length precedence
      when(pmod(seed, lit(5L)) === 2, concat(lit("\nDisallow: /p/*?id="), d4))
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
        // anchored wildcard lane: matches only the canonical '?a=1&b=2'
        // query form, wildcard and $ together
        when(pmod(seed, lit(7L)) === 4, lit("\nDisallow: /p/*&b=2$")).otherwise(lit("")),
        when(
          pmod(seed, lit(5L)) === 0,
          concat(lit("\nCrawl-delay: "), (pmod(seed, lit(3L)) + 2).cast("string"))
        ).otherwise(lit(""))
      )
    ).otherwise(lit(""))
    // stacked-header group (RFC 9309 §2.1): extrabot and graftbot co-own
    // one rule block. On odd seeds this DECLARES graftbot's only group
    // (the * rules stop leaking into it); on even seeds it MERGES with
    // the group above — both RFC behaviors non-vacuous
    val stacked = when(
      pmod(seed, lit(8L)) === 5,
      concat(lit(s"\nUser-agent: extrabot\nUser-agent: $Agent\nDisallow: /p/"), d6)
    ).otherwise(lit(""))
    concat(lit("# robots fixture\n"), star, bot, stacked)
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
    val d4 = s"CAST(($seed + 1) % 7 AS VARCHAR)"
    val d6 = s"CAST(($seed + 2) % 7 AS VARCHAR)"
    s"""('# robots fixture' || chr(10)
       | || 'User-agent: *' || chr(10) || 'Disallow: /p/' || $d2
       | || CASE WHEN $seed % 4 = 1
       |      THEN chr(10) || 'Disallow: /p/' || $d3 || '$$' ELSE '' END
       | || CASE WHEN $seed % 5 = 2
       |      THEN chr(10) || 'Disallow: /p/*?id=' || $d4 ELSE '' END
       | || CASE WHEN $seed % 3 = 1
       |      THEN chr(10) || 'Crawl-delay: ' || CAST($seed % 5 + 1 AS VARCHAR) ELSE '' END
       | || CASE WHEN $seed % 2 = 0
       |      THEN chr(10) || 'User-agent: $Agent' || chr(10) || 'Disallow: /p/' || $d1
       |        || CASE WHEN $seed % 3 = 0
       |             THEN chr(10) || 'Allow: /p/' || $d1 || '?id=' || $d1 ELSE '' END
       |        || CASE WHEN $seed % 7 = 4
       |             THEN chr(10) || 'Disallow: /p/*&b=2$$' ELSE '' END
       |        || CASE WHEN $seed % 5 = 0
       |             THEN chr(10) || 'Crawl-delay: ' || CAST($seed % 3 + 2 AS VARCHAR) ELSE '' END
       |      ELSE '' END
       | || CASE WHEN $seed % 8 = 5
       |      THEN chr(10) || 'User-agent: extrabot' || chr(10) || 'User-agent: $Agent'
       |        || chr(10) || 'Disallow: /p/' || $d6
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

  /** The [[robotsTxt]]/[[sitemapXml]] seeding arithmetic, shared. */
  private def seedCol(domain: Column): Column = {
    val k = regexp_extract(domain, "^src([0-9]+)", 1).cast("long")
    val s = when(domain.endsWith(".co.uk"), 3L)
      .when(domain.endsWith(".com"), 0L)
      .when(domain.endsWith(".org"), 1L)
      .when(domain.endsWith(".net"), 2L)
      .otherwise(4L)
    k * 5 + s
  }

  /** DuckDB mirror of [[seedCol]]. */
  def seedSql(domain: String): String = {
    val k = s"CAST(regexp_extract($domain, '^src([0-9]+)', 1) AS BIGINT)"
    val sfx =
      s"""CASE WHEN ends_with($domain, '.co.uk') THEN 3
         |     WHEN ends_with($domain, '.com') THEN 0
         |     WHEN ends_with($domain, '.org') THEN 1
         |     WHEN ends_with($domain, '.net') THEN 2
         |     ELSE 4 END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    s"($k * 5 + $sfx)"
  }

  /** Do `domain`'s sitemaps ship as a `<sitemapindex>` of gzipped child
    * sitemaps (the large-site convention) in the fixture? Every third
    * seed — flat and indexed domains both non-vacuous.
    */
  def sitemapIsIndexed(domain: Column): Column = pmod(seedCol(domain), lit(3L)) === 0

  def sitemapIsIndexedSql(domain: String): String = s"(${seedSql(domain)} % 3 = 0)"

  /** Child urlset xml of an INDEXED domain's sitemap tree (`which` ∈
    * {a, b}): child a carries a corpus-colliding `/p/` entry plus an
    * `/s/` discovery; child b carries two discoveries (one on the `/sx/`
    * namespace only the index tree reaches — proof the recursion ran).
    */
  def sitemapChildXml(domain: Column, which: String): Column = {
    val seed = seedCol(domain)
    val entry = (path: Column) =>
      concat(lit("<url><loc>https://"), domain, path, lit("</loc></url>"))
    val entries =
      if (which == "a")
        concat(
          entry(concat(lit("/p/"), pmod(seed, lit(7L)).cast("string"))),
          entry(concat(lit("/s/"), pmod(seed, lit(5L)).cast("string")))
        )
      else
        concat(
          entry(concat(lit("/s/"), pmod(seed + 3, lit(5L)).cast("string"))),
          entry(concat(lit("/sx/"), pmod(seed + 1, lit(4L)).cast("string")))
        )
    concat(lit("<?xml version=\"1.0\"?><urlset>"), entries, lit("</urlset>"))
  }

  /** DuckDB mirror of [[sitemapChildXml]]. */
  def sitemapChildSql(domain: String, which: String): String = {
    val seed = seedSql(domain)
    def entry(path: String) = s"'<url><loc>https://' || $domain || $path || '</loc></url>'"
    val entries =
      if (which == "a")
        s"${entry(s"'/p/' || CAST($seed % 7 AS VARCHAR)")} || ${entry(s"'/s/' || CAST($seed % 5 AS VARCHAR)")}"
      else
        s"${entry(s"'/s/' || CAST(($seed + 3) % 5 AS VARCHAR)")} || ${entry(s"'/sx/' || CAST(($seed + 1) % 4 AS VARCHAR)")}"
    s"""('<?xml version="1.0"?><urlset>' || $entries || '</urlset>')""".stripMargin
  }

  /** Deterministic fixture of FETCHED sitemap documents per domain —
    * `(domain, url, body binary)`, the shape a crawler's sitemap fetches
    * land in. Indexed domains ([[sitemapIsIndexed]]) get a plain-text
    * `<sitemapindex>` root naming two GZIPPED child urlsets (real large
    * sites ship exactly this) plus the child documents; flat domains get
    * the [[sitemapXml]] urlset as the root body. Construction is
    * declarative column work end to end — the gzip is the native
    * [[graft.functions.GzipUtf8]] kernel.
    */
  def sitemapDocs(domains: DataFrame): DataFrame = {
    val dom = col("domain")
    val root = concat(lit("https://"), dom, lit("/sitemap.xml"))
    val urlA = concat(lit("https://"), dom, lit("/sitemap-a.xml.gz"))
    val urlB = concat(lit("https://"), dom, lit("/sitemap-b.xml.gz"))
    val idxXml = concat(
      lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>"),
      urlA,
      lit("</loc></sitemap><sitemap><loc>"),
      urlB,
      lit("</loc></sitemap></sitemapindex>")
    )
    val indexed = domains.where(sitemapIsIndexed(dom))
    val flat = domains.where(!sitemapIsIndexed(dom))
    flat
      .select(dom, root.as("url"), sitemapXml(dom).cast("binary").as("body"))
      .unionByName(indexed.select(dom, root.as("url"), idxXml.cast("binary").as("body")))
      .unionByName(
        indexed.select(
          dom,
          urlA.as("url"),
          graft.functions.GzipUtf8.gzipUtf8(sitemapChildXml(dom, "a")).as("body")
        )
      )
      .unionByName(
        indexed.select(
          dom,
          urlB.as("url"),
          graft.functions.GzipUtf8.gzipUtf8(sitemapChildXml(dom, "b")).as("body")
        )
      )
  }

  /** Recursive sitemap parsing over fetched sitemap documents
    * `(domain, url, body binary)` starting from `roots (domain, url)`:
    * a root that is a `<sitemapindex>` (sitemaps.org index files, plain
    * or gzipped) has its `<sitemap><loc>` children resolved against the
    * document table and THEIR urlsets parsed; a flat root parses
    * directly. One join level is the COMPLETE protocol — index files may
    * not list other index files (sitemaps.org spec), so a nested index
    * contributes nothing and is dropped. Gzip is transparent
    * ([[graft.functions.MaybeGunzip]]). Output `(domain, link)`
    * canonicalized.
    *
    * Scale posture: sitemap documents are a per-HOST dimension table;
    * both the child resolution and the parses are host-keyed joins and
    * map-only regex work — corpus-size-invariant like the robots gate.
    */
  def sitemapLinksDeep(docs: DataFrame, roots: DataFrame): DataFrame = {
    // projection barrier (the CollapseProject lesson, 4th instance):
    // `txt` feeds the root classification, the child-loc explode, AND
    // the child-side join — left lazy, Catalyst inlines the decode tree
    // (and everything upstream of `docs`) into every reference and
    // optimization blows up combinatorially on the self-join. The
    // barrier is one pass over a host-dimension-sized 3-column frame.
    val parsed = docs
      .select(
        col("domain"),
        col("url"),
        decode(graft.functions.MaybeGunzip.maybeGunzip(col("body")), "UTF-8").as("txt")
      )
      .localCheckpoint()
    val isIdx = col("txt").contains("<sitemapindex")
    val rooted = parsed.join(roots.select(col("domain"), col("url")), Seq("domain", "url"))
    val flatLeaves = rooted.where(!isIdx).select(col("domain"), col("txt"))
    val childLocs = rooted
      .where(isIdx)
      .select(
        col("domain"),
        explode(regexp_extract_all(col("txt"), lit("<loc>([^<]*)</loc>"), lit(1))).as("url")
      )
    val childLeaves = childLocs
      .join(parsed, Seq("domain", "url"))
      .where(!isIdx) // an index listing an index is spec-invalid; drop it
      .select(col("domain"), col("txt"))
    sitemapLinks(
      flatLeaves.unionByName(childLeaves).withColumnRenamed("txt", "xml")
    )
  }

  /** Lines of every robots file with their group id: a GROUP starts at
    * a `User-agent:` line whose previous line is not one (consecutive
    * headers STACK onto the same group — RFC 9309 §2.1), so `gid`
    * numbers rule blocks and every header run's agents co-own the block.
    * `ua` carries the header's token ('' on non-header lines); `gid` 0
    * means "before any group" (such lines have no meaning per the RFC).
    * Both windows run per-domain over robots LINES — KB-bounded files,
    * broadcast-side only.
    */
  private def scopedLines(robots: DataFrame): DataFrame = {
    val lines = robots.select(
      col("domain"),
      posexplode(split(col("txt"), "\n")).as(Seq("pos", "line"))
    )
    val ua = regexp_extract(col("line"), "^[Uu]ser-agent:\\s*(\\S+)", 1)
    val ord = Window.partitionBy(col("domain")).orderBy(col("pos"))
    val run = Window
      .partitionBy(col("domain"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines
      .select(col("domain"), col("pos"), col("line"), ua.as("ua"))
      .withColumn("prev_ua", lag(col("ua") =!= "", 1, false).over(ord))
      .withColumn(
        "gid",
        sum(when(col("ua") =!= "" && !col("prev_ua"), 1L).otherwise(0L)).over(run)
      )
      .drop("prev_ua")
  }

  /** The agents of every group: `(domain, gid, agent)` — one row per
    * stacked `User-agent:` header. Group PRESENCE for an agent derives
    * from these rows (a header alone declares the group, even rule-less).
    */
  private def groupAgents(robots: DataFrame): DataFrame =
    scopedLines(robots)
      .where(col("ua") =!= "")
      .select(col("domain"), col("gid"), col("ua").as("agent"))
      .distinct()

  /** Domains declaring a group for `agent` (presence-by-header). */
  private def agentDomains(robots: DataFrame, agent: String): DataFrame =
    groupAgents(robots)
      .where(col("agent") === agent)
      .select(col("domain"))
      .distinct()
      .withColumn("has_spec", lit(true))

  /** Parse `(domain, txt)` robots files into scoped rules
    * `(domain, agent, allow, pattern)`: each rule line joins the agents
    * of ITS group (stacked headers give the rule to every listed agent;
    * several groups naming one agent merge into its rule union).
    * Comment / blank / empty-pattern lines drop, and rules before any
    * group header drop (RFC: rules outside a group have no meaning).
    */
  def parseRules(robots: DataFrame): DataFrame = {
    val dir = regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S*)", 1)
    val pat = regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S*)", 2)
    scopedLines(robots)
      .select(col("domain"), col("gid"), dir.as("dir"), pat.as("pattern"))
      .where(col("dir") =!= "" && col("pattern") =!= "")
      .join(groupAgents(robots), Seq("domain", "gid"))
      .select(col("domain"), col("agent"), (col("dir") === "Allow").as("allow"), col("pattern"))
  }

  /** `Crawl-delay` directives (the de-facto REP extension every major
    * crawler except Google honors), group-scoped like [[parseRules]]:
    * `(domain, agent, delay_s)`.
    */
  def parseDelays(robots: DataFrame): DataFrame = {
    val delay = regexp_extract(col("line"), "^[Cc]rawl-delay:\\s*([0-9]+)", 1)
    scopedLines(robots)
      .select(col("domain"), col("gid"), delay.as("delay"))
      .where(col("delay") =!= "")
      .join(groupAgents(robots), Seq("domain", "gid"))
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
    val hasSpec = agentDomains(robots, agent)
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
    val hasSpec = agentDomains(robots, agent)
    val scoped = rules
      .join(hasSpec, Seq("domain"), "left")
      .where(
        when(coalesce(col("has_spec"), lit(false)), col("agent") === agent)
          .otherwise(col("agent") === "*")
      )
      .select(col("domain"), col("allow"), col("pattern"))
    val target = regexp_replace(col("url_norm"), "^[a-z][a-z0-9+.-]*://[^/]*", "")
    val matched = ruleMatch(col("target"), col("pattern"))
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

  /** Does a robots `pattern` match `target` (the URL's path+query)?
    * RFC 9309 §2.2.3 in full: `*` matches any octet run, a trailing `$`
    * anchors the end, everything else is literal. Patterns WITHOUT a
    * wildcard take the cheap prefix/exact fast path (the common case —
    * no per-row regex); wildcard patterns compile to an anchored regex
    * with every metacharacter escaped. Shared by [[gate]] and the
    * oracle's [[ruleMatchSql]] mirror.
    */
  def ruleMatch(target: Column, pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val core = when(anchored, substring(pattern, lit(1), length(pattern) - 1)).otherwise(pattern)
    val fast = when(anchored, target === core).otherwise(target.startsWith(core))
    val escaped =
      regexp_replace(core, "([\\.\\^\\$\\|\\?\\+\\(\\)\\[\\]\\{\\}\\\\])", "\\\\$1")
    val rx = concat(
      lit("^"),
      regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit(""))
    )
    when(core.contains("*"), graft.util.Cols.rlikeCol(target, rx)).otherwise(fast)
  }

  /** DuckDB mirror of [[ruleMatch]] over `target`/`pattern` SQL
    * expressions (RE2 and Java agree on escaped-literal + `.*` + anchor
    * regexes, which is all this builds).
    */
  def ruleMatchSql(target: String, pattern: String): String = {
    val anchored = s"($pattern LIKE '%$$')"
    val core =
      s"(CASE WHEN $anchored THEN left($pattern, len($pattern) - 1) ELSE $pattern END)"
    val fast =
      s"(CASE WHEN $anchored THEN $target = $core ELSE starts_with($target, $core) END)"
    val escaped =
      s"""regexp_replace($core, '([\\.\\^\\$$\\|\\?\\+\\(\\)\\[\\]\\{\\}\\\\])', '\\\\\\1', 'g')"""
    val rx =
      s"('^' || regexp_replace($escaped, '\\*', '.*', 'g') || CASE WHEN $anchored THEN '$$' ELSE '' END)"
    s"(CASE WHEN position('*' IN $core) > 0 THEN regexp_matches($target, $rx) ELSE $fast END)"
  }
}
