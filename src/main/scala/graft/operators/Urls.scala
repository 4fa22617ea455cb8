package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** URL operations for crawl pipelines: syntax-based normalization
  * (RFC 3986 §6.2.2 case + default-port rules, plus the tracking-param
  * strip and query-param canonical sort every production crawl dedup
  * applies), registered-domain (eTLD+1) extraction, and a deterministic
  * dirty-URL fixture over the documents table.
  *
  * Everything is pure `functions._` Column composition — regexp splits,
  * higher-order array filter/sort — no UDFs, so the whole family stays
  * inside whole-stage codegen and each rule has a DuckDB mirror the
  * oracle replays verbatim.
  *
  * Generalizes the reference's source-stage normalization (lowercase +
  * filter before keying, `/root/reference/src/index.js:155-160`) from
  * word tokens to crawl URLs.
  */
object Urls {

  /** Query parameters a crawl dedup strips before keying: click/campaign
    * trackers that vary per visit without changing the fetched content.
    */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|ref)="

  /** Two-level public suffixes the engine ships built in (a documented
    * SUBSET of the public-suffix list — production deployments load the
    * full list into this set; the ALGORITHM is suffix-set-size-agnostic).
    */
  val TwoLevelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "co.nz")

  /** Syntax-based URL normalization:
    *
    *   1. scheme and host lowercased (RFC 3986 §6.2.2.1);
    *   2. default port stripped — `:443` under https, `:80` under http —
    *      non-default ports kept (RFC 3986 §6.2.3);
    *   3. empty path → `/` (§6.2.3);
    *   4. fragment dropped (never sent to the server);
    *   5. tracking params ([[TrackingParamRe]]) dropped, remaining params
    *      sorted bytewise — one canonical member per param ordering.
    *
    * Path segments and percent-encoding are preserved verbatim (dot-
    * segment removal and percent-case folding change semantics on
    * non-compliant servers; pipelines wanting them compose another pass).
    */
  def normalizeUrl(u: Column): Column =
    Bridge.column(graft.functions.UrlNormalize(Bridge.expression(u)))

  /** The `Column`-composed reference formulation of [[normalizeUrl]] —
    * kept as the executable SPEC of the kernel (`UrlSpec` cross-checks
    * kernel == columns on the fixture and edge vectors). Not used in
    * queries: ~20 references of `u` through derived sub-columns make
    * nested compositions like `normalizeUrl(resolveUrl(...))` a
    * multiplicatively-duplicated tree whose analysis+codegen cost ~13 s
    * of fixed driver overhead per frontier-family plan.
    */
  private[graft] def normalizeUrlCols(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = regexp_extract(afterScheme, "^([^/?#]*)", 1)
    // authority = [userinfo@]host[:port], host possibly an [IPv6] literal.
    // userinfo is preserved verbatim (case-significant credentials);
    // '@' cannot appear unencoded inside userinfo, so one prefix strip is
    // exact. Bracketed hosts keep their brackets; the port then sits
    // after ']:' (UrlSpec pins both shapes).
    val userinfo = regexp_extract(authority, "^([^@]*)@", 1)
    val userPrefix = when(userinfo === "", lit("")).otherwise(concat(userinfo, lit("@")))
    val hostport = regexp_replace(authority, "^[^@]*@", "")
    val host = lower(
      when(
        hostport.startsWith("["),
        regexp_extract(hostport, "^(\\[[^\\]]*\\])", 1)
      ).otherwise(regexp_extract(hostport, "^([^:]*)", 1))
    )
    val port = when(
      hostport.startsWith("["),
      regexp_extract(hostport, "\\]:([0-9]+)$", 1)
    ).otherwise(regexp_extract(hostport, "^[^:]*:([0-9]+)$", 1))
    val keepPort = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    // fragment off FIRST: RFC 3986 ends the query at '#', so a '?' inside
    // the fragment must not resurrect one (UrlSpec pins this)
    val prefrag = regexp_replace(regexp_replace(afterScheme, "^[^/?#]*", ""), "#.*", "")
    val path0 = regexp_extract(prefrag, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(prefrag, "\\?(.*)", 1)
    val kept = array_sort(
      filter(
        split(query, "&"),
        p => p =!= "" && !p.rlike(TrackingParamRe)
      )
    )
    val qNorm =
      when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept))).otherwise(lit(""))
    concat(scheme, lit("://"), userPrefix, host, keepPort, path, qNorm)
  }

  /** DuckDB mirror of [[normalizeUrl]] over a string expression. */
  def normalizeUrlSql(e: String): String = {
    val scheme = s"lower(regexp_extract($e, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val after = s"regexp_replace($e, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val authority = s"regexp_extract($after, '^([^/?#]*)', 1)"
    val userinfo = s"regexp_extract($authority, '^([^@]*)@', 1)"
    val userPrefix = s"CASE WHEN $userinfo = '' THEN '' ELSE $userinfo || '@' END"
    val hostport = s"regexp_replace($authority, '^[^@]*@', '')"
    val host =
      s"""lower(CASE WHEN starts_with($hostport, '[')
         |  THEN regexp_extract($hostport, '^(\\[[^\\]]*\\])', 1)
         |  ELSE regexp_extract($hostport, '^([^:]*)', 1) END)""".stripMargin
        .replaceAll("\\s*\\n\\s*", " ")
    val port =
      s"""CASE WHEN starts_with($hostport, '[')
         |  THEN regexp_extract($hostport, '\\]:([0-9]+)$$', 1)
         |  ELSE regexp_extract($hostport, '^[^:]*:([0-9]+)$$', 1) END""".stripMargin
        .replaceAll("\\s*\\n\\s*", " ")
    val keepPort =
      s"""CASE WHEN $port = '' THEN ''
         |     WHEN $scheme = 'https' AND $port = '443' THEN ''
         |     WHEN $scheme = 'http' AND $port = '80' THEN ''
         |     ELSE ':' || $port END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    val prefrag =
      s"regexp_replace(regexp_replace($after, '^[^/?#]*', ''), '#.*', '')"
    val path0 = s"regexp_extract($prefrag, '^([^?]*)', 1)"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    val query = s"regexp_extract($prefrag, '\\?(.*)', 1)"
    val kept =
      s"""list_sort(list_filter(string_split($query, '&'),
         |  p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe')))""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    val qNorm =
      s"CASE WHEN len($kept) > 0 THEN '?' || array_to_string($kept, '&') ELSE '' END"
    s"($scheme || '://' || $userPrefix || $host || $keepPort || $path || $qNorm)"
  }

  /** Host of an (already normalized) URL — userinfo skipped, bracketed
    * IPv6 literals kept whole.
    */
  def hostOf(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(\\[[^\\]]*\\]|[^/:?#]*)", 1)

  def hostOfSql(e: String): String =
    s"regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?(\\[[^\\]]*\\]|[^/:?#]*)', 1)"

  /** SURT (Sort-friendly URI Reordering Transform) key over a URL — the
    * sort key of every Common-Crawl CDX index: host labels reversed and
    * comma-joined (leading `www.` dropped), `)` separator, then the
    * path+query verbatim. `com,example)/doc/7?id=3` sorts all of a
    * domain's (and its subdomains') captures contiguously, which is what
    * makes a sharded CDX binary-searchable by domain prefix. Normalizes
    * first so dirty variants key identically. Subset like the rest of
    * this family: dotted hosts (IPv6 literals and ports pass through
    * un-reversed in the host slot).
    */
  def surt(u: Column): Column = {
    val n = normalizeUrl(u)
    val host = regexp_replace(hostOf(n), "^www\\.", "")
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val pathq = regexp_replace(n, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    concat(rev, lit(")"), pathq)
  }

  /** DuckDB mirror of [[surt]]. */
  def surtSql(e: String): String = {
    val n = normalizeUrlSql(e)
    val host = s"regexp_replace(${hostOfSql(n)}, '^www\\.', '')"
    val rev = s"array_to_string(list_reverse(string_split($host, '.')), ',')"
    val pathq = s"regexp_replace($n, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    s"($rev || ')' || $pathq)"
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path, as a
    * string FOLD: non-dot segments append `/seg`, `..` pops the last
    * appended segment, `.` is a no-op; a trailing `/`, `/.`, or `/..`
    * re-appends the directory slash; an emptied path is `/`. Exactly the
    * RFC algorithm (the §5.4 vectors pin it in UrlSpec), expressed with
    * the `aggregate` higher-order function so it stays a single codegen
    * projection — no UDF, no iteration bound.
    */
  def removeDotSegments(p: Column): Column = {
    val segs = filter(split(p, "/"), s => s =!= "")
    val folded = aggregate(
      segs,
      lit(""),
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
          .otherwise(concat(acc, lit("/"), s))
    )
    val trail =
      when(p.rlike("/(\\.{1,2})?$") && folded =!= "", lit("/")).otherwise(lit(""))
    when(folded === "", lit("/")).otherwise(concat(folded, trail))
  }

  /** DuckDB mirror of [[removeDotSegments]] (list_reduce with a
    * prepended-empty-string accumulator — DuckDB's fold takes its init
    * from the first element).
    */
  def removeDotSegmentsSql(p: String): String = {
    val segs = s"list_filter(string_split($p, '/'), s -> s <> '')"
    val folded =
      s"""list_reduce(list_prepend('', $segs),
         |  (acc, s) -> CASE WHEN s = '.' THEN acc
         |                   WHEN s = '..' THEN regexp_replace(acc, '/[^/]*$$', '')
         |                   ELSE acc || '/' || s END)""".stripMargin
        .replaceAll("\\s*\\n\\s*", " ")
    val trail =
      s"CASE WHEN regexp_matches($p, '/(\\.{1,2})?$$') AND $folded <> '' THEN '/' ELSE '' END"
    s"CASE WHEN $folded = '' THEN '/' ELSE $folded || $trail END"
  }

  /** RFC 3986 §5.2.2 reference resolution — the outlink operator: an
    * extracted `href` resolved against the page it was found on. Covers
    * every case a crawler meets: absolute refs pass through, `//`
    * network-path refs take the base scheme, `?`/`#`/empty refs edit the
    * base, rooted and relative paths merge with the base directory and
    * run [[removeDotSegments]]. The §5.4 normal AND abnormal examples
    * are UrlSpec-pinned.
    */
  def resolveUrl(base: Column, ref: Column): Column =
    Bridge.column(
      graft.functions.UrlResolve(Bridge.expression(base), Bridge.expression(ref))
    )

  /** `Column`-composed reference formulation of [[resolveUrl]] — the
    * kernel's executable spec, like [[normalizeUrlCols]].
    */
  private[graft] def resolveUrlCols(base: Column, ref: Column): Column = {
    val baseScheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath =
      regexp_extract(regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""), "^([^?#]*)", 1)
    val baseNoFrag = regexp_replace(base, "#.*", "")
    val refPath = regexp_extract(ref, "^([^?#]*)", 1)
    val refTail = regexp_replace(ref, "^[^?#]*", "") // ?query#frag remainder
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    // §5.2.2 applies remove_dot_segments even when the reference has a
    // scheme or is network-path: http://h/a/../b must canonicalize to
    // http://h/b or canonical-URL dedup treats them as distinct. Opaque
    // scheme'd refs (mailto:, javascript: — no authority) pass verbatim;
    // an EMPTY path stays empty (remove_dot_segments of '' is '').
    val refAfterAuth = regexp_replace(ref, "^([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*", "")
    val refAbsOrigin = regexp_extract(ref, "^(([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*)", 1)
    val refAbsPath = regexp_extract(refAfterAuth, "^([^?#]*)", 1)
    val refAbsTail = regexp_replace(refAfterAuth, "^[^?#]*", "")
    val absPathNorm =
      when(refAbsPath === "", lit("")).otherwise(removeDotSegments(refAbsPath))
    when(
      ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(refAbsOrigin, absPathNorm, refAbsTail)
    )
      .when(ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), ref)
      .when(ref.startsWith("//"), concat(baseScheme, lit(":"), refAbsOrigin, absPathNorm, refAbsTail))
      .when(ref === "", baseNoFrag)
      .when(ref.startsWith("#"), concat(baseNoFrag, ref))
      .when(ref.startsWith("?"), concat(origin, basePath, ref))
      .when(ref.startsWith("/"), concat(origin, removeDotSegments(refPath), refTail))
      .otherwise(concat(origin, removeDotSegments(concat(baseDir, refPath)), refTail))
  }

  /** DuckDB mirror of [[resolveUrl]]. */
  def resolveUrlSql(base: String, ref: String): String = {
    val baseScheme = s"regexp_extract($base, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
    val origin = s"regexp_extract($base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    val basePath =
      s"regexp_extract(regexp_replace($base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '^([^?#]*)', 1)"
    val baseNoFrag = s"regexp_replace($base, '#.*', '')"
    val refPath = s"regexp_extract($ref, '^([^?#]*)', 1)"
    val refTail = s"regexp_replace($ref, '^[^?#]*', '')"
    val baseDir = s"regexp_replace($basePath, '[^/]*$$', '')"
    val refAfterAuth =
      s"regexp_replace($ref, '^([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*', '')"
    val refAbsOrigin =
      s"regexp_extract($ref, '^(([A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*)', 1)"
    val refAbsPath = s"regexp_extract($refAfterAuth, '^([^?#]*)', 1)"
    val refAbsTail = s"regexp_replace($refAfterAuth, '^[^?#]*', '')"
    val absPathNorm =
      s"(CASE WHEN $refAbsPath = '' THEN '' ELSE ${removeDotSegmentsSql(refAbsPath)} END)"
    s"""CASE
       | WHEN regexp_matches($ref, '^[A-Za-z][A-Za-z0-9+.-]*://')
       |   THEN $refAbsOrigin || $absPathNorm || $refAbsTail
       | WHEN regexp_matches($ref, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN $ref
       | WHEN starts_with($ref, '//')
       |   THEN $baseScheme || ':' || $refAbsOrigin || $absPathNorm || $refAbsTail
       | WHEN $ref = '' THEN $baseNoFrag
       | WHEN starts_with($ref, '#') THEN $baseNoFrag || $ref
       | WHEN starts_with($ref, '?') THEN $origin || $basePath || $ref
       | WHEN starts_with($ref, '/') THEN $origin || ${removeDotSegmentsSql(refPath)} || $refTail
       | ELSE $origin || ${removeDotSegmentsSql(s"($baseDir || $refPath)")} || $refTail
       |END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }

  /** Registered domain (eTLD+1): the last label plus the public suffix —
    * two labels normally, three when the host ends in a
    * [[TwoLevelSuffixes]] entry. Bare or single-label hosts pass
    * through. `www.a.b.co.uk` → `b.co.uk`, `sub.ex.com` → `ex.com`.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n >= lit(3) && last2.isin(TwoLevelSuffixes: _*), last3)
      .when(n >= lit(2), last2)
      .otherwise(host)
  }

  /** DuckDB mirror of [[registeredDomain]]. */
  def registeredDomainSql(e: String): String = {
    val suf = TwoLevelSuffixes.map(s => s"'$s'").mkString(", ")
    val parts = s"string_split($e, '.')"
    val n = s"len($parts)"
    val last2 = s"array_to_string(list_slice($parts, greatest($n - 1, 1), $n), '.')"
    val last3 = s"array_to_string(list_slice($parts, greatest($n - 2, 1), $n), '.')"
    s"""CASE WHEN $n >= 3 AND $last2 IN ($suf) THEN $last3
       |     WHEN $n >= 2 THEN $last2
       |     ELSE $e END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }

  /** Registered domain (eTLD+1) against a LOADED public-suffix list —
    * the full publicsuffix.org algorithm over a rules table, covering
    * what [[registeredDomain]]'s built-in two-level subset cannot:
    * wildcard rules (`*.ck` — the `*` consumes exactly one host label)
    * and exception rules (`!www.ck` — an exception beats every other
    * match and its suffix drops the leading label). No matching rule
    * falls back to the implicit `*` rule (the bare TLD); a host that IS
    * a public suffix has no registered domain (null).
    *
    * Input: `hosts (host)`, `psl (rule)` — one PSL rule per row, comment
    * and blank lines pre-stripped. Output: `(host, rd)`.
    *
    * Shape at scale: each host explodes into its ≤ |labels| candidate
    * suffixes, equi-joined against the BROADCAST rules table (the real
    * PSL is ~10k rows), prevailing rule picked by one map-side-combining
    * `max(struct(exception, ps_labels))` — hosts are a dimension table,
    * so the whole derivation is corpus-size-invariant.
    */
  def registeredDomainFrom(hosts: DataFrame, psl: DataFrame): DataFrame = {
    val r = psl.select(
      when(col("rule").startsWith("!"), lit("exc"))
        .when(col("rule").startsWith("*."), lit("wild"))
        .otherwise(lit("plain"))
        .as("kind"),
      when(col("rule").startsWith("!"), expr("substring(rule, 2)"))
        .when(col("rule").startsWith("*."), expr("substring(rule, 3)"))
        .otherwise(col("rule"))
        .as("key")
    )
    val hl = hosts
      .select(col("host"), split(col("host"), "\\.").as("labs"))
      .withColumn("n", size(col("labs")))
    val cand = hl
      .select(col("host"), col("n"), col("labs"), explode(sequence(lit(1), col("n"))).as("j"))
      .withColumn("suffix", concat_ws(".", slice(col("labs"), col("n") - col("j") + 1, col("j"))))
    val matched = cand
      .join(broadcast(r), col("suffix") === col("key"))
      // a wildcard rule needs one host label for the * to consume
      .where(col("kind") =!= "wild" || col("n") >= col("j") + 1)
      .select(
        col("host"),
        (col("kind") === "exc").as("e"),
        when(col("kind") === "wild", col("j") + 1)
          .when(col("kind") === "exc", col("j") - 1)
          .otherwise(col("j"))
          .as("ps")
      )
    val prevail = matched.groupBy(col("host")).agg(max(struct(col("e"), col("ps"))).as("w"))
    hl.join(prevail, Seq("host"), "left")
      .withColumn("ps", coalesce(col("w.ps"), lit(1)))
      .select(
        col("host"),
        when(col("n") <= col("ps"), lit(null).cast("string"))
          .otherwise(concat_ws(".", slice(col("labs"), col("n") - col("ps"), col("ps") + 1)))
          .as("rd")
      )
  }

  // ------------------------------------------------------- fixture corpus

  /** Deterministic dirty URL per document (the [[Html.dirtyHtml]]
    * recipe): mixed-case scheme/host, www variants, default and
    * non-default ports, five public suffixes (one two-level), tracking
    * and unsorted query params, fragments — every normalization rule
    * exercised, and distinct docs collide onto shared canonical URLs (the
    * dedup fixture). Pure column arithmetic over (doc_id, source), so
    * the oracle replays construction directly from the table.
    */
  def dirtyUrl(docId: Column, source: Column): Column = {
    val m = (k: Int) => pmod(docId, lit(k.toLong))
    val scheme = when(m(3) === 0, "HTTPS").when(m(3) === 1, "http").otherwise("Https")
    val www = when(m(4) === 0, "WWW.").when(m(4) === 2, "www.").otherwise("")
    val hostbase = when(m(2) === 0, upper(source)).otherwise(source)
    val suffix = when(m(5) === 0, ".com")
      .when(m(5) === 1, ".org")
      .when(m(5) === 2, ".net")
      .when(m(5) === 3, ".co.uk")
      .otherwise(".io")
    val port = when(m(6) === 0, ":443")
      .when(m(6) === 1, ":80")
      .when(m(6) === 2, ":8080")
      .otherwise("")
    val path = concat(lit("/p/"), m(7).cast("string"))
    val qk = m(7).cast("string")
    val query = when(m(4) === 0, concat(lit("?utm_source=feed&id="), qk))
      .when(m(4) === 1, concat(lit("?id="), qk, lit("&utm_campaign=x&ref=tw")))
      .when(m(4) === 2, lit("?b=2&a=1&gclid=abc123"))
      .otherwise(lit(""))
    val fragment = when(m(2) === 1, concat(lit("#s"), m(3).cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), www, hostbase, suffix, port, path, query, fragment)
  }

  /** DuckDB mirror of [[dirtyUrl]] over `doc_id` / `source` columns. */
  def dirtyUrlSql(id: String = "doc_id", source: String = "source"): String = {
    val m = (k: Int) => s"($id % $k)"
    s"""(CASE ${m(3)} WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http' ELSE 'Https' END
       | || '://'
       | || CASE ${m(4)} WHEN 0 THEN 'WWW.' WHEN 2 THEN 'www.' ELSE '' END
       | || CASE WHEN ${m(2)} = 0 THEN upper($source) ELSE $source END
       | || CASE ${m(5)} WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net'
       |         WHEN 3 THEN '.co.uk' ELSE '.io' END
       | || CASE ${m(6)} WHEN 0 THEN ':443' WHEN 1 THEN ':80' WHEN 2 THEN ':8080' ELSE '' END
       | || '/p/' || CAST(${m(7)} AS VARCHAR)
       | || CASE ${m(4)}
       |      WHEN 0 THEN '?utm_source=feed&id=' || CAST(${m(7)} AS VARCHAR)
       |      WHEN 1 THEN '?id=' || CAST(${m(7)} AS VARCHAR) || '&utm_campaign=x&ref=tw'
       |      WHEN 2 THEN '?b=2&a=1&gclid=abc123'
       |      ELSE '' END
       | || CASE WHEN ${m(2)} = 1 THEN '#s' || CAST(${m(3)} AS VARCHAR) ELSE '' END)""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }
}
