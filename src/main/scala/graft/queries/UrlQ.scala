package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Urls

/** URL-pipeline queries: normalization, canonical-URL dedup, registered-
  * domain stats, and blocklist filtering over the deterministic dirty-URL
  * fixture ([[Urls.dirtyUrl]] — the [[graft.operators.Html.dirtyHtml]]
  * recipe). Every rule is replayed by the DuckDB oracle from the raw
  * documents table: construction AND normalization.
  */
object UrlQ {

  /** Shared oracle CTE: documents → (doc_id, lang, n_chars, url, url_norm). */
  private val urlCte =
    s"""WITH u AS (
       |  SELECT doc_id, lang, n_chars, ${Urls.dirtyUrlSql()} AS url FROM documents
       |), n AS (
       |  SELECT doc_id, lang, n_chars, url,
       |         ${Urls.normalizeUrlSql("url")} AS url_norm
       |  FROM u
       |)""".stripMargin

  private val domainSql = Urls.registeredDomainSql(Urls.hostOfSql("url_norm"))

  /** Domains a crawl operator blocks (suffix-covering: any subdomain of a
    * listed registered domain is gone too, because matching runs on the
    * eTLD+1). Fixture-non-vacuous: three (source, suffix) combinations.
    */
  val Blocklist: Seq[String] = Seq("src1.org", "src4.io", "src7.net")

  private def withUrls(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        Urls.dirtyUrl(col("doc_id"), col("source")).as("url")
      )
      .withColumn("url_norm", Urls.normalizeUrl(col("url")))

  val all: Seq[Q] = Seq(
    Q(
      "u_normalize",
      (s, d) => withUrls(s, d).select(col("doc_id"), col("url"), col("url_norm")).orderBy("doc_id"),
      Some(s"$urlCte SELECT doc_id, url, url_norm FROM n ORDER BY doc_id"),
      doc = "Syntax-based URL normalization (RFC 3986 case + default-port " +
        "+ empty-path rules, fragment drop, tracking-param strip, " +
        "canonical query-param sort) as pure codegen column expressions " +
        "— map-only, no shuffle. The oracle replays construction AND " +
        "every rule per document."
    ),
    Q(
      "u_url_dedup",
      (s, d) =>
        withUrls(s, d)
          .groupBy(col("url_norm"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
          .orderBy("url_norm"),
      Some(
        s"""$urlCte
           |SELECT url_norm, COUNT(*)::BIGINT AS n_docs, MIN(doc_id) AS keep_doc
           |FROM n GROUP BY url_norm ORDER BY url_norm""".stripMargin
      ),
      doc = "Canonical-URL exact dedup: distinct dirty forms (case, " +
        "default ports, tracking params, fragments, param order) " +
        "collapse onto one canonical URL; keep = min doc id per group. " +
        "One hash-keyed shuffle on the canonical string — the URL-level " +
        "gate every crawl pipeline runs before fetching or keeping a " +
        "page twice."
    ),
    Q(
      "u_domain_stats",
      (s, d) =>
        withUrls(s, d)
          .withColumn("domain", Urls.registeredDomain(Urls.hostOf(col("url_norm"))))
          .groupBy(col("domain"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"),
            countDistinct(col("lang")).as("n_langs")
          )
          .orderBy("domain"),
      Some(
        s"""$urlCte
           |SELECT $domainSql AS domain, COUNT(*)::BIGINT AS n_docs,
           |       SUM(n_chars)::BIGINT AS total_chars,
           |       COUNT(DISTINCT lang)::BIGINT AS n_langs
           |FROM n GROUP BY domain ORDER BY domain""".stripMargin
      ),
      doc = "Per-registered-domain (eTLD+1, two-level public suffixes " +
        "handled — www/subdomains fold in) doc counts, char mass, and " +
        "language spread: the corpus-composition report a crawl curator " +
        "reads before setting domain quotas."
    ),
    Q(
      "u_blocklist",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val block = Blocklist.toDF("domain")
        withUrls(s, d)
          .withColumn("domain", Urls.registeredDomain(Urls.hostOf(col("url_norm"))))
          .join(broadcast(block), Seq("domain"), "left_anti")
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("domain")
      },
      Some {
        val listed = Blocklist.map(b => s"'$b'").mkString(", ")
        s"""$urlCte, dom AS (
           |  SELECT $domainSql AS domain FROM n
           |)
           |SELECT domain, COUNT(*)::BIGINT AS n_docs FROM dom
           |WHERE domain NOT IN ($listed)
           |GROUP BY domain ORDER BY domain""".stripMargin
      },
      doc = "Domain blocklist gate: registered-domain match (so every " +
        "subdomain of a listed domain is covered) via broadcast " +
        "anti-join — the list side is operator-curated and tiny, the " +
        "corpus side never shuffles for the filter. Output: surviving " +
        "per-domain doc counts."
    )
  )
}
