package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def verdicts(
      robots: Seq[(String, String)],
      urls: Seq[(Long, String, String)],
      agent: String = Robots.Agent
  ): Map[Long, (Boolean, Option[String])] = {
    Robots
      .gate(urls.toDF("doc_id", "domain", "url_norm"), robots.toDF("domain", "txt"), agent)
      .as[(Long, String, Boolean, Option[String])]
      .collect()
      .map(r => r._1 -> (r._3, r._4))
      .toMap
  }

  test("parse: rules scope to the nearest preceding group; pre-group and comment lines drop") {
    val txt =
      """# a comment
        |Disallow: /orphan
        |User-agent: *
        |Disallow: /a
        |Allow: /a/b
        |User-agent: graftbot
        |Disallow: /c
        |Disallow:
        |""".stripMargin
    val rules = Robots
      .parseRules(Seq(("d.com", txt)).toDF("domain", "txt"))
      .as[(String, String, Boolean, String)]
      .collect()
      .toSet
    assert(
      rules === Set(
        ("d.com", "*", false, "/a"),
        ("d.com", "*", true, "/a/b"),
        ("d.com", "graftbot", false, "/c")
      ),
      "orphan rule, comment, and empty-pattern Disallow must all drop"
    )
  }

  test("gate: longest match wins and Allow breaks length ties (RFC 9309 §2.2.2)") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/ok\nDisallow: /q/x\nAllow: /q/y"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/p/no"), // only /p matches -> blocked
        (2L, "d.com", "http://d.com/p/ok/deeper"), // /p and /p/ok match; longer Allow wins
        (3L, "d.com", "http://d.com/elsewhere") // nothing matches -> allowed
      )
    )
    assert(r(1L) === ((false, Some("/p"))))
    assert(r(2L) === ((true, Some("/p/ok"))))
    assert(r(3L) === ((true, None)))
  }

  test("gate: agent-specific group excludes * rules; absent group falls back to *") {
    val withBot = "User-agent: *\nDisallow: /\nUser-agent: graftbot\nDisallow: /only"
    val starOnly = "User-agent: *\nDisallow: /star"
    val r = verdicts(
      Seq(("bot.com", withBot), ("star.com", starOnly)),
      Seq(
        (1L, "bot.com", "http://bot.com/anything"), // * blocks all, but graftbot group governs
        (2L, "bot.com", "http://bot.com/only/x"), // graftbot's own rule
        (3L, "star.com", "http://star.com/star/y"), // no graftbot group -> * applies
        (4L, "star.com", "http://star.com/fine")
      )
    )
    assert(r(1L) === ((true, None)), "* rules must not leak into the specific group")
    assert(r(2L) === ((false, Some("/only"))))
    assert(r(3L) === ((false, Some("/star"))))
    assert(r(4L) === ((true, None)))
    // RFC 9309: a group exists by its HEADER — an empty specific group
    // still governs, so the * Disallow-all must not apply
    val empty = verdicts(
      Seq(("e.com", "User-agent: *\nDisallow: /\nUser-agent: graftbot")),
      Seq((9L, "e.com", "http://e.com/anything"))
    )
    assert(empty(9L) === ((true, None)), "an empty specific group must still shield its agent")
  }

  test("gate: $ anchors to the exact target — prefixes of it stay allowed") {
    val txt = "User-agent: *\nDisallow: /exact$"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/exact"),
        (2L, "d.com", "http://d.com/exact/sub"),
        (3L, "d.com", "http://d.com/exact?q=1")
      )
    )
    assert(r(1L) === ((false, Some("/exact$"))))
    assert(r(2L) === ((true, None)))
    assert(r(3L) === ((true, None)))
  }

  test("gate: patterns match path+query (a query-form Allow overrides its path Disallow)") {
    val txt = "User-agent: *\nDisallow: /p/3\nAllow: /p/3?id=3"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/p/3"),
        (2L, "d.com", "http://d.com/p/3?id=3")
      )
    )
    assert(r(1L) === ((false, Some("/p/3"))))
    assert(r(2L) === ((true, Some("/p/3?id=3"))))
  }

  test("gate: RFC 9309 §2.2.3 mid-pattern * wildcards — /*.php$ and /private*/ verdicts") {
    val txt = "User-agent: *\nDisallow: /*.php$\nDisallow: /private*/"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/index.php"), // *.php$ bites
        (2L, "d.com", "http://d.com/a/b/page.php"), // mid-path too
        (3L, "d.com", "http://d.com/index.php?x=1"), // $ anchors: query escapes
        (4L, "d.com", "http://d.com/index.phpx"), // $ anchors: suffix escapes
        (5L, "d.com", "http://d.com/private-zone/doc"), // /private*/ bites
        (6L, "d.com", "http://d.com/private"), // no trailing slash -> free
        (7L, "d.com", "http://d.com/privateX/"), // wildcard spans, trailing / matches
        (8L, "d.com", "http://d.com/public/x.html") // untouched
      )
    )
    assert(r(1L) === ((false, Some("/*.php$"))))
    assert(r(2L) === ((false, Some("/*.php$"))))
    assert(r(3L) === ((true, None)))
    assert(r(4L) === ((true, None)))
    assert(r(5L) === ((false, Some("/private*/"))))
    assert(r(6L) === ((true, None)))
    assert(r(7L) === ((false, Some("/private*/"))))
    assert(r(8L) === ((true, None)))
  }

  test("gate: wildcard-length precedence — the longest PATTERN wins, octets counted raw") {
    // /p/*?id=1 (9 octets incl * and =1) vs Allow /p/7 (4): wildcard wins
    val txt = "User-agent: *\nAllow: /p/7\nDisallow: /p/*?id=1"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/p/7?id=1"), // both match; longer wildcard blocks
        (2L, "d.com", "http://d.com/p/7") // only the Allow matches
      )
    )
    assert(r(1L) === ((false, Some("/p/*?id=1"))))
    assert(r(2L) === ((true, Some("/p/7"))))
  }

  test("parse: stacked User-agent headers co-own the block; same-agent groups merge") {
    val txt =
      """User-agent: alpha
        |User-agent: graftbot
        |Disallow: /shared
        |User-agent: graftbot
        |Disallow: /merged
        |""".stripMargin
    val rules = Robots
      .parseRules(Seq(("d.com", txt)).toDF("domain", "txt"))
      .as[(String, String, Boolean, String)]
      .collect()
      .toSet
    assert(
      rules === Set(
        ("d.com", "alpha", false, "/shared"),
        ("d.com", "graftbot", false, "/shared"),
        ("d.com", "graftbot", false, "/merged")
      ),
      "both stacked agents own the block; graftbot's two groups merge"
    )
  }

  test("gate: a stacked header DECLARES the specific group — * rules stop leaking") {
    // graftbot appears only as the second stacked header; its group must
    // still shield it from the * block
    val txt = "User-agent: *\nDisallow: /\nUser-agent: other\nUser-agent: graftbot\nDisallow: /only"
    val r = verdicts(
      Seq(("d.com", txt)),
      Seq(
        (1L, "d.com", "http://d.com/anywhere"), // * Disallow / must NOT apply
        (2L, "d.com", "http://d.com/only/x") // the stacked group's own rule does
      )
    )
    assert(r(1L) === ((true, None)))
    assert(r(2L) === ((false, Some("/only"))))
  }

  test("effectiveDelay: a delay in a stacked group governs every listed agent") {
    val txt = "User-agent: *\nCrawl-delay: 9\nUser-agent: x\nUser-agent: graftbot\nCrawl-delay: 4"
    val d = Robots
      .effectiveDelay(Seq(("d.com", txt)).toDF("domain", "txt"))
      .as[(String, Long)]
      .collect()
      .toMap
    assert(d("d.com") === 4L, "the stacked group's delay, not *'s")
  }

  test("effectiveDelay: group isolation, fall-back, and default (REP Crawl-delay)") {
    val robots = Seq(
      // * delay must NOT leak into a domain that declares a graftbot
      // group — even a delay-less one governs exclusively
      ("shield.com", "User-agent: *\nCrawl-delay: 9\nUser-agent: graftbot\nDisallow: /x"),
      ("own.com", "User-agent: graftbot\nCrawl-delay: 3\nUser-agent: *\nCrawl-delay: 8"),
      ("star.com", "User-agent: *\nCrawl-delay: 5"),
      ("bare.com", "User-agent: *\nDisallow: /q")
    ).toDF("domain", "txt")
    val got = Robots
      .effectiveDelay(robots, "graftbot", defaultS = 1L)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(got("shield.com") === 1L, "* delay leaked into the specific group")
    assert(got("own.com") === 3L)
    assert(got("star.com") === 5L, "no specific group -> * delay applies")
    assert(got("bare.com") === 1L, "no delay anywhere -> default")
  }

  test("redirect resolution: self-loop, long-chain truncation, relative Location") {
    // hand-built httpSlice-shaped rows: url, status, location
    def rows(t: (String, Int, String)*) =
      t.toSeq.toDF("target_uri", "http_status", "http_location")
    val archive = rows(
      ("http://a.com/self", 301, "http://a.com/self"), // self-loop: cycle at hop 0
      ("http://a.com/c1", 301, "/c2"), // relative Location
      ("http://a.com/c2", 301, "/c3"),
      ("http://a.com/c3", 301, "/c4"),
      ("http://a.com/c4", 301, "/end"), // 4 hops > maxHops=3 -> truncated
      ("http://a.com/end", 200, ""),
      ("http://a.com/one", 301, "/end") // 1 relative hop to a 200
    )
    val r = graft.operators.Redirects
      .resolve(archive, maxHops = 3)
      .as[(String, Option[String], Long, String)]
      .collect()
      .map(x => x._1 -> ((x._2, x._3, x._4)))
      .toMap
    assert(r("http://a.com/self") === ((None, 0L, "cycle")))
    assert(r("http://a.com/c1") === ((None, 3L, "truncated")))
    assert(r("http://a.com/one") === ((Some("http://a.com/end"), 1L, "ok")))
    assert(r("http://a.com/end") === ((Some("http://a.com/end"), 0L, "ok")))
  }

  test("redirect resolution: multiple captures of one URI — latest governs, no fan-out") {
    // a real archive holds several captures of the same URI; the hop
    // joins must not cross-multiply chains, and the LATEST capture's
    // verdict wins
    val archive = Seq(
      ("http://a.com/x", 301, "/old", "2026-01-01T00:00:00Z"),
      ("http://a.com/x", 200, "", "2026-02-01T00:00:00Z"), // later: now a 200
      ("http://a.com/y", 301, "/x", "2026-01-01T00:00:00Z"),
      ("http://a.com/y", 301, "/x", "2026-02-01T00:00:00Z") // duplicate edge
    ).toDF("target_uri", "http_status", "http_location", "warc_date")
    val out = graft.operators.Redirects.resolve(archive, maxHops = 3)
    assert(out.count() === 2, "one row per distinct origin, not per capture")
    val r = out
      .as[(String, Option[String], Long, String)]
      .collect()
      .map(x => x._1 -> ((x._2, x._3, x._4)))
      .toMap
    assert(r("http://a.com/x") === ((Some("http://a.com/x"), 0L, "ok")), "latest capture wins")
    assert(r("http://a.com/y") === ((Some("http://a.com/x"), 1L, "ok")))
  }

  test("gate plan: rules broadcast; verdict max(struct) partially aggregates map-side") {
    val robots = Seq(("d.com", "User-agent: *\nDisallow: /a")).toDF("domain", "txt")
    val urls = Seq((1L, "d.com", "http://d.com/a")).toDF("doc_id", "domain", "url_norm")
    val gated = Robots.gate(urls, robots)
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "rules side must broadcast")
    // struct max has no hash-agg form (SortAggregate), but it MUST still
    // combine map-side: one row per (doc, domain) crosses the exchange,
    // not one per matched rule
    assert(plan.contains("partial_max"), "verdict must partially aggregate before the exchange")
    // rule PARSING windows over robots lines — fine, KB-bounded files on
    // the broadcast side. The frontier side must not: no Window may
    // partition on the URL-side keys
    assert(!plan.contains("windowspecdefinition(doc_id"), "frontier side must not window")
  }
}
