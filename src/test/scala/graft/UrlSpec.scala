package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Urls

/** Hand-computed pins for the URL normalization family — each rule
  * asserted on a URL exercising exactly that rule, plus the hostile
  * shapes (no port, non-default port under the "wrong" scheme, empty
  * path, single-label host, body `?` inside the fragment).
  */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].collect().toSeq

  private def dom(hosts: String*): Seq[String] =
    hosts.toDF("h").select(Urls.registeredDomain(col("h"))).as[String].collect().toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTPS://WWW.Example.COM/A/B") === Seq("https://www.example.com/A/B"))
  }

  test("default ports strip only under their own scheme") {
    assert(
      norm(
        "https://ex.com:443/a", // default -> stripped
        "http://ex.com:80/a", // default -> stripped
        "https://ex.com:80/a", // NOT default under https -> kept
        "http://ex.com:443/a", // NOT default under http -> kept
        "https://ex.com:8080/a" // never default -> kept
      ) === Seq(
        "https://ex.com/a",
        "http://ex.com/a",
        "https://ex.com:80/a",
        "http://ex.com:443/a",
        "https://ex.com:8080/a"
      )
    )
  }

  test("empty path becomes /; fragment dropped") {
    assert(
      norm("https://ex.com", "https://ex.com#frag", "https://ex.com/a#x?notaquery") ===
        Seq("https://ex.com/", "https://ex.com/", "https://ex.com/a")
    )
  }

  test("tracking params dropped, remaining params sorted, empty query removed") {
    assert(
      norm(
        "https://ex.com/a?utm_source=x&b=2&a=1&gclid=g",
        "https://ex.com/a?utm_campaign=only",
        "https://ex.com/a?z=9&y=8#frag"
      ) === Seq(
        "https://ex.com/a?a=1&b=2",
        "https://ex.com/a",
        "https://ex.com/a?y=8&z=9"
      )
    )
  }

  test("userinfo preserved verbatim; host behind it still lowercased and matchable") {
    assert(
      norm(
        "HTTPS://user:PW@EX.com:443/a",
        "http://alice@Ex.Com/b?utm_source=x"
      ) === Seq(
        "https://user:PW@ex.com/a",
        "http://alice@ex.com/b"
      )
    )
    // domain extraction sees the real host, not the credentials
    val hosts = Seq("https://user:pw@sub.ex.com/a").toDF("u")
      .select(Urls.registeredDomain(Urls.hostOf(col("u")))).as[String].collect()
    assert(hosts === Array("ex.com"))
  }

  test("bracketed IPv6 literals: host kept whole, port rules still apply") {
    assert(
      norm(
        "https://[2001:DB8::1]:443/a",
        "http://[::1]:8080/x"
      ) === Seq(
        "https://[2001:db8::1]/a",
        "http://[::1]:8080/x"
      )
    )
  }

  test("resolveUrl: the RFC 3986 §5.4.1 normal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g"
    )
    val got = cases
      .map(_._1)
      .toDF("ref")
      .select(Urls.resolveUrl(lit(base), col("ref")).as("r"))
      .as[String]
      .collect()
      .toSeq
    assert(got === cases.map(_._2), cases.map(_._1).zip(got).toString)
  }

  test("resolveUrl: the RFC 3986 §5.4.2 abnormal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "http:g" -> "http:g" // strict parser: ref with a scheme passes through
    )
    val got = cases
      .map(_._1)
      .toDF("ref")
      .select(Urls.resolveUrl(lit(base), col("ref")).as("r"))
      .as[String]
      .collect()
      .toSeq
    assert(got === cases.map(_._2), cases.map(_._1).zip(got).toString)
  }

  test("registered domain: eTLD+1, two-level suffixes, pass-throughs") {
    assert(
      dom("www.a.b.co.uk", "sub.ex.com", "ex.com", "co.uk", "localhost") ===
        Seq("b.co.uk", "ex.com", "ex.com", "co.uk", "localhost")
    )
  }

  test("normalization is idempotent on the fixture corpus") {
    val urls = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(Urls.dirtyUrl(col("doc_id"), col("source")).as("u"))
      .select(Urls.normalizeUrl(col("u")).as("n1"))
      .select(col("n1"), Urls.normalizeUrl(col("n1")).as("n2"))
    assert(urls.filter(col("n1") =!= col("n2")).count() === 0L)
  }

  test("fixture collides distinct docs onto shared canonical URLs (dedup non-vacuous)") {
    val groups = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(Urls.normalizeUrl(Urls.dirtyUrl(col("doc_id"), col("source"))).as("u"))
      .groupBy("u")
      .count()
    assert(groups.filter(col("count") > 1).count() > 0)
  }

  test("pageRank: exact fixed-point values on a handcrafted graph, one round") {
    // A→B, A→C, B→C, C→A; outdeg A=2, B=1, C=1. After one round from
    // r0 = 1e9 each: in-mass A = 1e9 (from C), B = 5e8 (A's half),
    // C = 1.5e9 (A's half + B), so
    //   A = 15e7 + 85e7            = 1000000000
    //   B = 15e7 + (85*5e8)//100   =  575000000
    //   C = 15e7 + (85*15e8)//100  = 1425000000
    // Duplicate edges and self-loops must not change this.
    val edges = Seq(
      ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
      ("A", "B"), // duplicate: dropped
      ("B", "B") // self-loop: dropped
    ).toDF("src", "dst")
    val r = graft.operators.LinkGraph
      .pageRank(edges, iters = 1)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(r === Map("A" -> 1000000000L, "B" -> 575000000L, "C" -> 1425000000L))
  }

  test("pageRank: teleport-only floor for hosts with no in-links; total mass bounded") {
    // D only cites (no in-links): rank must settle at the teleport floor.
    val edges = Seq(("D", "A"), ("A", "B"), ("B", "A")).toDF("src", "dst")
    val r = graft.operators.LinkGraph
      .pageRank(edges, iters = 3)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(r("D") === 150000000L)
    // floor division only ever loses mass: total ≤ N * RankScale
    assert(r.values.sum <= 3L * graft.operators.LinkGraph.RankScale)
  }
}
