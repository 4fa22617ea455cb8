package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.Text

/** Unicode normalization expressions: NFC composition and accent folding
  * (NFD → drop Mn → NFC). Values are pinned against java.text.Normalizer
  * computed independently here; cross-engine agreement with DuckDB's
  * nfc_normalize/strip_accents is the t_normalize oracle's job.
  */
class UnicodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val decomposed =
    "cafe\u0301 de\u0301ja\u0300 vu Sa\u0303o Paulo"
  private val precomposed = "caf\u00e9 d\u00e9j\u00e0 vu S\u00e3o Paulo"

  test("nfc_normalize maps decomposed input to the precomposed bytes") {
    GraftFunctions.register(spark)
    val got = Seq(decomposed, precomposed, "plain ascii")
      .toDF("t")
      .select(expr("nfc_normalize(t)").as("n"))
      .as[String]
      .collect()
      .toSeq
    assert(got(0) === precomposed)
    assert(got(1) === precomposed)
    assert(got(2) === "plain ascii")
  }

  test("strip_accents drops combining marks but keeps mark-free letters") {
    GraftFunctions.register(spark)
    val rows = Seq(
      precomposed -> "cafe deja vu Sao Paulo",
      decomposed -> "cafe deja vu Sao Paulo",
      "Straße Ærø œuvre" -> "Straße Ærø œuvre",
      "Việt Nam" -> "Viet Nam"
    )
    val got = rows
      .map(_._1)
      .toDF("t")
      .select(expr("strip_accents(t)").as("n"))
      .as[String]
      .collect()
      .toSeq
    assert(got === rows.map(_._2))
  }

  test("whole fixture matches an independent Normalizer recomputation") {
    GraftFunctions.register(spark)
    def refStrip(s: String): String = {
      val d = Normalizer.normalize(s, Normalizer.Form.NFD)
      val kept = d.filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
      Normalizer.normalize(kept, Normalizer.Form.NFC)
    }
    val texts = Text.NormalizeFixture.map(_._2)
    val got = texts
      .toDF("t")
      .select(
        expr("nfc_normalize(t)").as("n"),
        expr("strip_accents(t)").as("f")
      )
      .as[(String, String)]
      .collect()
      .toSeq
    assert(got.map(_._1) === texts.map(Normalizer.normalize(_, Normalizer.Form.NFC)))
    assert(got.map(_._2) === texts.map(refStrip))
  }

  test("null flows through both expressions") {
    GraftFunctions.register(spark)
    val got = Seq[(java.lang.Long, String)]((1L, null))
      .toDF("id", "t")
      .select(expr("nfc_normalize(t)"), expr("strip_accents(t)"))
      .collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("generated path agrees with Normalizer over a large batch") {
    GraftFunctions.register(spark)
    val got = spark
      .range(2000)
      .select(
        expr("strip_accents(nfc_normalize(concat('caf\u00e9 ', CAST(id AS STRING))))")
          .as("n")
      )
      .as[String]
      .collect()
    assert(got.forall(_.startsWith("cafe ")))
    assert(got.length === 2000)
  }
}
