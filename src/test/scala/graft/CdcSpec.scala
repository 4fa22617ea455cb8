package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Content-defined chunking guarantees behind `t_cdc_chunks`: full
  * coverage (chunks tile the document exactly), SHIFT-ROBUSTNESS (an
  * insertion redraws only its neighborhood — the property fixed-stride
  * chunking lacks, and the reason this operator exists), and the kernel's
  * equivalence to the composed built-in formulation.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(('a' + rnd.nextInt(26)).toChar)
      if (rnd.nextInt(6) == 0) sb.append(' ')
    }
    sb.take(n).toString
  }

  private def chunks(rows: Seq[(Long, String)]) =
    TextAnalysis.cdcChunks(rows.toDF("doc_id", "text"))

  test("chunks tile each document exactly: contiguous, full-cover, correct hashes") {
    val docs = Seq(1L -> mkText(1, 2000), 2L -> "", 3L -> "tiny", 4L -> mkText(4, 300))
    val got = chunks(docs)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .groupBy(_.getLong(0))
    for ((id, text) <- docs) {
      val rows = got(id)
      assert(rows.head.getLong(2) === 1L, s"doc $id first chunk_start")
      assert(rows.map(_.getLong(3)).sum === text.length.toLong, s"doc $id total length")
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) === a.getLong(2) + a.getLong(3), s"doc $id contiguity")
        case _ => ()
      }
      rows.foreach { r =>
        val piece = text.substring(r.getLong(2).toInt - 1, r.getLong(2).toInt - 1 + r.getLong(3).toInt)
        val expect = java.security.MessageDigest
          .getInstance("MD5")
          .digest(piece.getBytes("UTF-8"))
          .map("%02x".format(_))
          .mkString
        assert(r.getString(4) === expect, s"doc $id chunk ${r.getLong(1)} hash")
      }
    }
  }

  test("shift-robust: a 7-char insertion at the front preserves almost all chunk hashes") {
    val base = mkText(42, 4000)
    val edited = "INSERT " + base
    val Seq(hBase, hEdit) =
      Seq(10L -> base, 20L -> edited).map { case (id, t) =>
        chunks(Seq(id -> t)).select("chunk_md5").as[String].collect().toSeq
      }
    val shared = hBase.intersect(hEdit).size
    // only chunks up to the first surviving boundary after the edit may
    // change: expect >= 90% of the base chunks to keep their identity
    assert(
      shared >= (hBase.size * 9) / 10,
      s"only $shared/${hBase.size} chunks survived a front insertion"
    )
    // contrast: fixed-stride chunking loses (nearly) everything
    val fixedBase = TextAnalysis
      .chunkDocs(Seq(10L -> base).toDF("doc_id", "text"), 32, 32)
      .select(md5(col("chunk_text"))).as[String].collect().toSeq
    val fixedEdit = TextAnalysis
      .chunkDocs(Seq(20L -> edited).toDF("doc_id", "text"), 32, 32)
      .select(md5(col("chunk_text"))).as[String].collect().toSeq
    assert(
      fixedBase.intersect(fixedEdit).size < fixedBase.size / 10,
      "fixed-stride should NOT be shift-robust (else the CDC operator is pointless)"
    )
  }

  test("native kernel matches the composed built-in formulation boundary-for-boundary") {
    val (w, dm) = (TextAnalysis.CdcWindow, TextAnalysis.CdcModulo)
    val df = Seq(1L -> mkText(7, 1500), 2L -> mkText(8, 40), 3L -> "").toDF("doc_id", "text")
    val composed = df.select(
      col("doc_id"),
      array_sort(
        array_distinct(
          concat(
            filter(
              when(length(col("text")) >= w, sequence(lit(w), length(col("text"))))
                .otherwise(array().cast("array<int>")),
              i =>
                pmod(
                  graft.util.Cols.md5Long(
                    call_function("substring", col("text"), i - (w - 1), lit(w))
                  ),
                  lit(dm.toLong)
                ) === 0
            ),
            array(length(col("text")))
          )
        )
      ).as("ends")
    )
    val native = df.select(
      col("doc_id"),
      graft.util.Cols
        .nativeCol(graft.functions.CdcEnds(graft.util.Cols.nativeExpr(col("text")), w, dm))
        .as("ends")
    )
    val c = composed.orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    val n = native.orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(n === c, "native CdcEnds must equal the composed formulation")
  }
}
