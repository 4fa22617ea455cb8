package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Video

class VideoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("video payloads are GVID containers of real PNG frames; decode round-trips exactly") {
    val docs = Tables.documents(spark, sf).limit(20)
    val payloads = Video.withVideoPayload(spark, docs)
    val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    payloads.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.take(4), "US-ASCII") == "GVID")
      // First frame's PNG signature sits right after magic+count+len.
      assert(bytes.slice(12, 16).sameElements(pngSig), "frame payload is not a PNG stream")
    }
    val metas = Video.decodeVideoFrames(spark, payloads).collect()
    metas.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.length == Video.nFrames(id), s"doc $id: frame count")
    }
    metas.foreach { m =>
      val sid = Video.sceneOf(m.doc_id, m.frame_idx.toInt)
      val (w, h) = Video.sceneDims(sid)
      assert(m.width == w && m.height == h, s"doc ${m.doc_id} f ${m.frame_idx}: dims")
      val want = (for { y <- 0 until h; x <- 0 until w } yield {
        val (r, g, b) = Video.scenePixel(sid, x, y)
        (r + g + b).toLong
      }).sum
      assert(m.px_sum == want, s"doc ${m.doc_id} f ${m.frame_idx}: px_sum")
    }
  }

  test("shared scenes hash identically across docs; videoDups finds exactly the within-recording pairs") {
    val docs = Tables.documents(spark, sf).limit(150)
    val payloads = Video.withVideoPayload(spark, docs)
    val hashes = Video.videoFrameHashes(spark, payloads).cache()

    // Scene determinism: every (scene → dhash) mapping is functional, i.e.
    // two docs showing the same scene produce the same frame hash.
    val perScene = hashes
      .collect()
      .map { r =>
        val id = r.getLong(0)
        Video.sceneOf(id, r.getLong(1).toInt) -> r.getLong(2)
      }
      .groupBy(_._1)
    perScene.foreach { case (sid, vs) =>
      assert(vs.map(_._2).distinct.length == 1, s"scene $sid hashes diverge across docs")
    }

    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val pairs = Video
      .videoDups(hashes)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .toSet
    // Expected: every same-recording pair overlaps >= 50% by fixture
    // construction (starts 0..2, lengths 4..6); no cross-recording pair
    // shares any scene.
    val want = (for {
      a <- ids; b <- ids
      if a < b && Video.recOf(a) == Video.recOf(b)
    } yield (a, b)).toSet
    assert(pairs == want,
      s"pair set mismatch: missing=${(want -- pairs).take(5)} spurious=${(pairs -- want).take(5)}")
    hashes.unpersist()
  }

  test("near-dup variants of one recording are byte-different payloads") {
    val docs = Tables.documents(spark, sf).limit(60)
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val pair = (for {
      a <- ids; b <- ids
      if a < b && Video.recOf(a) == Video.recOf(b) &&
        (Video.startOf(a) != Video.startOf(b) || Video.nFrames(a) != Video.nFrames(b))
    } yield (a, b)).head
    val payloads = Video
      .withVideoPayload(spark, docs)
      .filter(col("doc_id").isin(pair._1, pair._2))
      .collect()
      .map(r => r.getAs[Array[Byte]]("payload"))
    assert(payloads.length == 2 && !payloads(0).sameElements(payloads(1)),
      "fixture degenerate: near-dup variants are byte-identical")
  }
}
