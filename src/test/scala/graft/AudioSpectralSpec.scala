package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Audio

/** Pins for the spectral (DFT) audio path: bin recovery, shift
  * invariance, the consecutive-pair straddle exclusion, and the
  * motivating contrast — the frame-energy fingerprint DIVERGES on the
  * same non-frame-aligned fixture the spectral fingerprint collapses.
  */
class AudioSpectralSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def toneFrames(docs: org.apache.spark.sql.DataFrame) =
    Audio.spectralPeaks(spark, Audio.withAudioPayloadTones(spark, docs)).toDF()

  test("DFT argmax recovers the tone bins exactly on every full in-tone window") {
    val docs = Tables.documents(spark, sf).limit(30)
    val frames = toneFrames(docs).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    }
    assert(frames.nonEmpty)
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val rec = Audio.toneRecOf(id)
      val lead = Audio.toneLead(id)
      val la = Audio.toneLenA(rec)
      val lb = Audio.toneLenB(rec)
      // full-frame count = floor(n/64)
      assert(fs.length == Audio.toneNSamples(id) / Audio.SpecFrameLen)
      fs.foreach { case (_, fi, bin, pq) =>
        val lo = fi.toInt * Audio.SpecFrameLen
        val hi = lo + Audio.SpecFrameLen
        val pureA = lo >= lead && hi <= lead + la
        val pureB = lo >= lead + la && hi <= lead + la + lb
        val pureQuiet = hi <= lead || lo >= lead + la + lb
        if (pureA)
          assert(bin == Audio.toneBinA(rec) && pq >= Audio.SpecPowerThreshold,
            s"doc $id frame $fi: bin $bin power $pq, want pure-A ${Audio.toneBinA(rec)}")
        if (pureB)
          assert(bin == Audio.toneBinB(rec) && pq >= Audio.SpecPowerThreshold,
            s"doc $id frame $fi: bin $bin power $pq, want pure-B ${Audio.toneBinB(rec)}")
        if (pureQuiet)
          assert(pq < Audio.SpecPowerThreshold,
            s"doc $id frame $fi: quiet frame power $pq above threshold")
      }
    }
  }

  test("spectral fingerprint is invariant under non-frame-aligned shifts; payloads differ") {
    val docs = Tables.documents(spark, sf).limit(200)
    val fps = Audio
      .spectralFingerprint(toneFrames(docs))
      .select(col("doc_id"), col("fingerprint"), col("peaks"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // every doc of one recording — different doc-keyed shifts — collides
    fps.groupBy { case (id, _, _) => Audio.toneRecOf(id) }.foreach {
      case (rec, rows) =>
        assert(rows.map(_._2).distinct.length == 1,
          s"rec $rec: shifted variants split into ${rows.map(_._2).distinct.length} fingerprints")
        assert(rows.head._3 == s"${Audio.toneBinA(rec)},${Audio.toneBinB(rec)}")
    }
    // and no two recordings collide (bin program injective over rec)
    val perRec = fps.groupBy { case (id, _, _) => Audio.toneRecOf(id) }
      .map { case (rec, rows) => rec -> rows.head._2 }
    assert(perRec.values.toSeq.distinct.length == perRec.size)
    // the collapsed variants are genuinely byte-different payloads
    val payloads = Audio
      .withAudioPayloadTones(spark, docs)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val byRec = payloads.groupBy { case (id, _) => Audio.toneRecOf(id) }
    val multi = byRec.filter(_._2.length >= 2)
    assert(multi.nonEmpty)
    multi.foreach { case (rec, rows) =>
      val lens = rows.map(_._2.length).distinct
      val md5s = rows.map { case (_, b) =>
        java.security.MessageDigest.getInstance("MD5").digest(b).toSeq
      }.distinct
      assert(lens.length > 1 || md5s.length > 1,
        s"rec $rec: variants are byte-identical — fixture lost its point")
    }
  }

  test("energy fingerprint DIVERGES on the shifted tone fixture (the gap the spectral path closes)") {
    // take recordings with ≥2 variants in a small window; the 50-sample
    // energy fingerprint sees different frame contents per shift
    val docs = Tables.documents(spark, sf).limit(200)
    val efps = Audio
      .audioFingerprint(
        Audio.frameEnergies(spark, Audio.withAudioPayloadTones(spark, docs)).toDF()
      )
      .select(col("doc_id"), col("fingerprint"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy { case (id, _) => Audio.toneRecOf(id) }
      .filter(_._2.length >= 2)
    assert(efps.nonEmpty)
    // at least one multi-variant recording must SPLIT under the energy
    // fingerprint (non-frame-aligned shifts change frame energies); if
    // every one collapsed, the spectral path would be redundant
    assert(
      efps.exists { case (_, rows) => rows.map(_._2).distinct.length > 1 },
      "energy fingerprint collapsed every shifted variant — contrast fixture broken"
    )
  }

  test("hz_milli maps peak bins to exact physical frequencies") {
    val docs = Tables.documents(spark, sf).limit(40)
    Audio
      .spectralFingerprint(toneFrames(docs))
      .select(col("doc_id"), col("hz_milli"))
      .collect()
      .foreach { r =>
        val id = r.getLong(0)
        val rec = Audio.toneRecOf(id)
        val rate = Audio.toneRate(rec).toLong
        val want = Seq(Audio.toneBinA(rec), Audio.toneBinB(rec))
          .map(b => b * rate * 1000L / Audio.SpecFrameLen)
          .mkString(",")
        assert(r.getString(1) == want, s"doc $id: hz ${r.getString(1)} != $want")
      }
  }
}
