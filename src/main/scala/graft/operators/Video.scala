package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-modality plumbing: a video is an opaque `binary` column holding a
  * length-prefixed stream of REAL PNG frames.
  *
  * There is no video codec in the JVM, so the CONTAINER is the honest
  * minimal one — `GVID` magic, big-endian frame count, then per frame a
  * big-endian byte length and the frame's full PNG stream — while every
  * FRAME is a real `javax.imageio` PNG round-trip, exactly the image
  * family's contract ([[Multimodal]]). Container parsing, per-frame codec
  * decode, and per-frame perceptual hashing all run in `mapPartitions`
  * (one codec-registry init per partition; one bounded row out per frame);
  * everything downstream — scene-overlap scoring, near-dup thresholds — is
  * ordinary columnar Spark.
  *
  * Fixture contract (the oracle's side): doc `id` shows scenes
  * `start(id) + f` (f = 0..nFrames(id)−1) of RECORDING `id % DupMod`;
  * a scene is the deterministic [[Multimodal]] image of the composite id
  * `sceneId = rec·64 + sceneIdx`. Docs of one recording are byte-different
  * videos (different start offset / frame count) whose shared scenes are
  * pixel-identical — the re-cut/trimmed-intro duplicate class a byte hash
  * can't see. Everything is closed-form, so the DuckDB oracle replays
  * frame metadata, every dHash, and the overlap verdicts bit-exactly.
  *
  * Reference scope note: the reference engine
  * (`/root/reference/src/index.js`) has no media path; this family is
  * extension surface for the training-data pipeline (video corpora:
  * scene-level dedup before training), composed from the engine's own
  * dedup machinery.
  */
object Video {

  /** Distinct recordings in the fixture: rec = doc_id % DupMod. */
  val DupMod = 50L

  def recOf(id: Long): Long = ((id % DupMod) + DupMod) % DupMod

  /** First scene shown (temporal shift — the trimmed-intro variant). */
  def startOf(id: Long): Int = (id % 3).toInt

  /** Frames in the doc's video: 4..6. */
  def nFrames(id: Long): Int = (4 + (id / 3) % 3).toInt

  /** Composite scene id of frame f of doc id. Scene indexes stay < 64, so
    * scene ids never collide across recs.
    */
  def sceneOf(id: Long, f: Int): Long = recOf(id) * 64L + startOf(id) + f

  /** Scene raster dimensions — always larger than the dHash sample grid
    * (11×6), so adjacent grid columns never collapse onto one pixel.
    */
  def sceneDims(sid: Long): (Int, Int) = ((16 + sid % 13).toInt, (12 + sid % 7).toInt)

  /** Closed-form scene pixels. Unlike the image fixture's linear channels
    * (whose horizontal gradient signs barely depend on the id — fine for a
    * per-image hash check, catastrophic for an inverted index over scene
    * hashes: with near-constant gradients most scenes collide and the
    * hash-equijoin degenerates toward all-pairs), these mix per-scene
    * coefficients with quadratic terms so distinct scenes get distinct
    * gradient patterns. The dedup predicate is only as selective as the
    * fingerprint is discriminative — that's a scale property, not a
    * cosmetic one.
    */
  def scenePixel(sid: Long, x: Int, y: Int): (Int, Int, Int) = {
    val ax = 1 + sid % 7
    val ay = 1 + sid % 5
    (
      ((ax * x * x + ay * y + sid) % 256).toInt,
      ((ay * x + ax * y * y + 2 * sid) % 256).toInt,
      ((ax * x * y + sid) % 256).toInt
    )
  }

  private def sceneImage(sid: Long): java.awt.image.BufferedImage = {
    val (w, h) = sceneDims(sid)
    val img =
      new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = scenePixel(sid, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID")
    out.writeInt(frames.length)
    frames.foreach { png => out.writeInt(png.length); out.write(png) }
    out.flush()
    bos.toByteArray
  }

  private def encodeVideo(id: Long): Array[Byte] =
    encodeGvid((0 until nFrames(id)).map(f =>
      Multimodal.encodePng(sceneImage(sceneOf(id, f)))))

  /** Parse a video container by MAGIC introspection — the video analogue
    * of ImageIO's reader introspection: `GVID` streams and RIFF `AVI `
    * Motion-JPEG files flow through the SAME decode path, so everything
    * downstream (frame decode, perceptual hashing, scene dedup) is
    * container-agnostic by construction. Returns each frame's encoded
    * image byte slice (PNG for GVID, JPEG for MJPEG AVI); the per-frame
    * codec is then ImageIO's introspection problem.
    */
  private[graft] def framesOf(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val magic = new String(bytes.take(4), "US-ASCII")
    magic match {
      case "GVID" => framesOfGvid(bytes)
      case "RIFF" => framesOfAvi(bytes)
      case m      => throw new IllegalArgumentException(s"unknown video container: $m")
    }
  }

  private def framesOfGvid(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID stream")
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val png = new Array[Byte](len)
      in.readFully(png)
      png
    }
  }

  // ---- Motion-JPEG AVI: the second REAL video container ------------------
  //
  // RIFF('AVI ' LIST('hdrl' avih, LIST('strl' strh('vids'/'MJPG'),
  // strf(BITMAPINFOHEADER))) LIST('movi' '00dc' chunks) 'idx1') with
  // little-endian sizes and even-byte chunk padding — the standard
  // uncompressed-index MJPEG layout (Microsoft AVI RIFF spec). Every
  // frame chunk is a complete JPEG stream.

  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Write a minimal-but-valid Motion-JPEG AVI from complete JPEG frame
    * streams (all frames `w`×`h`, 10 fps).
    */
  private[graft] def encodeAviMjpeg(
      jpegs: Seq[Array[Byte]],
      w: Int,
      h: Int
  ): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      fourcc(out, id); le32(out, body.length); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF even padding
      out.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      fourcc(out, "LIST"); le32(out, body.length + 4); fourcc(out, kind)
      out.write(body)
      out.toByteArray
    }
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      le32(b, 100000) // microseconds per frame (10 fps)
      le32(b, 0); le32(b, 0); le32(b, 0x10) // maxBytesPerSec, pad, AVIF_HASINDEX
      le32(b, jpegs.length); le32(b, 0); le32(b, 1) // totalFrames, initial, streams
      le32(b, jpegs.map(_.length).max); le32(b, w); le32(b, h)
      le32(b, 0); le32(b, 0); le32(b, 0); le32(b, 0) // reserved
      chunk("avih", b.toByteArray)
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      fourcc(b, "vids"); fourcc(b, "MJPG")
      le32(b, 0); le16(b, 0); le16(b, 0); le32(b, 0) // flags, prio, lang, initial
      le32(b, 1); le32(b, 10) // scale, rate -> 10 fps
      le32(b, 0); le32(b, jpegs.length) // start, length
      le32(b, jpegs.map(_.length).max); le32(b, -1); le32(b, 0) // bufSize, quality, sampleSize
      le16(b, 0); le16(b, 0); le16(b, w); le16(b, h) // rcFrame
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream()
      le32(b, 40); le32(b, w); le32(b, h) // biSize, biWidth, biHeight
      le16(b, 1); le16(b, 24) // planes, bitcount
      fourcc(b, "MJPG") // biCompression
      le32(b, w * h * 3); le32(b, 0); le32(b, 0); le32(b, 0); le32(b, 0)
      chunk("strf", b.toByteArray)
    }
    val strl = list("strl", strh ++ strf)
    val hdrl = list("hdrl", avih ++ strl)
    val frameChunks = jpegs.map(j => chunk("00dc", j))
    val movi = list("movi", frameChunks.flatten.toArray)
    val idx1 = {
      val b = new java.io.ByteArrayOutputStream()
      var off = 4 // offsets are relative to the start of 'movi' list data
      jpegs.foreach { j =>
        fourcc(b, "00dc"); le32(b, 0x10) // AVIIF_KEYFRAME
        le32(b, off); le32(b, j.length)
        off += 8 + j.length + (j.length % 2)
      }
      chunk("idx1", b.toByteArray)
    }
    val body = hdrl ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream()
    fourcc(out, "RIFF"); le32(out, body.length + 4); fourcc(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  /** Parse an MJPEG AVI: walk the RIFF chunk tree to the `movi` list and
    * return every video-frame chunk's (`..dc`/`..db`) JPEG payload in
    * stream order. Tolerates optional lists (`INFO`, `JUNK`) and odd-length
    * padding; does not require `idx1`.
    */
  private def framesOfAvi(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def cc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(cc(0) == "RIFF" && cc(8) == "AVI ", "not a RIFF AVI stream")
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = cc(off)
        val sz = u32(off + 4)
        // a corrupt (negative / past-the-end) size must fail loudly, not
        // loop forever or copy garbage; compare in Long — a hostile size
        // near Int.MaxValue would overflow the Int sum right past the
        // bound check
        require(
          sz >= 0 && off.toLong + 8L + sz <= end,
          s"corrupt AVI chunk '$id' at $off (size $sz)"
        )
        if (id == "LIST") {
          val kind = cc(off + 8)
          if (kind == "movi" || kind == "hdrl" || kind == "strl")
            walk(off + 12, off + 8 + sz)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
        }
        off += 8 + sz + (sz % 2) // even-byte chunk alignment
      }
    }
    walk(12, math.min(bytes.length, 12 + u32(4) - 4))
    frames.result()
  }

  /** documents → (doc_id, payload: binary): the ingest step — a real
    * container of real PNG frames, generated in mapPartitions where a
    * fetch-and-transcode stage would run.
    */
  def withVideoPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => (id, encodeVideo(id)))
      }
      .toDF("doc_id", "payload")
  }

  /** Distinct video contents in the mixed-CONTAINER fixture: content(id) =
    * id % ContainerContents, so every content is uploaded both as a
    * GVID-of-PNG stream (even doc ids) and as a Motion-JPEG AVI (odd doc
    * ids) — the container/codec re-upload class scene dedup must be blind
    * to.
    */
  val ContainerContents = 25L

  /** Frames per content in the mixed-container fixture: 4..6. */
  def containerFrames(content: Long): Int = (4 + content % 3).toInt

  /** Scene images for the mixed-container fixture are the JPEG-STABLE
    * block images of the image codec matrix ([[Multimodal.toBlockImage]]:
    * ±12 gray margins vs ±3 JPEG-0.9 noise, so the per-frame dHash is
    * bit-identical across PNG and JPEG encodes — the proof the image
    * family's m_codec_dups already carries). Scene content ids live at
    * 1000+ so they never collide with the image fixture's 0..24.
    */
  private def containerSceneImage(content: Long, f: Int): java.awt.image.BufferedImage =
    Multimodal.toBlockImage(1000L + content * 8L + f)

  /** documents → (doc_id, payload) over the mixed-container corpus: even
    * doc ids upload their content as GVID(PNG frames), odd ids as a REAL
    * Motion-JPEG AVI (RIFF/avih/strl/movi/idx1, JPEG quality 0.9) of the
    * SAME scene images. The decode side is container-agnostic by magic
    * introspection ([[framesOf]]) + ImageIO codec introspection — which
    * is what this fixture proves.
    */
  def withVideoPayloadMixedContainer(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val content = ((id % ContainerContents) + ContainerContents) % ContainerContents
          val imgs = (0 until containerFrames(content)).map(containerSceneImage(content, _))
          val bytes =
            if (id % 2 == 0) encodeGvid(imgs.map(Multimodal.encodePng))
            else
              encodeAviMjpeg(
                imgs.map(Multimodal.encodeJpeg(_, 0.9f)),
                imgs.head.getWidth,
                imgs.head.getHeight
              )
          (id, bytes)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-frame decode result. */
  case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long, height: Long, px_sum: Long)

  /** REAL DECODE: parse the container, run the PNG codec on every frame,
    * emit (frame_idx, dimensions, pixel sum) per frame.
    */
  def decodeVideoFrames(spark: SparkSession, payloads: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          framesOf(bytes).iterator.zipWithIndex.map { case (png, f) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                x += 1
              }
              y += 1
            }
            VideoFrame(id, f.toLong, img.getWidth.toLong, img.getHeight.toLong, sum)
          }
        }
      }
  }

  /** Per-frame perceptual hash: the [[Multimodal.dhashOf]] grid over each
    * decoded frame — (doc_id, frame_idx, dhash), the video's scene
    * signature rows.
    */
  def videoFrameHashes(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          framesOf(bytes).iterator.zipWithIndex.map { case (png, f) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
            (id, f.toLong, Multimodal.dhashOf(img))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "dhash")
  }

  /** Floor under the document-frequency ceiling so tiny corpora (unit
    * fixtures, early ingest) never declare every scene hot.
    */
  val MinDfCeiling = 32L

  /** Video near-dup pairs by SCENE OVERLAP: two videos are near-dups when
    * the overlap coefficient of their frame-hash SETS clears the permille
    * threshold — temporal-shift-invariant (a re-cut sharing most scenes
    * matches even though no byte, frame index, or frame count agrees).
    *
    * Distributed shape: candidate pairs come from an equijoin on the frame
    * hash itself (an inverted index over scenes — only videos sharing at
    * least one scene ever meet; no all-pairs stage). HOT scene hashes —
    * those whose document frequency exceeds
    * `max(MinDfCeiling, n_videos * maxDfPermille / 1000)` — are excluded
    * from CANDIDATE GENERATION only (the stop-word / prefix-filter analog:
    * a black frame or intro card present in half the corpus would make that
    * one key's candidate set quadratic in the corpus). Discovered pairs are
    * then recounted against the FULL signatures, hot hashes included, so
    * every emitted row is exact. Recall bound: a pair can only be missed
    * when its ENTIRE intersection is hot hashes — at threshold p permille
    * and min signature size n that means ≥ ceil(p·n/1000) shared frames
    * each so common they are non-discriminative; for real thresholds such
    * pairs are boilerplate-only matches, not re-cuts.
    *
    * No broadcast hints: `sizes` is one row per VIDEO and the per-hash df
    * frame one row per distinct scene — both corpus-cardinality, so hinting
    * them broadcast is an OOM at crawl scale. AQE picks broadcast on its
    * own when a side is actually small. All outputs integral: matches, set
    * sizes, permille overlap.
    *
    * SCALE DEFAULT: this pair form is OUTPUT-BOUND — on a corpus with c
    * copies per recording the true pair set grows ~c² per recording, and
    * the emitted rows are the runtime floor no implementation can beat.
    * Discovery itself is duplication-collapsed (rep-level intersection
    * streaming + pure output expansion — see the body), so the floor is
    * what you pay. Route pipelines through the LINEAR-output complements —
    * [[videoClusters]] (one (doc, component) row per video) for corpus
    * dedup and [[videoDeltaVerdicts]] (one best-match row per delta
    * video) for ingest — and keep this form as a diagnostic for bounded
    * investigations where the full pair list is the question.
    */
  def videoDups(
      hashes: DataFrame,
      permille: Long = 500L,
      maxDfPermille: Long = 100L
  ): DataFrame = {
    // pin the signature table: sizes, the df table, candidate generation,
    // and the exact recount all consume it, and each unpinned branch
    // re-runs the frame DECODE pass behind it (the cdcChunks lesson). Two
    // long columns per row — tiny next to the decode it guards.
    val sig = hashes.select(col("doc_id"), col("dhash")).distinct().localCheckpoint()
    // DISCOVERY is duplication-collapsed (the repSig argument: videos with
    // identical signature sets have identical overlap against everything),
    // so the intersection stream runs at distinct-content cost; the c²
    // member pairs are then reconstituted by pure OUTPUT expansion — two
    // joins that produce exactly the emitted rows, no per-shared-hash
    // streaming. Output itself stays ~c² per recording by contract: this
    // form's runtime floor IS its row count (see SCALE DEFAULT above).
    val hot = hotProbe(sig, maxDfPermille)
    val rep = repCollapse(sig)
    val rp = repPairs(rep, hot, permille)
    // cross-group expansion: every (member of a-group, member of b-group);
    // a_/b_ reorder by id, sizes follow the id order (members inherit
    // their rep's signature size verbatim)
    val cross = rp
      .withColumnRenamed("a_id", "a_rid")
      .withColumnRenamed("b_id", "b_rid")
      .join(rep.members.select(col("rid").as("a_rid"), col("doc_id").as("a_doc")), Seq("a_rid"))
      .join(rep.members.select(col("rid").as("b_rid"), col("doc_id").as("b_doc")), Seq("b_rid"))
      .select(
        least(col("a_doc"), col("b_doc")).as("a_id"),
        greatest(col("a_doc"), col("b_doc")).as("b_id"),
        col("matches"),
        when(col("a_doc") < col("b_doc"), col("a_n")).otherwise(col("b_n")).as("a_n"),
        when(col("a_doc") < col("b_doc"), col("b_n")).otherwise(col("a_n")).as("b_n"),
        col("overlap_permille")
      )
    // within-group (twin) pairs: matches = n, overlap = 1000 exactly; the
    // hot-cap recall rule is the group-level one (a twin pair's
    // intersection IS the signature, so it must retain a non-hot hash)
    val twins = twinGroups(rep, hot, permille)
      .join(rep.members.select(col("rid"), col("doc_id").as("a_id")), Seq("rid"))
      .join(rep.members.select(col("rid"), col("doc_id").as("b_id")), Seq("rid"))
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        col("n").as("matches"),
        col("n").as("a_n"),
        col("n").as("b_n"),
        lit(1000L).as("overlap_permille")
      )
    cross.unionByName(twins)
  }

  /** [[videoDups]] with a PER-VIDEO PAIR BUDGET — the diagnostic form
    * that stays safely runnable at 100× duplication, where the full pair
    * list grows ~c² per recording. Each video keeps its `maxPairsPerVideo`
    * best partners under (overlap desc, matches desc, partner-id asc) via
    * the bounded [[graft.functions.TopKByScore]] aggregate (partial
    * buffers hold ≤ k entries — no window, no per-group unbounded
    * collect; PlanSpec pins the no-Window shape), so OUTPUT is
    * O(videos · k) regardless of duplication rate.
    *
    * DISCOVERY is duplication-collapsed too (what makes the budget a
    * compute bound, not just an output bound — the uncapped form measured
    * ~22× at 10× data on the high-duplication fixture because the pair
    * STREAM grows ~c² even when the kept rows don't): videos with
    * IDENTICAL signature sets share one partner profile by definition
    * (identical sets ⇒ identical overlap against everything — the
    * [[repSig]] argument), so qualifying pairs are discovered between
    * signature-group REPRESENTATIVES only, at distinct-content cost, and
    * per-member rows are reconstituted by BOUNDED expansion: a member's
    * partners inside any one equal-score tier (its signature twins, or
    * the members of one partner group) order by partner id, so only the
    * k+1 smallest member ids of each group can ever appear in anyone's
    * top-k — each group contributes a bounded id list, never its full
    * membership. The hot-hash candidate cap keeps the FULL-corpus df
    * semantics of [[videoDups]] (ceiling and frequencies from the member
    * table, not the rep table), so the emitted pair set is bit-identical
    * to capping the uncapped diagnostic's output.
    *
    * Truncation is LOGGED, never silent (the hot-scene-cap discipline):
    * one stderr line with how many videos lost rows and the total
    * dropped — computed at GROUP level from rep-pair degrees, no
    * expansion. Default pipelines keep routing through the linear-output
    * forms ([[videoClusters]] / [[videoDeltaVerdicts]]); rows here are
    * per (video, partner) — both directions of each pair, so a video's
    * row budget is self-contained.
    */
  def videoDupsCapped(
      hashes: DataFrame,
      permille: Long = 500L,
      maxDfPermille: Long = 100L,
      maxPairsPerVideo: Int = 64
  ): DataFrame = {
    val k = maxPairsPerVideo
    val sig = hashes.select(col("doc_id"), col("dhash")).distinct().localCheckpoint()
    // hot set computed over the FULL member table — bit-compat with the
    // uncapped diagnostic's candidate discipline
    val hot = hotProbe(sig, maxDfPermille)
    val rep = repCollapse(sig)
    val grps = rep.grps
    val members = rep.members
    val rsizes = rep.rsizes
    // rep-level qualifying pairs under the member-table hot state; one
    // row per unordered rep pair, then both directions (each video
    // budgets ITS OWN partner list)
    val rpairs = repPairs(rep, hot, permille)
    val rsym = rpairs
      .select(col("a_id").as("rid"), col("b_id").as("prid"), col("matches"), col("overlap_permille"))
      .unionByName(
        rpairs.select(col("b_id").as("rid"), col("a_id").as("prid"), col("matches"), col("overlap_permille"))
      )
    // twin (within-group) pairs: matches = n, overlap = 1000 exactly.
    // Under the hot cap a group qualifies only if its signature retains
    // >= 1 non-hot hash — the same recall bound member-level discovery
    // has for the pair (a twin pair's intersection IS the signature).
    val twinGrps = twinGroups(rep, hot, permille)
    // only the k+1 smallest member ids of a group can appear in any
    // member's top-k (within an equal-score tier, partners order by id);
    // exact while doc_id < 2^53 (double-precision id negation)
    val mtop = members
      .groupBy(col("rid"))
      .agg(
        graft.functions.TopKByScore
          .topK(negate(col("doc_id").cast("double")), col("doc_id"), k + 1)
          .as("mt")
      )
    // ---- truncation audit, at GROUP level (no expansion): a member's
    // true partner count = (g-1 if twins qualify) + sum of partner-group
    // sizes — identical for every member of the group
    val cdeg = rsym
      .join(grps.select(col("rid").as("prid"), col("g").as("pg")), Seq("prid"))
      .groupBy(col("rid"))
      .agg(sum(col("pg")).as("cdeg"))
    val npairs = grps
      .select(col("rid"), col("g"))
      .join(cdeg, Seq("rid"), "left")
      .join(twinGrps.select(col("rid"), lit(1L).as("sok")), Seq("rid"), "left")
      .select(
        col("rid"),
        col("g"),
        (coalesce(col("cdeg"), lit(0L)) +
          when(col("sok").isNotNull, col("g") - 1L).otherwise(0L)).as("np")
      )
    val trunc = npairs
      .agg(
        coalesce(sum(when(col("np") > k, col("g")).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("np") > k, (col("np") - k) * col("g")).otherwise(0L)), lit(0L))
      )
      .head()
    if (trunc.getLong(0) > 0)
      System.err.println(
        s"[graft] videoDupsCapped: ${trunc.getLong(0)} video(s) exceeded the " +
          s"$maxPairsPerVideo-pair budget; ${trunc.getLong(1)} pair row(s) dropped " +
          "(kept = best by overlap, then matches, then partner id)"
      )
    // ---- bounded expansion: per member, one candidate row per (tier,
    // bounded partner id). Rank key packs (overlap, matches) into one
    // double — exact while matches < 2^21 scene rows per pair (a 10-hour
    // video at 1 scene/s is ~36k) — so the bounded aggregate needs no
    // struct ordering. The matches lane is CLAMPED at 2^21−1 (`least`),
    // so a pathological pair past the bound saturates the decoded
    // `matches` at 2_097_151 and keeps its tie-break deterministic,
    // instead of silently corrupting both decoded columns by overflowing
    // into the overlap lane.
    val matchesCap = 2097151L // 2^21 - 1: the packed lane's saturation point
    val twinCands = members
      .join(twinGrps.select(col("rid"), col("n")), Seq("rid"))
      .join(mtop, Seq("rid"))
      .select(col("doc_id"), col("n"), explode(col("mt")).as("e"))
      .filter(col("e.id") =!= col("doc_id"))
      .select(
        col("doc_id"),
        (lit(1000L * 2097152L) + least(col("n"), lit(matchesCap))).cast("double").as("score"),
        col("e.id").as("partner_id")
      )
    val crossCands = members
      .join(rsym, Seq("rid"))
      .join(mtop.select(col("rid").as("prid"), col("mt").as("pmt")), Seq("prid"))
      .select(
        col("doc_id"),
        (col("overlap_permille") * lit(2097152L) + least(col("matches"), lit(matchesCap)))
          .cast("double")
          .as("score"),
        explode(col("pmt")).as("pe")
      )
      .select(col("doc_id"), col("score"), col("pe.id").as("partner_id"))
    val kept = twinCands
      .unionByName(crossCands)
      .groupBy(col("doc_id"))
      .agg(graft.functions.TopKByScore.topK(col("score"), col("partner_id"), k).as("tk"))
    val sizes = members.join(rsizes, Seq("rid")).select(col("doc_id"), col("n"))
    kept
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("r", "e")))
      .select(
        col("doc_id"),
        (col("r") + 1).cast("long").as("rank"),
        col("e.id").as("partner_id"),
        expr("CAST(e.score AS LONG) % 2097152").as("matches"),
        expr("CAST(e.score AS LONG) DIV 2097152").as("overlap_permille")
      )
      .join(sizes, Seq("doc_id"))
      .join(
        sizes.select(col("doc_id").as("partner_id"), col("n").as("partner_n")),
        Seq("partner_id")
      )
      .select(
        col("doc_id"), col("rank"), col("partner_id"), col("matches"),
        col("n"), col("partner_n"), col("overlap_permille")
      )
  }

  /** Hot-scene-hash probe (shared by the pair diagnostics): per-hash
    * document frequencies, the fractional df ceiling, and whether any hash
    * is hot. ADAPTIVE plan choice (the litK-switch discipline: detection
    * may change the plan, never the result): one cheap driver probe over
    * the pinned signature table decides whether any scene hash is hot. The
    * common healthy-corpus case takes the direct single-join count; only a
    * corpus that actually contains a near-universal frame pays the
    * capped-candidates + exact-recount machinery. When the cap engages,
    * one stderr line says which mass it excluded — a pair can only be
    * missed if its ENTIRE intersection is hot, and this line is how an
    * operator notices the regime at all (VideoSpec pins the intended
    * divergence on a hot-only fixture).
    */
  private case class HotState(dfs: DataFrame, ceiling: Long, anyHot: Boolean)

  private def hotProbe(sig: DataFrame, maxDfPermille: Long): HotState = {
    val nVideos =
      sig.select(countDistinct(col("doc_id"))).head().getLong(0)
    val ceiling = math.max(MinDfCeiling, nVideos * maxDfPermille / 1000)
    val dfs = sig.groupBy(col("dhash")).agg(count(lit(1)).as("df"))
    val nHot = dfs.filter(col("df") > ceiling).count()
    if (nHot > 0)
      System.err.println(
        s"[graft] videoDups: $nHot scene hash(es) with df > $ceiling excluded " +
          s"from candidate generation (pairs sharing ONLY those hashes are not emitted)"
      )
    HotState(dfs, ceiling, nHot > 0)
  }

  /** Qualifying-pair match counts `(a_id, b_id, matches)` with `a < b`
    * over a `(doc_id, dhash)` signature table, under the shared hot-hash
    * candidate discipline: hot hashes are excluded from CANDIDATE
    * GENERATION only; discovered pairs are recounted against the full
    * signatures, so every emitted count is exact.
    */
  private def pairMatches(sig: DataFrame, hot: HotState): DataFrame =
    if (!hot.anyHot)
      // every hash is a candidate key: the equijoin count IS |A∩B|
      sig
        .join(sig.select(col("doc_id").as("b_id"), col("dhash")), Seq("dhash"))
        .filter(col("doc_id") < col("b_id"))
        .groupBy(col("doc_id").as("a_id"), col("b_id"))
        .agg(count(lit(1)).as("matches"))
    else {
      val rare = sig
        .join(hot.dfs.filter(col("df") <= hot.ceiling), Seq("dhash"), "left_semi")
      val cand = rare
        .join(rare.select(col("doc_id").as("b_id"), col("dhash")), Seq("dhash"))
        .filter(col("doc_id") < col("b_id"))
        .select(col("doc_id").as("a_id"), col("b_id"))
        .distinct()
      // exact |A∩B| recount over full signatures (hot hashes included);
      // the expansion is bounded by frames-per-video, not corpus size
      cand
        .join(sig.select(col("doc_id").as("a_id"), col("dhash")), Seq("a_id"))
        .join(sig.select(col("doc_id").as("b_id"), col("dhash")), Seq("b_id", "dhash"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("matches"))
    }

  /** Identical-signature collapse (md5 set fingerprint, the [[repSig]]
    * discipline): groups (rep = min member id, size g), member→rep
    * routing, the rep-only signature table, and rep signature sizes. All
    * hash-row-sized; members and rsig are pinned because every discovery
    * branch consumes them.
    */
  private[graft] case class RepState(
      grps: DataFrame, // (rid, g)
      members: DataFrame, // (doc_id, rid)
      rsig: DataFrame, // (doc_id = rid, dhash)
      rsizes: DataFrame // (rid, n)
  )

  private def repCollapse(sig: DataFrame): RepState = {
    // one fp aggregation, pinned; groups and the rep signature table
    // derive from the pinned routing (a rep is a member routed to itself)
    val members = memberMap(sig).localCheckpoint()
    val grps = members.groupBy(col("rid")).agg(count(lit(1)).as("g"))
    val rsig = rsigOf(sig, members)
      .withColumnRenamed("rid", "doc_id") // pairMatches keys on doc_id
      .localCheckpoint()
    val rsizes = rsig
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .withColumnRenamed("doc_id", "rid")
    RepState(grps, members, rsig, rsizes)
  }

  /** Groups whose WITHIN-group (twin) pairs qualify — g > 1, the twin
    * overlap of exactly 1000 clears the threshold, and (under the hot
    * cap) the signature retains a non-hot hash — with their sizes. The
    * rule is shared by the capped and uncapped diagnostics so they can
    * never desynchronize.
    */
  private def twinGroups(rep: RepState, hot: HotState, permille: Long): DataFrame =
    (if (permille <= 1000L) rep.grps.filter(col("g") > 1)
     else rep.grps.limit(0))
      .join(selfOkReps(rep, hot), Seq("rid"), "left_semi")
      .join(rep.rsizes, Seq("rid"))

  /** Rep-level qualifying pairs `(a_id, b_id, matches, a_n, b_n,
    * overlap_permille)` with `a_id < b_id` over rep ids, under the
    * member-table hot state (bit-compat with member-level discovery: a
    * cross-group member pair shares a non-hot hash iff its rep pair
    * does — the signature sets are the same sets).
    */
  private def repPairs(rep: RepState, hot: HotState, permille: Long): DataFrame =
    pairMatches(rep.rsig, hot)
      .join(rep.rsizes.select(col("rid").as("a_id"), col("n").as("a_n")), Seq("a_id"))
      .join(rep.rsizes.select(col("rid").as("b_id"), col("n").as("b_n")), Seq("b_id"))
      .withColumn("overlap_permille", expr("(matches * 1000) DIV least(a_n, b_n)"))
      .filter(col("overlap_permille") >= lit(permille))

  /** Reps whose signature retains at least one non-hot hash — the groups
    * whose WITHIN-group (twin) pairs survive the hot-cap recall rule.
    */
  private def selfOkReps(rep: RepState, hot: HotState): DataFrame =
    if (!hot.anyHot) rep.grps.select(col("rid"))
    else
      rep.rsig
        .join(hot.dfs.filter(col("df") <= hot.ceiling), Seq("dhash"), "left_semi")
        .select(col("doc_id").as("rid"))
        .distinct()

  /** Persisted video scene-index location — the stale-proof fingerprint
    * contract keyed on the corpus membership (fixture scene content is a
    * pure function of doc_id; a production build fingerprints payload
    * bytes).
    */
  def sceneIndexDir(sfDir: String, corpusDocs: DataFrame): String =
    // layout=3: member→rep routing table (members/) added so the pair
    // probe can expand rep-level discoveries to every corpus copy without
    // re-deriving the signature collapse — retires layout-2 assets
    Indexes.fingerprintDirOn(
      "video-scene-reps", sfDir, corpusDocs, "doc_id", "doc_id", "layout=3")

  /** Build the persisted video-dedup index ONCE per corpus version: decode
    * every corpus video, keep the distinct (video, scene-hash) signature
    * rows, and write
    *
    *   - `dir/sig` — the inverted scene index, partitioned by a 16-way
    *     hash bucket of the scene hash (a delta probe reads the buckets of
    *     ITS OWN scenes, not the whole table);
    *   - `dir/dfs` — per-scene-hash document frequency (the hot-scene cap's
    *     input, precomputed at build time);
    *   - `dir/sizes` — per-video signature size + the corpus video count,
    *     written LAST (completion marker).
    *
    * The decode — the corpus-linear cost — is paid here exactly once; the
    * daily-ingest path ([[videoDeltaDups]]) reads these tables only.
    */
  /** Scene-hash document frequencies over distinct (doc, hash) sig rows —
    * the hot-scene cap's input.
    */
  private[graft] def sigDfs(sig: DataFrame): DataFrame =
    sig.groupBy(col("dhash")).agg(count(lit(1)).as("df"))

  /** Per-video signature sizes over distinct (doc, hash) sig rows. */
  private[graft] def sigSizes(sig: DataFrame): DataFrame =
    sig.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

  /** Distinct-signature representative sig rows (the [[videoClusters]]
    * collapse): a rep is the MIN doc of its signature group, so verdict
    * probes against reps are provably identical to probes against every
    * member (identical sets ⇒ identical overlap; the smaller-id tiebreak
    * lands on the rep) while the probe side stays DISTINCT-CONTENT-sized
    * regardless of corpus duplication. Pure hash-row aggregation — no
    * decode.
    */
  /** Member→rep routing `(doc_id, rid)`: every video mapped to the MIN
    * doc of its identical-signature group — one row per video, the table
    * that lets a rep-level pair discovery expand back to every copy.
    */
  private[graft] def memberMap(sig: DataFrame): DataFrame = {
    val fp = sig
      .groupBy(col("doc_id"))
      .agg(
        md5(concat_ws(",", sort_array(collect_list(col("dhash"))).cast("array<string>")))
          .as("sigfp")
      )
    fp.join(
        fp.groupBy(col("sigfp")).agg(min(col("doc_id")).as("rid")),
        Seq("sigfp")
      )
      .select(col("doc_id"), col("rid"))
  }

  /** Rep-only `(rid, dhash)` signature rows given a member→rep routing —
    * the sig semi-join every collapse consumer shares (a rep is exactly a
    * member routed to itself).
    */
  private[graft] def rsigOf(sig: DataFrame, members: DataFrame): DataFrame =
    sig
      .join(
        members.filter(col("doc_id") === col("rid")).select(col("doc_id")),
        Seq("doc_id"),
        "left_semi"
      )
      .select(col("doc_id").as("rid"), col("dhash"))

  private[graft] def repSig(sig: DataFrame): DataFrame =
    rsigOf(sig, memberMap(sig))

  /** Distinct (doc, scene-hash) signature rows for a set of video docs —
    * the decode pass (corpus-linear; what the persisted index amortizes).
    */
  private[graft] def decodeSig(spark: SparkSession, docs: DataFrame): DataFrame =
    videoFrameHashes(spark, withVideoPayload(spark, docs))
      .select(col("doc_id"), col("dhash"))
      .distinct()

  def ensureSceneIndex(spark: SparkSession, corpusDocs: DataFrame, dir: String): Unit =
    Indexes.atomicBuild(dir, "sizes/_SUCCESS") { tmp =>
      val sig = decodeSig(spark, corpusDocs).localCheckpoint()
      sig
        .withColumn("hb", pmod(xxhash64(col("dhash")), lit(16L)))
        .write
        .mode("overwrite")
        .partitionBy("hb")
        .parquet(s"$tmp/sig")
      sigDfs(sig).write.mode("overwrite").parquet(s"$tmp/dfs")
      // one fp aggregation feeds both members/ and the rep collapse
      val mem = memberMap(sig).localCheckpoint()
      val rsig = rsigOf(sig, mem).localCheckpoint()
      rsig.write.mode("overwrite").parquet(s"$tmp/rsig")
      rsig
        .groupBy(col("dhash"))
        .agg(count(lit(1)).as("df"))
        .write
        .mode("overwrite")
        .parquet(s"$tmp/rdfs")
      rsig
        .groupBy(col("rid"))
        .agg(count(lit(1)).as("n"))
        .write
        .mode("overwrite")
        .parquet(s"$tmp/rsizes")
      mem.write.mode("overwrite").parquet(s"$tmp/members")
      sigSizes(sig).write.mode("overwrite").parquet(s"$tmp/sizes")
    }

  /** INCREMENTAL video near-dup ingest: decode and hash the DELTA only,
    * probe the standing corpus exclusively through the persisted scene
    * index — zero corpus re-decode on the steady-state path. Same
    * candidate discipline as [[videoDups]]: hot corpus scene hashes (df
    * above the fractional ceiling, precomputed at build time) are excluded
    * from CANDIDATE GENERATION, then discovered (delta, corpus) pairs are
    * recounted against full signatures, so every emitted row is exact.
    *
    * Emits one row per (delta video, matched corpus video):
    * (doc_id, c_id, matches, d_n, c_n, overlap_permille ≥ permille).
    *
    * SCALE DEFAULT: like [[videoDups]], this pair form is OUTPUT-BOUND —
    * a delta video matching a heavily-duplicated recording emits one row
    * per corpus COPY, and those rows are the runtime floor. Discovery is
    * duplication-collapsed (the delta probes the persisted DISTINCT-
    * SIGNATURE rep table, then the stored member→rep routing expands each
    * discovered rep to its copies — pure output materialization), so the
    * floor is what you pay. Route ingest pipelines through
    * [[videoDeltaVerdicts]] (one argmax row per delta video, probing the
    * distinct-signature rep table — flat under corpus duplication); keep
    * this form for diagnostics that need every matched copy listed.
    */
  def videoDeltaDups(
      spark: SparkSession,
      dir: String,
      deltaDocs: DataFrame,
      permille: Long = 500L,
      maxDfPermille: Long = 100L
  ): DataFrame = {
    val dsig = videoFrameHashes(spark, withVideoPayload(spark, deltaDocs))
      .select(col("doc_id"), col("dhash"))
      .distinct()
      .localCheckpoint()
    val dsz = dsig.groupBy(col("doc_id")).agg(count(lit(1)).as("d_n"))
    // Delta-aware reads (each runs recoverSwap on open): a stream-grown
    // asset with outstanding delta/ must contribute its streamed videos to
    // the verdict, so reps/members/dfs come from the exactly-once live
    // views — identical persisted scans when no delta exists. Discovery
    // runs against the DISTINCT-SIGNATURE rep table (corpus duplication
    // never enters the intersection stream); the stored member→rep
    // routing then expands each discovered rep to its copies.
    val views = graft.streaming.VideoIndexStream.repViews(spark, dir)
    val crsig = views.rsig.select(col("rid").as("c_rid"), col("dhash"))
    val crsz = views.rsizes.select(col("rid").as("c_rid"), col("n").as("c_n"))
    val cmembers = views.members
    // adaptive, like videoDups: the build-time df table makes the hot
    // probe index-only (no corpus work at all); healthy corpora take the
    // direct equijoin count, only an actually-hot corpus pays the
    // capped-candidates + exact-recount path. Hot semantics stay
    // MEMBER-level (df counts copies — bit-compat with probing the full
    // corpus table).
    val nVideos = cmembers.count()
    val ceiling = math.max(MinDfCeiling, nVideos * maxDfPermille / 1000)
    val dfs = views.dfs
    val nHot = dfs.filter(col("df") > ceiling).count()
    val anyHot = nHot > 0
    if (anyHot)
      System.err.println(
        s"[graft] videoDeltaDups: $nHot corpus scene hash(es) with df > $ceiling " +
          s"excluded from candidate generation (delta-corpus pairs sharing ONLY " +
          s"those hashes are not emitted)"
      )
    val pairs =
      if (!anyHot)
        dsig
          .join(crsig, Seq("dhash"))
          .groupBy(col("doc_id"), col("c_rid"))
          .agg(count(lit(1)).as("matches"))
      else {
        val rare = dfs.filter(col("df") <= ceiling).select(col("dhash"))
        val cand = dsig
          .join(rare, Seq("dhash"), "left_semi")
          .join(crsig, Seq("dhash"))
          .select(col("doc_id"), col("c_rid"))
          .distinct()
        cand
          .join(dsig, Seq("doc_id"))
          .join(crsig, Seq("c_rid", "dhash"))
          .groupBy(col("doc_id"), col("c_rid"))
          .agg(count(lit(1)).as("matches"))
      }
    pairs
      .join(dsz, Seq("doc_id"))
      .join(crsz, Seq("c_rid"))
      .withColumn("overlap_permille", expr("(matches * 1000) DIV least(d_n, c_n)"))
      .filter(col("overlap_permille") >= lit(permille))
      // output expansion: one row per corpus COPY of each discovered rep
      // (members inherit their rep's signature verbatim, so matches/c_n/
      // overlap hold for every copy)
      .join(cmembers.select(col("rid").as("c_rid"), col("doc_id").as("c_id")), Seq("c_rid"))
      .select(
        col("doc_id"),
        col("c_id"),
        col("matches"),
        col("d_n"),
        col("c_n"),
        col("overlap_permille")
      )
  }

  /** LINEAR ingest verdict — the [[videoClusters]] analogue of
    * [[videoDeltaDups]]: one row per DELTA video with its BEST corpus
    * match (argmax overlap, ties to the smaller corpus id) or NULLs when
    * nothing clears the threshold, selected by a partial-aggregable
    * max(struct) — no window.
    *
    * Scale shape: the probe side is the persisted DISTINCT-SIGNATURE rep
    * table (`rsig`), not the full corpus signature table — so both the
    * candidate join and the verdict cost are (delta × distinct content),
    * FLAT under corpus duplication, where [[videoDeltaDups]]' pair output
    * necessarily grows with copies-per-recording. Verdicts are provably
    * identical to probing every corpus video: members of one signature
    * group have identical overlap with any delta video, and the
    * smaller-id tiebreak lands on the group's min doc — the rep.
    */
  def videoDeltaVerdicts(
      spark: SparkSession,
      dir: String,
      deltaDocs: DataFrame,
      permille: Long = 500L,
      maxDfPermille: Long = 100L
  ): DataFrame = {
    val dsig = videoFrameHashes(spark, withVideoPayload(spark, deltaDocs))
      .select(col("doc_id"), col("dhash"))
      .distinct()
      .localCheckpoint()
    val dsz = dsig.groupBy(col("doc_id")).agg(count(lit(1)).as("d_n"))
    // Delta-aware rep-level reads (each runs recoverSwap on open) — see
    // videoDeltaDups: streamed-but-uncompacted videos must join their
    // signature groups, not be invisible to the verdict.
    val rsig = graft.streaming.VideoIndexStream
      .readRepSig(spark, dir)
      .select(col("rid").as("c_id"), col("dhash"))
    val rsz = graft.streaming.VideoIndexStream
      .readRepSizes(spark, dir)
      .select(col("rid").as("c_id"), col("n").as("c_n"))
    // adaptive hot-scene cap over the REP-level dfs (precomputed at build)
    val nReps = rsz.count()
    val ceiling = math.max(MinDfCeiling, nReps * maxDfPermille / 1000)
    val rdfs = graft.streaming.VideoIndexStream.readRepDfs(spark, dir)
    val nHot = rdfs.filter(col("df") > ceiling).count()
    val anyHot = nHot > 0
    if (anyHot)
      System.err.println(
        s"[graft] videoDeltaVerdicts: $nHot rep scene hash(es) with df > $ceiling " +
          s"excluded from candidate generation (verdicts resting ONLY on those " +
          s"hashes are not emitted)"
      )
    val matched =
      if (!anyHot)
        dsig
          .join(rsig, Seq("dhash"))
          .groupBy(col("doc_id"), col("c_id"))
          .agg(count(lit(1)).as("matches"))
      else {
        val rare = rdfs.filter(col("df") <= ceiling).select(col("dhash"))
        val cand = dsig
          .join(rare, Seq("dhash"), "left_semi")
          .join(rsig, Seq("dhash"))
          .select(col("doc_id"), col("c_id"))
          .distinct()
        cand
          .join(dsig, Seq("doc_id"))
          .join(rsig, Seq("c_id", "dhash"))
          .groupBy(col("doc_id"), col("c_id"))
          .agg(count(lit(1)).as("matches"))
      }
    val pairs = matched
      .join(dsz, Seq("doc_id"))
      .join(rsz, Seq("c_id"))
      .withColumn("overlap_permille", expr("(matches * 1000) DIV least(d_n, c_n)"))
      .filter(col("overlap_permille") >= lit(permille))
    val best = pairs
      .groupBy(col("doc_id"))
      .agg(
        max(
          struct(
            col("overlap_permille").as("o"),
            (-col("c_id")).as("negc"),
            col("c_id").as("c_id"),
            col("matches").as("matches")
          )
        ).as("b")
      )
      .select(
        col("doc_id"),
        col("b.c_id").as("best_match"),
        col("b.matches").as("matches"),
        col("b.o").as("overlap_permille")
      )
    deltaDocs
      .select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("best_match"),
        col("matches"),
        col("overlap_permille"),
        col("best_match").isNotNull.as("is_dup")
      )
  }

  /** Video dedup CLUSTERS — the LINEAR-OUTPUT form of [[videoDups]] for
    * corpora with high duplication rates. [[videoDups]]' pair set is the
    * true answer but grows quadratically in the copies-per-recording
    * count; this form first collapses videos with IDENTICAL scene-hash
    * sets to a representative (identical sets overlap at 1000 permille by
    * definition, so the collapse is lossless for the ≥ permille
    * predicate), runs the overlap pair join on DISTINCT-signature
    * representatives only, closes under transitivity
    * ([[Dedup.connectedComponents]] min-label propagation, the
    * [[Multimodal.dhashClusters]] recipe), and maps every video through
    * its representative to the component. Output is one (doc, component,
    * csize) row per video — linear — and the quadratic stage runs over
    * distinct CONTENT, not over copies.
    *
    * Label equivalence with doc-level clustering: a representative is the
    * MIN doc of its signature group, so each component's min-label equals
    * the min doc id over its member groups — the same labels doc-level CC
    * over the full [[videoDups]] pair set would produce.
    */
  def videoClusters(hashes: DataFrame, permille: Long = 500L): DataFrame = {
    // pin: the sig aggregate and the final doc→rep join both consume the
    // hash table, and each unpinned branch re-runs the frame DECODE pass
    val sig = hashes.select(col("doc_id"), col("dhash")).distinct().localCheckpoint()
    val fp = sig
      .groupBy(col("doc_id"))
      .agg(
        md5(concat_ws(",", sort_array(collect_list(col("dhash"))).cast("array<string>")))
          .as("sigfp")
      )
    val reps = fp.groupBy(col("sigfp")).agg(min(col("doc_id")).as("rid"))
    val doc2rep =
      fp.join(reps, Seq("sigfp")).select(col("doc_id"), col("rid")).localCheckpoint()
    val repHashes = sig.join(
      doc2rep.filter(col("doc_id") === col("rid")).select(col("doc_id")),
      Seq("doc_id"),
      "left_semi"
    )
    val pairs = videoDups(repHashes, permille).select(col("a_id"), col("b_id"))
    val comp = Dedup.connectedComponents(pairs).withColumnRenamed("id", "rid")
    val docComp = doc2rep
      .join(comp, Seq("rid"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("rid")).as("component"))
    val sizes = docComp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    docComp
      .join(sizes, Seq("component"))
      .select(col("doc_id"), col("component"), col("csize"))
  }
}
