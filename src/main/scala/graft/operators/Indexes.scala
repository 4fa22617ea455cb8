package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared contract for persisted index directories ([[IvfIndex]], [[Pq]]).
  *
  * Two guarantees a build-once/search-many index needs at scale:
  *
  *   1. '''Stale-proof location''': the directory is keyed by a CONTENT
  *      fingerprint — row count, id sum, and an order-insensitive XOR of
  *      per-row xxhash64(id, embedding) — so a corpus whose vectors change
  *      IN PLACE (same ids, new embeddings) maps to a new directory instead
  *      of silently serving the old index. One cheap corpus scan.
  *   2. '''Atomic publication''': builders write into a process-unique temp
  *      directory and atomically rename it into place. Readers either see
  *      no index (and build) or a complete one — never an interleaving of
  *      two concurrent builders; the rename loser discards its (identical,
  *      training is deterministic) copy.
  *
  * Deployment caveat, stated honestly: the publication primitive here is
  * POSIX `ATOMIC_MOVE`, which exists on HDFS and local/NFS filesystems
  * but NOT on S3/GCS-class object stores (their "rename" is copy+delete,
  * non-atomic). On an object store the same contract is implemented with
  * a manifest-commit instead: write all table objects under the
  * fingerprint prefix, then PUT a single completion-marker object LAST
  * (object PUTs are atomic and read-after-write consistent on current
  * S3/GCS) and have readers key on the marker — the exact discipline
  * [[TrainExport]]/[[TokenizerExport]] already follow INSIDE their
  * layout (manifest written last as the completion testimony). The
  * fingerprinted-location half of the contract is store-agnostic.
  */
object Indexes {

  /** `target/<family>/<fp12>` for this corpus's content. `params` encodes
    * everything else the persisted layout depends on — build knobs (kCells,
    * iters) and stored metadata columns — so a CONTRACT change (not just a
    * data change) also forces a rebuild instead of silently adopting a
    * stale index with the wrong columns.
    */
  def fingerprintDir(
      family: String,
      sfDir: String,
      corpus: DataFrame,
      params: String = ""
  ): String =
    fingerprintDirOn(family, sfDir, corpus, "vec_id", "embedding", params)

  /** [[fingerprintDir]] over arbitrary id/payload columns (e.g. a document
    * table's (doc_id, text)).
    */
  def fingerprintDirOn(
      family: String,
      sfDir: String,
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      params: String = ""
  ): String = {
    val fp = df
      .agg(
        count(lit(1)).cast(LongType),
        sum(col(idCol)).cast(LongType),
        // order-insensitive content checksum: XOR of row hashes over both
        // the id and the payload (array-typed xxhash64 hashes every
        // element), so any in-place edit changes the key
        expr(s"bit_xor(xxhash64($idCol, $payloadCol))")
      )
      .head()
    val key = s"$sfDir|${fp.getLong(0)}|${fp.getLong(1)}|${fp.getLong(2)}|$params"
    val tag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
      .take(12)
    s"target/$family/$tag"
  }

  /** Run `build` against a temp dir, then atomically rename into `dir`.
    * No-op if `dir/<marker>` already exists (a completed build). If a
    * concurrent builder wins the rename, this builder's copy is discarded.
    */
  def atomicBuild(dir: String, marker: String)(build: String => Unit): Unit = {
    if (!new java.io.File(s"$dir/$marker").exists()) {
      val tmp = s"$dir.tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}"
      build(tmp)
      val src = java.nio.file.Paths.get(tmp)
      val dst = java.nio.file.Paths.get(dir)
      Option(dst.getParent).foreach(java.nio.file.Files.createDirectories(_))
      try
        java.nio.file.Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => deleteRecursively(src)
        case _: java.nio.file.DirectoryNotEmptyException => deleteRecursively(src)
        case _: java.nio.file.AccessDeniedException      => deleteRecursively(src)
      }
    }
  }

  /** Crash-safe publication of a compaction over one or more index
    * subdirectories. Contract: every `<name>.compact-<stamp>` dir under
    * `dir` is fully written BEFORE this call; then
    *
    *   1. a journal file (`swap.journal`, listing stamp + names) is
    *      installed by atomic rename — THE commit point;
    *   2. each name is flipped: live dir retired, compacted dir moved in;
    *   3. retired dirs and `delta/` are deleted, the journal last.
    *
    * Every step after the journal install is idempotent against partial
    * completion (each flip checks which of compact/live exists), so a
    * process death anywhere in 2-3 leaves a journal behind and the next
    * [[recoverSwap]] — a cheap existence check every reader performs on
    * open — finishes the identical steps. Readers therefore never observe
    * a half-swapped index across a restart: before the journal lands the
    * old asset is intact; after it lands, recovery completes the new one.
    * (Concurrent readers IN the gap of a live process still see the
    * momentary rename window — this is quiesced-maintenance OPTIMIZE
    * semantics, not a lock-free swap; the crash-safety is what's new.)
    */
  private[graft] def commitSwap(dir: String, stamp: String, names: Seq[String]): Unit = {
    // Sweep leftovers of CRASHED past compactions first: a death after the
    // compact dirs were written but before the journal rename orphans
    // <name>.compact-<oldStamp> / <name>.retired-<oldStamp> /
    // swap.journal.tmp-<oldStamp> forever (no recovery path references
    // them — recovery only replays a LANDED journal), and each one is a
    // full index copy leaking on disk. commitSwap runs under the
    // single-owner maintenance discipline, so any entry with a stamp that
    // is neither this compaction's nor a live journal's is dead weight.
    sweepOrphans(dir, keepStamp = stamp)
    val journal = java.nio.file.Paths.get(s"$dir/swap.journal")
    val tmp = java.nio.file.Paths.get(s"$dir/swap.journal.tmp-$stamp")
    java.nio.file.Files.write(
      tmp,
      (stamp +: names).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    java.nio.file.Files.move(
      tmp,
      journal,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING
    )
    replaySwap(dir, stamp, names)
  }

  /** Finish an interrupted [[commitSwap]] if a journal is present — called
    * by index readers before their first listing; no-op (one existence
    * check) in the steady state.
    */
  private[graft] def recoverSwap(dir: String): Unit = {
    val journal = java.nio.file.Paths.get(s"$dir/swap.journal")
    if (java.nio.file.Files.exists(journal)) {
      import scala.jdk.CollectionConverters._
      // the journal was installed by atomic rename, so its contents are
      // complete: line 1 = stamp, rest = subdir names. Exists→read is NOT
      // atomic against a concurrent recoverer (explicitly anticipated by
      // replaySwap): the winner deletes the journal as its last step, so
      // the loser's read may find it gone — which means recovery already
      // completed, not an error.
      val lines =
        try java.nio.file.Files.readAllLines(journal).asScala.toSeq
        catch { case _: java.nio.file.NoSuchFileException => Seq.empty[String] }
      if (lines.nonEmpty) replaySwap(dir, lines.head, lines.tail.filter(_.nonEmpty))
    }
  }

  /** Delete residue of crashed past compactions: `<name>.compact-<s>`,
    * `<name>.retired-<s>`, and `swap.journal.tmp-<s>` entries whose stamp
    * `s` is neither the in-flight compaction's nor a landed journal's.
    * Called only from [[commitSwap]] (the single maintenance owner) —
    * readers must NOT sweep, or a reader's steady-state [[recoverSwap]]
    * could race the owner mid-write and delete its in-flight compact dirs.
    */
  private def sweepOrphans(dir: String, keepStamp: String): Unit = {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, Paths}
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return
    val journalStamp =
      try {
        val j = d.resolve("swap.journal")
        if (Files.exists(j)) Files.readAllLines(j).asScala.headOption else None
      } catch { case _: java.io.IOException => None }
    val keep: Set[String] = Set(keepStamp) ++ journalStamp
    val entries =
      try Files.list(d).iterator().asScala.toSeq
      catch { case _: java.io.IOException => Seq.empty }
    entries.foreach { p =>
      val n = p.getFileName.toString
      val stampOf: Option[String] =
        if (n.startsWith("swap.journal.tmp-"))
          Some(n.stripPrefix("swap.journal.tmp-"))
        else {
          val c = n.lastIndexOf(".compact-")
          val r = n.lastIndexOf(".retired-")
          if (c >= 0) Some(n.substring(c + ".compact-".length))
          else if (r >= 0) Some(n.substring(r + ".retired-".length))
          else None
        }
      stampOf.filterNot(keep.contains).foreach(_ => deleteRecursively(p))
    }
  }

  private def replaySwap(dir: String, stamp: String, names: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // Two recoverers may replay the SAME journal concurrently (any two
    // readers after a crash): each flip below tolerates losing a move
    // race — the loser's NoSuchFile/FileAlreadyExists just means the flip
    // already happened. (Concurrent WRITERS during recovery remain
    // excluded by the single-owner maintenance discipline the commitSwap
    // scaladoc states: the delta fold below cannot distinguish a batch
    // being written right now from one the compaction already folded.)
    def quietMove(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
      try Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.NoSuchFileException        => ()
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
    names.foreach { name =>
      val live = Paths.get(s"$dir/$name")
      val compact = Paths.get(s"$dir/$name.compact-$stamp")
      val retired = Paths.get(s"$dir/$name.retired-$stamp")
      if (Files.exists(compact)) {
        if (Files.exists(live)) quietMove(live, retired)
        quietMove(compact, live)
      }
      deleteRecursively(retired)
    }
    val delta = Paths.get(s"$dir/delta")
    deleteRecursively(delta)
    // The journal is the replay's completion marker: remove it ONLY once
    // the folded delta is actually gone. deleteRecursively swallows IO
    // errors (e.g. a held-open handle), and dropping the journal above a
    // surviving delta/ would let readers double-count the folded batches
    // (the postings live view unions base ∪ delta without distinct).
    if (!Files.exists(delta))
      Files.deleteIfExists(Paths.get(s"$dir/swap.journal"))
    else
      throw new java.io.IOException(
        s"swap replay for $dir: delta/ survived the fold (held handle?); " +
          "journal retained so the next recovery retries"
      )
  }

  /** Recursive file copy of a published index asset into a mutable
    * scratch location (queries that exercise in-place maintenance fold
    * into a COPY, so the cached fingerprinted base stays immutable).
    */
  private[graft] def copyDir(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).iterator().asScala.foreach { p =>
      val t = d.resolve(s.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        Option(t.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files
          .copy(p, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    // Concurrent shutdown hooks (and Spark's own temp-dir cleanup) may
    // delete entries while the walk materializes — the walk then throws
    // NoSuchFileException wrapped in UncheckedIOException. The goal of this
    // method is "gone afterwards", so someone else deleting first is
    // success, not failure; swallow and retry the listing once.
    def walkOnce(): Seq[java.nio.file.Path] =
      try java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      catch {
        case _: java.io.UncheckedIOException      => Seq.empty
        case _: java.nio.file.NoSuchFileException => Seq.empty
        case _: java.io.IOException               => Seq.empty
      }
    if (java.nio.file.Files.exists(p)) {
      walkOnce().foreach { f =>
        try java.nio.file.Files.deleteIfExists(f)
        catch { case _: java.io.IOException => () }
      }
      // A racing creator/deleter may have left stragglers; one more pass.
      if (java.nio.file.Files.exists(p)) {
        walkOnce().foreach { f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }
}
