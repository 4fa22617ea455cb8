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

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files
        .walk(p)
        .iterator()
        .asScala
        .toSeq
        .reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
