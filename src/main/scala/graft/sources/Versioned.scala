package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based VERSIONED TABLE: snapshot-isolated commits and
  * time-travel reads over plain parquet — the dataset-versioning
  * primitive a training-data pipeline needs for reproducibility ("train
  * on corpus@v12"), rollback, and audit (diff two versions with
  * [[graft.operators.Dedup.snapshotDiff]]).
  *
  * Layout:
  * {{{
  *   dir/data/c<N>/...parquet      one immutable directory per commit
  *   dir/_manifests/v<N>.manifest  newline list of the data dirs whose
  *                                 union IS version N
  * }}}
  *
  * Commit protocol (the [[graft.operators.Indexes.atomicBuild]]
  * discipline): write the commit's data dir, then write the manifest to
  * a temp file and atomically rename it into place. Readers resolve a
  * version by reading one manifest — they see a whole version or none;
  * a reader of v_N is never affected by a concurrent commit of v_N+1
  * because data dirs are immutable and manifests are never rewritten.
  *
  * Scale shape: the manifest lists directories (O(commits), not
  * O(files)); a version read is `spark.read.parquet(dirs: _*)` — normal
  * distributed scans with pushdown/pruning intact, plus `mergeSchema`
  * so later commits may ADD columns (schema evolution: old commits
  * surface nulls).
  */
object Versioned {

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")

  /** Newest committed version, or 0 when the table doesn't exist. */
  def latestVersion(dir: String): Int = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) 0
    else
      Files
        .list(md)
        .iterator()
        .asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt
        }
        .foldLeft(0)(math.max)
  }

  private def readManifest(dir: String, v: Int): Seq[String] = {
    val p = manifestDir(dir).resolve(s"v$v.manifest")
    require(Files.exists(p), s"version $v does not exist under $dir")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.filter(_.nonEmpty).toSeq
  }

  /** Commit `df` as the next version. `append = true` makes the new
    * version the previous version's dirs plus this commit's; `false`
    * replaces the table contents (overwrite semantics). Returns the new
    * version number.
    */
  def commit(df: DataFrame, dir: String, append: Boolean = true): Int = {
    val prev = latestVersion(dir)
    val next = prev + 1
    val dataDir = s"c$next"
    df.write.mode("errorifexists").parquet(s"$dir/data/$dataDir")
    val dirs =
      if (append && prev > 0) readManifest(dir, prev) :+ dataDir
      else Seq(dataDir)
    Files.createDirectories(manifestDir(dir))
    val tmp = manifestDir(dir).resolve(s".v$next.tmp")
    Files.write(tmp, dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(
      tmp,
      manifestDir(dir).resolve(s"v$next.manifest"),
      StandardCopyOption.ATOMIC_MOVE
    )
    next
  }

  /** Time-travel read: the exact row set of version `v` (default:
    * latest). `mergeSchema` presents the union schema across commits, so
    * columns added by later commits read as null in older data.
    */
  def readVersion(spark: SparkSession, dir: String, v: Int = -1): DataFrame = {
    val version = if (v < 0) latestVersion(dir) else v
    val dirs = readManifest(dir, version).map(d => s"$dir/data/$d")
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }
}
