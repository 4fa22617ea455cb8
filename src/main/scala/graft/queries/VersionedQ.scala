package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.sources.Versioned

/** Dataset-versioning surface: manifest-based snapshot-isolated commits
  * with time-travel reads ([[graft.sources.Versioned]]).
  *
  * The oracle angle: each committed version's row set is a pure function
  * of the source table (v1 = even doc_ids, v2 = v1 + odd doc_ids = whole
  * corpus, v3 = overwrite with lang='en' only), so DuckDB can replay all
  * three from `documents` directly. Reading v1/v2 AFTER the v3 overwrite
  * and still matching the oracle is exactly the snapshot-isolation
  * guarantee — if a later commit could disturb an earlier version, the
  * hashes would diverge.
  */
object VersionedQ {

  /** Per-(query, process) scratch table location: WIPED at the start of
    * every invocation (a bench best-of-5 within one process reuses one
    * slot instead of accumulating five corpus copies) and registered for
    * recursive deletion at JVM exit (nothing survives the run). Safe to
    * wipe at entry: by the time a query is re-invoked, the previous
    * invocation's DataFrame has been fully consumed.
    */
  private def scratchDir(name: String): String = QueryScratch.dir(name)

  val all: Seq[Q] = Seq(
    Q(
      "v_time_travel",
      (s, d) => {
        val dir = scratchDir("v_time_travel")
        val docs = Tables.documents(s, d)
        Versioned.commit(docs.filter(col("doc_id") % 2 === 0), dir) // v1
        Versioned.commit(docs.filter(col("doc_id") % 2 === 1), dir) // v2 (append)
        Versioned.commit( // v3 (overwrite)
          docs.filter(col("lang") === "en"),
          dir,
          append = false
        )
        val perVersion = Seq(1, 2, 3).map { v =>
          Versioned
            .readVersion(s, dir, v)
            .groupBy(col("lang"))
            .agg(
              count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("sum_chars")
            )
            .withColumn("version", lit(v.toLong))
        }
        perVersion
          .reduce(_ unionByName _)
          .select("version", "lang", "n_docs", "sum_chars")
          .orderBy("version", "lang")
      },
      Some("""WITH v1 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
             |v2 AS (SELECT * FROM documents),
             |v3 AS (SELECT * FROM documents WHERE lang = 'en')
             |SELECT CAST(1 AS BIGINT) AS version, lang,
             |  COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS sum_chars
             |FROM v1 GROUP BY lang
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), lang, COUNT(*)::BIGINT, SUM(n_chars)::BIGINT
             |FROM v2 GROUP BY lang
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), lang, COUNT(*)::BIGINT, SUM(n_chars)::BIGINT
             |FROM v3 GROUP BY lang
             |ORDER BY version, lang""".stripMargin),
      doc = "Versioned-table time travel: three commits (append, append, " +
        "overwrite) then per-lang stats of each version read back AFTER " +
        "all commits landed. v1/v2 matching the oracle post-overwrite is " +
        "the snapshot-isolation proof; manifests are O(commits) and a " +
        "version read is a plain multi-dir parquet scan with pushdown " +
        "intact."
    ),
    Q(
      "v_vacuum",
      (s, d) => {
        val dir = scratchDir("v_vacuum")
        val docs = Tables.documents(s, d)
        Versioned.commit(docs.filter(col("doc_id") % 3 === 0), dir) // v1
        Versioned.commit(docs.filter(col("doc_id") % 3 === 1), dir) // v2 (append)
        Versioned.commit(docs.filter(col("lang") === "en"), dir, append = false) // v3
        Versioned.commit( // v4 (append onto v3)
          docs.filter(col("doc_id") % 3 === 2 && col("lang") =!= "en"),
          dir
        )
        Versioned.vacuum(dir, retainLast = 2) // retires v1+v2, reclaims c1+c2
        val retired = Seq(1, 2).map { v =>
          // A vacuumed version must be GONE: its manifest removed, so the
          // read fails. If it unexpectedly still resolves, surface a
          // 'leaked' status — the oracle expects 'vacuumed', so any
          // retention leak breaks the hash gate.
          val status =
            try { Versioned.readVersion(s, dir, v); "leaked" }
            catch { case _: IllegalArgumentException => "vacuumed" }
          (v.toLong, status)
        }
        import s.implicits._
        val retiredDf = retired
          .toDF("version", "status")
          .withColumn("n_docs", lit(null).cast("long"))
          .withColumn("sum_chars", lit(null).cast("long"))
        val retainedDf = Seq(3, 4)
          .map { v =>
            Versioned
              .readVersion(s, dir, v)
              .agg(
                count(lit(1)).as("n_docs"),
                sum(col("n_chars")).as("sum_chars")
              )
              .select(
                lit(v.toLong).as("version"),
                lit("retained").as("status"),
                col("n_docs"),
                col("sum_chars")
              )
          }
          .reduce(_ unionByName _)
        retiredDf
          .unionByName(retainedDf)
          .orderBy("version")
      },
      Some("""WITH v3 AS (SELECT * FROM documents WHERE lang = 'en'),
             |v4 AS (SELECT * FROM documents
             |       WHERE lang = 'en' OR (doc_id % 3 = 2 AND lang <> 'en'))
             |SELECT CAST(1 AS BIGINT) AS version, 'vacuumed' AS status,
             |       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS sum_chars
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), 'vacuumed', NULL, NULL
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), 'retained',
             |       COUNT(*)::BIGINT, SUM(n_chars)::BIGINT FROM v3
             |UNION ALL
             |SELECT CAST(4 AS BIGINT), 'retained',
             |       COUNT(*)::BIGINT, SUM(n_chars)::BIGINT FROM v4
             |ORDER BY version""".stripMargin),
      doc = "Versioned-table VACUUM (retention GC): four commits, retain " +
        "the last 2 — v1/v2's manifests are removed first (atomic " +
        "unreadability), then the data dirs only they referenced. " +
        "Retired versions must fail to resolve ('vacuumed'; a successful " +
        "read would surface 'leaked' and break the hash gate) while " +
        "retained versions read back byte-identical. Liveness is " +
        "manifest-level set arithmetic, O(commits) driver work — no data " +
        "read or rewritten."
    ),
    Q(
      "v_merge_upsert",
      (s, d) => {
        val dir = scratchDir("v_merge_upsert")
        val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
        Versioned.commitMerge(docs, dir) // v1: full base
        Versioned.commitMerge( // v2: update every 10th doc
          docs
            .filter(col("doc_id") % 10 === 0)
            .withColumn("n_chars", col("n_chars") + 1000L),
          dir
        )
        Versioned.commitMerge( // v3: delete every 7th doc (tombstones)
          docs.filter(col("doc_id") % 7 === 0),
          dir,
          deleted = lit(true)
        )
        val merged = Versioned
          .readMerged(s, dir, "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("phase", lit("merged"))
        Versioned.compactMerged(s, dir, "doc_id") // v4: fold to a fresh base
        val compacted = Versioned
          .readMerged(s, dir, "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("phase", lit("compacted"))
        merged
          .unionByName(compacted)
          .select("phase", "lang", "n_docs", "sum_chars")
          .orderBy("phase", "lang")
      },
      Some("""WITH fin AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
             |         ELSE n_chars END AS n_chars
             |  FROM documents WHERE doc_id % 7 <> 0
             |)
             |SELECT 'compacted' AS phase, lang,
             |  COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS sum_chars
             |FROM fin GROUP BY lang
             |UNION ALL
             |SELECT 'merged', lang, COUNT(*)::BIGINT, SUM(n_chars)::BIGINT
             |FROM fin GROUP BY lang
             |ORDER BY phase, lang""".stripMargin),
      doc = "MERGE INTO, merge-on-read: base commit + an UPDATE delta " +
        "(every 10th doc, n_chars+1000) + a DELETE delta (every 7th doc, " +
        "tombstones) — each commit appends only |delta| rows, zero " +
        "copy-on-write. readMerged resolves latest-commit-wins per key " +
        "via one partial-aggregable max(struct) (no window) and drops " +
        "tombstoned keys; compactMerged then folds the resolved state " +
        "into a fresh base and the re-read must hash-match the merged " +
        "view — both phases replayed by the oracle."
    ),
    // ---- compliance erasure (GDPR right-to-be-forgotten): a logical MOR
    // delete is NOT erasure — the tombstoned rows still sit in old commit
    // dirs, readable via time travel. Physical erasure is the composition
    // delete → compact (resolved state into a fresh dir) → vacuum (destroy
    // every version that predates the delete). The query audits the claim
    // by scanning EVERY byte that remains on disk.
    Q(
      "v_forget",
      (s, d) => {
        val dir = scratchDir("v_forget")
        val docs = Tables.documents(s, d).select("doc_id", "lang", "text", "n_chars")
        Versioned.commitMerge(docs, dir) // v1: full base
        Versioned.commitMerge( // v2: tombstone the forget set
          docs.filter(col("doc_id") % 11 === 0),
          dir,
          deleted = lit(true)
        )
        Versioned.compactMerged(s, dir, "doc_id") // v3: resolved, tombstone-free
        Versioned.vacuum(dir, retainLast = 1) // physically destroy c1 + c2
        // physical audit: read EVERYTHING still under the table (all
        // surviving data dirs, no manifest indirection) and count rows of
        // the forgotten keys — the oracle pins this at zero, so a single
        // surviving byte-row breaks the hash gate
        // explicit listing, not a glob: a `data/*` path makes Spark's
        // FileStreamSink metadata probe log a benign-but-scary
        // FileNotFoundException stack on every run (glob paths fail its
        // existence check); enumerating the surviving dirs reads the same
        // bytes with a clean log tail
        val dataDirs = java.nio.file.Files
          .list(java.nio.file.Paths.get(dir, "data"))
          .iterator()
          .asScala
          .map(_.toString)
          .toSeq
          .sorted
        val survivors = s.read.parquet(dataDirs: _*)
        survivors
          .agg(
            count(lit(1)).as("n_rows_on_disk"),
            sum(when(col("doc_id") % 11 === 0, 1L).otherwise(0L))
              .cast("long")
              .as("n_leaked"),
            sum(col("n_chars")).as("sum_chars")
          )
      },
      Some("""SELECT COUNT(*)::BIGINT AS n_rows_on_disk,
             |  CAST(0 AS BIGINT) AS n_leaked,
             |  SUM(n_chars)::BIGINT AS sum_chars
             |FROM documents WHERE doc_id % 11 <> 0""".stripMargin),
      doc = "Right-to-be-forgotten: tombstone delete -> compact -> vacuum " +
        "composes logical deletion into PHYSICAL erasure (pre-delete " +
        "versions destroyed, no time travel back to the erased rows). " +
        "The query then reads every surviving data file directly — no " +
        "manifest indirection — and the oracle pins zero rows of the " +
        "forgotten keys on disk and the exact surviving row/char totals."
    )
  )
}
