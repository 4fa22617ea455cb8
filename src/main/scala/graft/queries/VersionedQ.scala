package graft.queries

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

  val all: Seq[Q] = Seq(
    Q(
      "v_time_travel",
      (s, d) => {
        val dir =
          java.nio.file.Files.createTempDirectory("graft_vq").toString
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
    )
  )
}
