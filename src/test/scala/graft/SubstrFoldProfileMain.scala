package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split profile of `d_substr_index_fold` (the heaviest honest
  * write path): scratch copy of the base index → batch rewrite + gram
  * delta append → forced debt compaction (full bucketed-base rewrite +
  * journaled swap) → the ingest-rewrite probe of the grown index. Times
  * each stage separately so the 11.5 s (sf1 r16) can be ATTRIBUTED.
  *
  *   Test/runMain graft.SubstrFoldProfileMain /root/testdata/sf0.1
  *   Test/runMain graft.SubstrFoldProfileMain target/sf1
  */
object SubstrFoldProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = Tables.documents(spark, sfDir)
    val corpusAll = docs.filter(col("doc_id") % 10 =!= 7)
    val corpus0 = corpusAll.filter(col("doc_id") % 5 =!= 1)
    val growth = corpusAll.filter(col("doc_id") % 5 === 1)
    val delta = docs.filter(col("doc_id") % 10 === 7)

    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[substrprof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val baseDir = Dedup.substrGramIndexDir(sfDir, corpus0)
    timed("ensure-base(amortized)") {
      Dedup.ensureSubstrGramIndex(spark, corpus0, baseDir)
    }
    val sz = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(baseDir)
      val files = java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_)).toSeq
      (files.size, files.map(java.nio.file.Files.size).sum / 1e6)
    }
    println(f"[substrprof] base index: ${sz._1} files, ${sz._2}%.1f MB")

    // two passes: pass 1 cold (JIT/codegen), pass 2 is the number
    (1 to 2).foreach { pass =>
      println(s"[substrprof] ---- pass $pass ----")
      val dir = timed("copyDir(scratch)") {
        val d = s"target/graft_scratch/substrprof-${ProcessHandle.current().pid()}-$pass/idx"
        graft.operators.Indexes.copyDir(baseDir, d)
        d
      }
      timed("upsertBatch(no compaction)") {
        graft.streaming.SubstrIndexStream.upsertBatch(growth, dir, batchId = 0L, compactAt = 0)
      }
      timed("compactDeltas(forced fold)") {
        graft.streaming.SubstrIndexStream.compactDeltas(spark, dir)
      }
      timed("probe+rewrite(query leg)") {
        Dedup
          .substrDeltaRemovalOn(graft.streaming.SubstrIndexStream.readGrams(spark, dir), delta)
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.Indexes.deleteRecursively(
        java.nio.file.Paths.get(s"target/graft_scratch/substrprof-${ProcessHandle.current().pid()}-$pass"))
    }
    spark.stop()
  }
}
