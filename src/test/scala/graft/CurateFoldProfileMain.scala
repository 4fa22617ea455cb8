package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split profile of `pipe_curate_fold`: base-asset ensure → scratch
  * copy → batch pureStats append → stat-table fold (union+distinct
  * rewrite) → deriveGates (KN + terciles + training + margins) → swap →
  * report. Run:
  *
  *   Test/runMain graft.CurateFoldProfileMain /root/testdata/sf0.1
  */
object CurateFoldProfileMain {
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
    import graft.operators.{Curation, Indexes}

    val docs = Tables.documents(spark, sfDir)
    val corpus0 = docs.filter(col("doc_id") % 5 =!= 1)
    val growth = docs.filter(col("doc_id") % 5 === 1)

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[curateprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val baseDir = timed("ensure-base(amortized)") {
      Curation.ensureGateAsset(sfDir, corpus0)
    }
    locally {
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(baseDir)).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_)).toSeq
      val mb = files.map(p => java.nio.file.Files.size(p)).sum / 1e6
      println(f"[curateprof] base asset: ${files.size}%d files, $mb%.1f MB")
    }
    (1 to 2).foreach { pass =>
      println(s"[curateprof] ---- pass $pass ----")
      val dir = s"target/graft_scratch/curateprof-${ProcessHandle.current().pid()}-$pass/asset"
      timed("copyDir") { Indexes.copyDir(baseDir, dir) }
      timed("upsertBatch(no compact)") {
        graft.streaming.CurationGateStream.upsertBatch(growth, dir, 0L, compactAt = 0)
      }
      // compact split: fold stats vs derive vs swap — instrumented inline
      timed("fold-stats(union+distinct)") {
        val stamp = "prof"
        Seq("puregates", "docstats", "doctoks").foreach { name =>
          spark.read.parquet(s"$dir/$name")
            .unionByName(spark.read.parquet(s"$dir/delta/$name").drop("batch_id"))
            .distinct()
            .write.mode("overwrite").parquet(s"$dir/$name.compact-$stamp")
        }
      }
      timed("deriveGates") {
        Curation.deriveGates(
          spark.read.parquet(s"$dir/puregates.compact-prof"),
          spark.read.parquet(s"$dir/docstats.compact-prof"),
          spark.read.parquet(s"$dir/doctoks.compact-prof")
        ).write.mode("overwrite").parquet(s"$dir/gates.compact-prof")
      }
      timed("swap") {
        Indexes.commitSwap(dir, "prof", Seq("gates", "puregates", "docstats", "doctoks"))
      }
      timed("report(noop)") {
        graft.streaming.CurationGateStream.gates(spark, dir)
          .filter(col("gopher_keep") && col("c4_keep") && col("rep_keep") &&
            col("tox_keep") && col("bucket").isNotNull)
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("kn_score_e9")).as("sum_score_e9"))
          .orderBy("lang", "bucket")
          .write.format("noop").mode("overwrite").save()
      }
      Indexes.deleteRecursively(java.nio.file.Paths.get(
        s"target/graft_scratch/curateprof-${ProcessHandle.current().pid()}-$pass"))
    }
    spark.stop()
  }
}
