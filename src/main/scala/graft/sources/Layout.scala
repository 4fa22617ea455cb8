package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output-layout sink for large tables — the write-side half of every
  * "fast at 100 TB" read in this engine:
  *
  *   - directory-partitioned by the pruning key, so downstream filters
  *     become partition pruning (scan nProbe directories, not the corpus);
  *   - sorted within partitions by the lookup key, so parquet row-group
  *     min/max statistics skip pages on point/range lookups;
  *   - one `repartition` on the partition key before the write, so each
  *     output directory is produced by one task instead of every task
  *     writing a sliver into every directory (the small-files explosion:
  *     tasks × partitions files);
  *   - `maxRecordsPerFile` bounds file size so a hot partition still
  *     splits into parallel-scannable files.
  */
object Layout {

  def writePartitionedSorted(
      df: DataFrame,
      path: String,
      partitionCol: String,
      sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L
  ): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Small-files compaction: rewrite a parquet directory into
    * ceil(bytes / targetFileBytes) files. Long-running ingestion leaves
    * thousands of KB-sized files per partition (one per micro-batch/task);
    * at 100 TB the scan's task-scheduling and footer-reading overhead then
    * dwarfs the I/O. Row-count-preserving, content-identical rewrite; the
    * round-robin repartition spreads rows evenly regardless of input skew.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Unit = {
    val in = spark.read.parquet(inDir)
    val bytes = in.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles =
      (((bytes + BigInt(targetFileBytes) - 1) / BigInt(targetFileBytes)) max BigInt(1)).toInt
    in.repartition(nFiles).write.mode("overwrite").parquet(outDir)
  }
}
