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
}
