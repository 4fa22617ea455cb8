package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CountMinSketchAgg
import graft.operators.Text

/** Incremental corpus statistics: maintain a Count-Min sketch over a
  * document stream, one persisted partial per micro-batch.
  *
  * This is the streaming payoff of a MERGEABLE sketch
  * ([[CountMinSketchAgg]]): each batch tokenizes only its own documents
  * and writes its O(d·w) counter matrix to `dir/sketches/batch_id=N`
  * (idempotent per batch — a replayed batch overwrites its own partition,
  * the exactly-once discipline of
  * [[EventStreams.idempotentParquetSink]]). The corpus-level sketch is the
  * elementwise sum of the partials — no re-tokenization, no corpus
  * re-scan, ever. At 100 TB the batch partials are a few KB each; merging
  * a year of them is seconds.
  */
object SketchStream {

  /** foreachBatch writer: per-batch token CM sketch → batch-partitioned
    * parquet. Start with `.trigger(...).option("checkpointLocation", ...)`.
    */
  def sketchUpsert(
      docsStream: DataFrame,
      dir: String,
      depth: Int = 4,
      width: Int = 256
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch
        .select(explode(Text.tokensAll(col("text"))).as("t"))
        .agg(CountMinSketchAgg.cmSketch(col("t"), depth, width).as("sk"))
        .write
        .mode("overwrite")
        .parquet(s"$dir/sketches/batch_id=$batchId")
    }

  /** The corpus sketch: elementwise sum of every persisted batch partial.
    * Distributed merge (posexplode → sum per cell), then one bounded
    * O(d·w) collect of the merged matrix.
    */
  def mergedSketch(
      spark: SparkSession,
      dir: String,
      depth: Int = 4,
      width: Int = 256
  ): Array[Long] = {
    val cells = spark.read
      .parquet(s"$dir/sketches")
      .select(posexplode(col("sk")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(sum(col("v")).as("v"))
      .orderBy(col("pos"))
      .collect()
    val out = new Array[Long](depth * width)
    cells.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }
}
