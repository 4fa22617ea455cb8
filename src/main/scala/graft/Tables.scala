package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst owns predicate
  * pushdown / column pruning; at cluster scale the same call reads a
  * partitioned table directory and prunes partitions for free.
  */
object Tables {

  // Resolved-relation memo: `spark.read.parquet` pays a footer/schema
  // inference job per call, so a session that constructs hundreds of
  // query plans over the same immutable tables would re-run that
  // metadata job at every plan construction. The input tables are
  // written once and never mutated in place (a regenerated dataset is a
  // new sfDir), so caching the resolved DataFrame per (session, path) is
  // safe — and makes warm plan construction genuinely job-free (the
  // fingerprint catalog's contract, pinned in FingerprintCatalogSpec).
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.computeIfAbsent(
      (spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2)
    )

  /** Fact-table loader with a minimum-scan-parallelism guard.
    *
    * Parquet is only splittable at row-group boundaries, so a table written
    * as one small file (one row group) scans as ONE partition — every
    * per-row expression downstream then runs on a single core no matter how
    * many the session has. On a real cluster a fact table has thousands of
    * splits and this guard is a no-op (`getNumPartitions >=
    * defaultParallelism`, no shuffle inserted); on under-split input it
    * round-robins rows across the session's cores once, right after the
    * scan. Predicate pushdown and column pruning still reach the scan —
    * Catalyst pushes filters/pruning through Repartition (PlanSpec asserts
    * both on guarded tables).
    *
    * Dimension tables (region/nation/customer/supplier/part) are left
    * unguarded: they sit on the broadcast side of joins, where spreading a
    * tiny scan buys nothing.
    */
  private def fact(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = table(spark, dir, name)
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) table(spark, dir, name).repartition(p)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = fact(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = fact(s, d, "lineitem")

  /** events.ts: the loader's contract with ALL downstream code is LongType
    * epoch NANOSECONDS — exact integer time math, immune to the
    * double-precision loss a 1.7e18 value would suffer, and deterministic
    * for the DuckDB hash-compare.
    *
    * The physical parquet type has varied across data generations:
    * TIMESTAMP(NANOS) (readable only via the nanosAsLong legacy flag, which
    * yields LongType nanos directly) and TIMESTAMP(MICROS) (reads as a
    * timestamp column). Normalize here, per the observed read schema, so
    * every consumer keeps the nanos-long view regardless of which
    * generation wrote the table. The micros→nanos conversion is a map-side
    * expression; session timezone is UTC everywhere (Verify/Bench/tests),
    * so the NTZ wall-clock→instant cast is the identity, matching DuckDB's
    * epoch_ns() over the same naive timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = fact(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = fact(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = fact(s, d, "embeddings")
}
