package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Cols._

/** Deterministic dataset splitting for training pipelines.
  *
  * A train/val/test split at 100 TB cannot be a random() sample: it must be
  * reproducible across reruns, stable under repartitioning, and decided
  * row-locally (no shuffle, no state). The standard answer is a hash split:
  * bucket = hash(id) mod 100, split by cumulative bucket ranges. Membership
  * is a pure function of the id — the same row lands in the same split on
  * any cluster, any partitioning, any engine (md5-derived here so the
  * DuckDB oracle reproduces it bit-for-bit).
  */
object Split {

  /** (name, percent) split spec; percents must sum to 100. */
  val DefaultSplits: Seq[(String, Int)] =
    Seq(("train", 80), ("val", 10), ("test", 10))

  /** 0..99 bucket of an id column — the hash-split decision value. */
  def bucket100(id: Column): Column = pmod(md5Long(id), lit(100))

  /** Split label for an id, by cumulative bucket ranges. Map-only. */
  def splitLabel(id: Column, splits: Seq[(String, Int)] = DefaultSplits): Column = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val b = bucket100(id)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), hi), elseCol) => when(b < hi, name).otherwise(elseCol)
    }
  }

  /** df + (bucket, split) columns; no shuffle, schema-preserving. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)] = DefaultSplits
  ): DataFrame =
    df.withColumn("bucket", bucket100(col(idCol)))
      .withColumn("split", splitLabel(col(idCol), splits))

  /** Weighted dataset mixing: keep each row with its source's sampling
    * percent, decided by an md5 bucket of the id salted with "#mix" (so the
    * mix decision is independent of the train/val/test bucket of the same
    * id). Map-only and deterministic — rerunning the mix, on any cluster,
    * keeps exactly the same rows.
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      percents: Map[String, Int],
      defaultPercent: Int = 0
  ): DataFrame = {
    val mixBucket = pmod(md5Long(concat(col(idCol).cast("string"), lit("#mix"))), lit(100))
    val rate = percents.foldLeft(lit(defaultPercent)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, p).otherwise(acc)
    }
    df.withColumn("mix_bucket", mixBucket)
      .withColumn("mix_rate", rate)
      .filter(col("mix_bucket") < col("mix_rate"))
  }
}
