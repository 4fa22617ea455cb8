package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Executor-side Hadoop `Configuration` that keeps the SESSION's settings.
  *
  * `new Configuration()` inside a task loads only the classpath defaults
  * (core-default/core-site) and silently DROPS everything injected into
  * the session — `spark.hadoop.*` keys, programmatic
  * `hadoopConfiguration.set(...)` calls — which on an object store is the
  * credentials, the endpoint, and the `fs.<scheme>.impl` mapping itself:
  * the per-partition reader would resolve a different filesystem than the
  * driver listed. The fix is the standard one Spark's own sources use
  * (serialize the driver conf to tasks); `Configuration` isn't
  * serializable and Spark's wrapper is `private[spark]`, so this captures
  * the session conf as a key-value OVERLAY diffed against the defaults —
  * dozens of entries, closure-sized — and replays it onto a fresh
  * `Configuration` per partition.
  */
object HadoopConfs {

  /** Driver-side capture: every (key, raw value) on the session conf that
    * differs from what a bare `new Configuration()` would carry — plus a
    * NULL-valued tombstone for every default key the session REMOVED
    * (e.g. unsetting a core-site credential-provider path to force a
    * fallback), so the rebuild can't resurrect a classpath default the
    * driver deliberately cleared. Call at plan-construction time
    * (driver), embed the result in the closure.
    */
  def capture(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val base = new Configuration()
    val sess = spark.sparkContext.hadoopConfiguration
    val changed = sess
      .iterator()
      .asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, v) => base.getRaw(k) != v }
      .toArray
    val removed = base
      .iterator()
      .asScala
      .map(_.getKey)
      .filter(k => sess.getRaw(k) == null)
      .map(k => k -> (null: String))
      .toArray
    changed ++ removed
  }

  /** Executor-side rebuild: defaults + the captured overlay (null value =
    * unset the default).
    */
  def build(overlay: Array[(String, String)]): Configuration = {
    val c = new Configuration()
    overlay.foreach {
      case (k, null) => c.unset(k)
      case (k, v)    => c.set(k, v)
    }
    c
  }
}
