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
  * the session conf as FULL key-value pairs — a few hundred entries,
  * still closure-sized — and replays it onto a defaults-free
  * `Configuration(false)` per partition.
  *
  * Capturing the WHOLE conf (not a diff against the driver's classpath
  * defaults) makes the replay independent of executor classpaths: a
  * cluster whose executors load different core-site defaults than the
  * driver would, under a diff-based overlay, silently keep
  * executor-local values for any key that happened to match a DRIVER
  * default — and a driver-computed removal tombstone could unset an
  * executor-local key the driver never saw. With the full capture
  * replayed onto `new Configuration(false)`, every task sees exactly the
  * driver session's view, by construction, on any classpath. Values are
  * captured post-substitution (`Configuration.iterator` resolves
  * `${...}` variables driver-side), so the view is also independent of
  * executor-local system properties.
  */
object HadoopConfs {

  /** Driver-side capture: every (key, value) visible on the session conf
    * (classpath defaults included — they are part of the driver's view).
    * Call at plan-construction time (driver), embed the result in the
    * closure.
    */
  def capture(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration
      .iterator()
      .asScala
      .map(e => e.getKey -> e.getValue)
      .toArray
  }

  /** Executor-side rebuild: the captured session view on a defaults-free
    * `Configuration` — no executor-classpath default can leak in, and a
    * key the driver removed stays absent because it was never set.
    */
  def build(overlay: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    overlay.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
