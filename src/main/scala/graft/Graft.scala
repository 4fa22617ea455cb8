package graft

import org.apache.spark.sql.SparkSession

/** The SQL entry path: register every dataset as a temp view plus the
  * engine's native functions, so the whole surface is reachable from
  * `spark.sql(...)` — the "switch your SQL, keep your queries" face of the
  * library next to the DataFrame operator API.
  */
object Graft {

  /** Idempotent; after this `spark.sql("SELECT djb2(x) FROM lineitem")`
    * (and every other view/function) resolves.
    */
  def registerSql(spark: SparkSession, sfDir: String): Unit = {
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    functions.GraftFunctions.register(spark)
  }
}
