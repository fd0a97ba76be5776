package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text entry point — the reference drives its whole DDL layer through
  * `spark.sql(ddl)` (`job1:281`), so the engine exposes the same surface
  * for analytics: register the harness tables as temp views (plus graft's
  * native functions) and run any SQL text against them.
  */
object GraftSql {

  // view registration is per (session, LAST dir): re-registering the same
  // dir is a no-op, but a different dir must overwrite the views (they
  // keep the same names), so memoize on the latest dir per session
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every harness table as a temp view named after the table,
    * and graft's custom expressions (dot_d, simhash32_d, minhash_slices)
    * so SQL text can call them. Idempotent and memoized per
    * (session, dir) — repeat calls with the same dir cost nothing. The
    * dir is recorded only AFTER every view registers: a partial failure
    * (e.g. a transient read error) must leave the memo unset so the next
    * call retries instead of serving a half-registered catalog forever. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    if (lastDir.get(spark) != dir) {
      functions.GraftFunctions.register(spark)
      // events can't go through the generic reader: its raw parquet schema
      // (TIMESTAMP(NANOS)) throws at read time, so use the repairing loader
      Tables.names.filterNot(_ == "events").foreach { t =>
        Tables.t(spark, dir, t).createOrReplaceTempView(t)
      }
      Tables.events(spark, dir).createOrReplaceTempView("events")
      lastDir.put(spark, dir)
    }

  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(text)
  }
}
