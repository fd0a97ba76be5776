package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness star schema (see /root/repo/FIXTURES.md).
  *
  * Mirrors the reference's ingestion surface
  * (`/root/reference/job1-DDL_Load_Data_Spark_Iceberg.py:33-67`: CSV read +
  * alias + validate) re-expressed over the harness parquet fixtures. Parquet
  * carries its own schema, so the reference's inferSchema step disappears;
  * alias binding and emptiness probes are provided for parity.
  *
  * All loads are plain `spark.read.parquet` — Catalyst pushes filters and
  * prunes columns into the scan, which is the scale-critical property
  * (a 100 TB table must never be read wider than the query needs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet").alias(name)

  /** events.ts has shipped in two fixture generations, both normalized here
    * to `TimestampType` (µs, session-tz) so every downstream query sees ONE
    * type regardless of which fixture is on disk:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses it natively
    *    (PARQUET_TYPE_ILLEGAL). Read nanos as Long, floor-divide to µs —
    *    integer division, since ns-epoch (~1.7e18) exceeds double's 2^53
    *    mantissa — which is exactly DuckDB's ns→µs truncation.
    *  - parquet timestamp[us] WITHOUT timezone: Spark reads TIMESTAMP_NTZ,
    *    which `cast(ts as double)` / `unix_micros(ts)` reject at analysis
    *    time. Cast NTZ→`TimestampType`: the session timezone is pinned UTC
    *    everywhere (Bench/Verify/specs), so the wall-clock reinterpretation
    *    is value-identical to DuckDB's naive reading of the same file.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val df = raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
    df.alias("events")
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Reference parity: non-empty validation (`job1:69-88`), without the
    * reference's `df.rdd.isEmpty()` anti-pattern (`job1:83`) — `Dataset
    * .isEmpty` runs a limit-1 job instead of materializing an RDD. */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty
}
