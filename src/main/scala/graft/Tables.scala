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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses natively
    * (PARQUET_TYPE_ILLEGAL). Read nanos as Long, then floor-divide to µs —
    * integer division, since ns-epoch (~1.7e18) exceeds double's 2^53
    * mantissa — which is exactly DuckDB's ns→µs truncation, keeping the
    * oracle comparable. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val df =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
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
