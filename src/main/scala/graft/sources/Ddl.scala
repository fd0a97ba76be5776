package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Catalog-table layout module — the Spark-native re-expression of the
  * reference's job1 (`/root/reference/job1-DDL_Load_Data_Spark_Iceberg.py`):
  *
  *  - declared-schema catalog tables under a namespace (`job1:184-275`,
  *    `bootcamp.*`) → `CREATE DATABASE` + `saveAsTable`
  *  - `PARTITIONED BY (bucket(16, match_id))` Iceberg transform
  *    (`job1:224,239,248`) → Hive-style `bucketBy(16, key)` +
  *    `sortBy(key)`: same hash-co-location property, no Iceberg jar needed
  *  - identity partitioning for dims (`job1:256,273`) → `partitionBy`
  *  - overwrite table writes (`job1:295,305,...`) → SaveMode.Overwrite
  *
  * Why it matters at 100 TB: two facts bucketed the same way on the join
  * key make every future fact⋈fact join shuffle-free (EnsureRequirements
  * sees matching HashClusteredDistributions from the bucketed scans and
  * elides both exchanges) — the shuffle is paid ONCE at write time, then
  * amortized over every downstream query. This is the property
  * README.md:16-18 builds its whole exercise around; DdlSpec asserts it
  * on the physical plan.
  */
object Ddl {

  /** Write the bucketed-facts + partitioned-dim warehouse. 16 buckets
    * mirrors the reference; at cluster scale set buckets ≈ a small
    * multiple of total executor cores so each bucket-join task gets one
    * bucket pair. */
  def createWarehouse(spark: SparkSession, dir: String,
                      db: String = "bootcamp", buckets: Int = 16): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // An in-memory catalog forgets tables across JVMs but their files
    // survive in the warehouse dir; saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS. Drop both the entry and any stale location.
    Seq("lineitem_bucketed", "orders_bucketed", "nation_part").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      val loc = Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"$db.db", t)
      if (Files.exists(loc)) deleteRecursively(loc)
    }
    Tables.lineitem(spark, dir).write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_bucketed")
    Tables.orders(spark, dir).write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_bucketed")
    Tables.nation(spark, dir).write.mode(SaveMode.Overwrite)
      .partitionBy("n_regionkey")
      .saveAsTable(s"$db.nation_part")
  }

  /** The shuffle-free fact⋈fact join over the bucketed tables
    * (README.md:18's bucket join). */
  def bucketJoin(spark: SparkSession, db: String = "bootcamp"): DataFrame = {
    val li = spark.table(s"$db.lineitem_bucketed")
    val o = spark.table(s"$db.orders_bucketed")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
  }

  /** README.md:25's experiment: write the same data with different
    * sortWithinPartitions keys and measure on-disk size — low-cardinality
    * sort keys give parquet RLE/dictionary runs. Returns variant → bytes.
    *
    * Runs over a deterministic ~10% orderkey slice: the layout conclusion
    * (low-card sort < unsorted < high-card sort) is scale-free, and the
    * experiment writes the data 3× — benchmarking 9 full-corpus writes per
    * pass alongside compute queries taxed every bench run for no extra
    * signal. The slice keeps whole orders together (orderkey-keyed), so
    * run-length structure per partition is representative. */
  def writeSizeExperiment(spark: SparkSession, dir: String,
                          out: String): Seq[(String, Long)] = {
    val li = Tables.lineitem(spark, dir)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .repartition(8, col("l_orderkey"))
    val variants: Seq[(String, DataFrame)] = Seq(
      "unsorted" -> li,
      "sorted_lowcard" -> li.sortWithinPartitions("l_returnflag", "l_linestatus", "l_suppkey"),
      "sorted_highcard" -> li.sortWithinPartitions("l_extendedprice"))
    variants.map { case (name, df) =>
      val path = s"$out/$name"
      df.write.mode(SaveMode.Overwrite).parquet(path)
      name -> dirBytes(Paths.get(path))
    }
  }

  /** [[writeSizeExperiment]] as a driver-visible query: variant → on-disk
    * bytes, one row per layout variant. Rows-only check (no oracle) —
    * byte counts depend on the parquet writer's encoder decisions, which
    * is exactly the point of the experiment. The temp output is removed
    * after sizes are measured; the returned frame is driver-local. */
  def sortWithinSizes(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_sizes")
    try {
      import spark.implicits._
      writeSizeExperiment(spark, dir, out.toString)
        .toDF("variant", "bytes").orderBy("variant")
    } finally deleteRecursively(out)
  }

  /** Hash-green CONTRACT twin of the rows-only [[sortWithinSizes]] (the
    * q_pca_contract pattern: Spark evaluates the layout verdicts, the
    * oracle pins them TRUE and recomputes the exactly-knowable fields).
    * Pinned facts — each byte-stable across repeated runs and TRUE at
    * all three fixture SFs:
    *   - `n_variants` = 3 (the experiment always writes all variants)
    *   - `all_nonzero` — every variant produced real bytes
    *   - `lowcard_lt_unsorted` — README.md:25's core claim: sorting
    *     within partitions on low-cardinality keys shrinks parquet vs
    *     the unsorted layout (RLE/dictionary runs)
    * NOT pinned: lowcard vs highcard — measured to FLIP with scale
    * (lowcard smallest at sf0.001, highcard smallest at sf0.1, where
    * delta-packed sorted prices beat flag runs), which is exactly why
    * the raw byte counts stay a rows-only query. */
  def sortWithinContract(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_sizes")
    try {
      import spark.implicits._
      val m = writeSizeExperiment(spark, dir, out.toString).toMap
      Seq((m.size.toLong,
        m.values.forall(_ > 0L),
        m("sorted_lowcard") < m("unsorted")))
        .toDF("n_variants", "all_nonzero", "lowcard_lt_unsorted")
    } finally deleteRecursively(out)
  }

  private val sortWithinContractSql =
    """SELECT CAST(3 AS BIGINT) AS n_variants, TRUE AS all_nonzero,
      |       TRUE AS lowcard_lt_unsorted""".stripMargin

  val all: Seq[graft.Q] = Seq(
    graft.Q("q_sortwithin_sizes", sortWithinSizes, None),
    graft.Q("q_sortwithin_contract", sortWithinContract,
      Some(sortWithinContractSql),
      doc = "layout-experiment contract: low-card sortWithinPartitions " +
        "beats unsorted on disk; all variants written"))

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(Files.delete(_))
    finally s.close()
  }

  private def dirBytes(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    finally s.close()
  }
}
