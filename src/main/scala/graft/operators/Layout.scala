package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multi-dimensional data layout: Z-ordering (Morton curve) — the
  * `sortWithinPartitions` experiment of the reference (`README.md:25`)
  * generalized to MORE THAN ONE filter dimension. A linear sort clusters
  * row groups on one column only; interleaving the bits of two keys
  * clusters them in 2-D, so parquet min/max stats prune row groups for
  * range predicates on EITHER or BOTH dimensions. At 100 TB the layout is
  * the difference between scanning a slab of the lake and scanning the
  * few row groups a box query actually intersects (LayoutSpec measures
  * exactly that on real files).
  */
object Layout {

  /** Morton z-value of two non-negative int keys: bit i of `a` lands at
    * even position 2i, bit i of `b` at odd position 2i+1. Pure built-in
    * bit arithmetic — stays inside whole-stage codegen, and the same
    * expression is reproducible in any engine with shifts (the oracle
    * mirrors it bit-for-bit). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  private def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** The z-order kernel as a checked query: the 20 smallest z-values of
    * the (l_partkey, l_suppkey) plane with their coordinates — pins the
    * interleave bit-for-bit against the oracle's shift arithmetic. */
  def zorderKeys(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("zval").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)

  private val zorderKeysSql =
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       CAST(${zValueSql("l_partkey", "l_suppkey")} AS BIGINT) AS zval
       |FROM lineitem
       |ORDER BY zval, l_orderkey, l_linenumber LIMIT 20""".stripMargin

  /** Write `df` z-ordered on (a, b) with small row groups — the layout
    * half of the experiment ([[zValue]] is the math half). Raw keys don't
    * interleave well when the dimensions have unequal bit-widths (the
    * wider key's high bits dominate the curve, collapsing it to a linear
    * sort at row-group granularity), so each dimension first normalizes
    * into 2^bits equal-width range buckets — the same move production
    * z-order implementations make — and the BUCKETS interleave. Row-group
    * size is a knob because the fixture is tiny; at scale the default
    * 128 MB groups give the same relative pruning. */
  def writeZOrdered(df: DataFrame, a: String, b: String, out: String,
                    rowGroupBytes: Int, bits: Int = 5,
                    partitions: Int = 0): Unit = {
    val r = df.agg(max(col(a)), max(col(b))).collect()(0)
    val (aMax, bMax) = (r.getLong(0), r.getLong(1))
    val cells = (1L << bits).toDouble
    val aBkt = floor(col(a).cast("double") * cells / (aMax + 1)).cast("long")
    val bBkt = floor(col(b).cast("double") * cells / (bMax + 1)).cast("long")
    val z = zValue(aBkt, bBkt, bits)
    // RANGE partition on the curve: each output file owns a contiguous
    // z-interval, so clustering holds globally across files (a hash
    // repartition would scatter the curve; a single partition would
    // serialize the write at scale). partitions <= 0 → session default.
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(out)
  }

  /** Hilbert-clustered write — [[writeZOrdered]] on the stronger curve:
    * same bucket-normalize + range-partition + sort-within shape, but
    * rows order along the [[graft.functions.HilbertD]] walk, whose
    * strict neighbor adjacency (no Morton boundary seams) gives each
    * row group a tighter 2-D bounding box and therefore at-least-as-good
    * min/max pruning for box predicates (LayoutSpec measures it). */
  def writeHilbertOrdered(df: DataFrame, a: String, b: String, out: String,
                          rowGroupBytes: Int, bits: Int = 5,
                          partitions: Int = 0): Unit = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val r = df.agg(max(col(a)), max(col(b))).collect()(0)
    val (aMax, bMax) = (r.getLong(0), r.getLong(1))
    val cells = (1L << bits).toDouble
    def bkt(c: String, cMax: Long) =
      s"CAST(floor(CAST($c AS DOUBLE) * ${cells}D / ${cMax + 1}) AS BIGINT)"
    val h = expr(
      s"hilbert_d(${bkt(a, aMax)}, ${bkt(b, bMax)}, $bits)")
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, h)
      .sortWithinPartitions(h)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(out)
  }

  /** Linear-sorted counterpart for the comparison — same range-partition
    * + sort-within write shape, ordered on the single key. */
  def writeLinearSorted(df: DataFrame, key: String, out: String,
                        rowGroupBytes: Int, partitions: Int = 0): Unit = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(out)
  }

  /** The Hilbert kernel as a checked query — [[zorderKeys]]'s sibling on
    * the stronger curve: the 20 smallest Hilbert indexes of the
    * (l_partkey, l_suppkey) plane. Spark computes through the codegen'd
    * [[graft.functions.HilbertD]] loop; the oracle replays the SAME
    * top-down walk as 16 chained per-bit CTE rounds (each MATERIALIZED —
    * a round references its predecessor's state several times, so the
    * naive inline chain expands exponentially; the quadrant xor is
    * spelled 3·rx + ry − 2·rx·ry, identical on {0,1}²). A hash match is
    * bit-equality between the compiled kernel and portable SQL at corpus
    * scale — the custom-Expression contract
    * (memory: new-query-checklist). */
  def hilbertKeys(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        expr("hilbert_d(CAST(l_partkey AS BIGINT), " +
          "CAST(l_suppkey AS BIGINT), 16)").as("hval"))
      .orderBy(col("hval").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(20)
  }

  private val hilbertKeysSql = {
    val rounds = (15 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == 15) "base" else s"r${i + 1}"
      // rx/ry spelled inline so each round is one SELECT over the
      // materialized predecessor
      val rx = s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END"
      val ry = s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END"
      s"""r$i AS MATERIALIZED (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |    CASE WHEN $ry = 0 THEN
         |      CASE WHEN $rx = 1 THEN $s - 1 - y ELSE y END
         |    ELSE x END AS x,
         |    CASE WHEN $ry = 0 THEN
         |      CASE WHEN $rx = 1 THEN $s - 1 - x ELSE x END
         |    ELSE y END AS y,
         |    d + $s * $s *
         |      (3 * ($rx) + ($ry) - 2 * ($rx) * ($ry)) AS d
         |  FROM $prev)""".stripMargin
    }
    s"""WITH base AS MATERIALIZED (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |         CAST(l_partkey AS BIGINT) AS x,
       |         CAST(l_suppkey AS BIGINT) AS y,
       |         CAST(0 AS BIGINT) AS d
       |  FROM lineitem),
       |${rounds.mkString(",\n")}
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       CAST(d AS BIGINT) AS hval
       |FROM r0
       |ORDER BY hval, l_orderkey, l_linenumber LIMIT 20""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_zorder_keys", zorderKeys, Some(zorderKeysSql)),
    Q("q_hilbert_keys", hilbertKeys, Some(hilbertKeysSql),
      doc = "Hilbert space-filling index via a custom codegen " +
        "Expression (compiled 16-round state walk) vs a 16-round " +
        "materialized-CTE oracle — bit-equality at corpus scale"))
}
