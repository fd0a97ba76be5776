package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Data-profiling operators a lake operator runs before trusting a table:
  * value-distribution histograms and key-skew detection. Both are the
  * diagnostic half of the scale story — the skew profile is exactly what
  * decides whether a join needs salting or an AQE skew split, and the
  * histogram is the input to range-partitioning and z-order bucket
  * boundaries ([[Layout]]).
  *
  * Scale posture: each is one scan plus aggregate-cardinality shuffles —
  * per-bin / per-key counts, never rows. The scalar bounds frame (1 row)
  * broadcasts back onto the aggregate, not onto the scan.
  */
object Profiling {

  private val N_BINS = 16
  private val TOP_KEYS = 20

  /** Equi-width histogram of lineitem.l_extendedprice: two aggregation
    * passes (global min/max, then per-bin counts) — the classic shape at
    * any scale, since bin boundaries cannot be known before the bounds
    * are. The bounds are a 1-row broadcast; the per-row bin id is computed
    * inside the scan stage, so the only shuffle is the 16-row bin
    * aggregate. Values exactly at the max land in the last bin (the
    * standard closed-top convention). */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_extendedprice")
    val bounds = li.agg(min("l_extendedprice").as("lo"),
      max("l_extendedprice").as("hi"))
    val w = (col("hi") - col("lo")) / lit(N_BINS.toDouble)
    li.join(broadcast(bounds))
      .select(least(floor((col("l_extendedprice") - col("lo")) / w),
        lit((N_BINS - 1).toDouble)).cast("int").as("bin"),
        col("lo"), col("hi"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_items"),
        // 4-dp rounding via floor(x·1e4 + 0.5)/1e4 — pure IEEE arithmetic,
        // bit-identical across engines. round() is NOT: Spark rounds the
        // shortest decimal repr (BigDecimal HALF_UP) while DuckDB rounds
        // the binary double, and a bin boundary landing on a .00005 tie
        // flips the 4th decimal between them.
        (floor((first(col("lo")) + col("bin") *
          first((col("hi") - col("lo")) / lit(N_BINS.toDouble))) * lit(10000.0) + lit(0.5))
          / lit(10000.0)).as("bin_lo"))
      .select(col("bin"), col("bin_lo"), col("n_items"))
      .orderBy("bin")
  }

  private val histogramSql =
    s"""WITH b AS (
       |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
       |  FROM lineitem),
       |binned AS (
       |  SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / ${N_BINS}.0)),
       |                    ${N_BINS - 1}.0) AS INTEGER) AS bin,
       |         lo, hi
       |  FROM lineitem, b)
       |SELECT bin,
       |       floor((min(lo) + bin * min((hi - lo) / ${N_BINS}.0)) * 10000.0 + 0.5)
       |         / 10000.0 AS bin_lo,
       |       count(*) AS n_items
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  /** Key-skew profile of lineitem.l_partkey: the top-$TOP_KEYS heaviest
    * join keys with their share of all rows and their skew factor (count
    * over the mean per-key count). A skew factor ≫ 1 on a join key is the
    * signal that a plain hash join will strand its reducers — the number
    * this profile exists to surface before a 100 TB join is planned. One
    * scan; the shuffles carry (key, count) pairs and one stats row. */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(s, dir)
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val stats = perKey.agg(count(lit(1)).as("n_keys"),
      sum("cnt").as("total"))
    perKey.join(broadcast(stats))
      .select(col("l_partkey"), col("cnt"),
        round(col("cnt") / col("total"), 4).as("share"),
        round(col("cnt") / (col("total") / col("n_keys")), 4).as("skew"))
      .orderBy(col("cnt").desc, col("l_partkey").asc)
      .limit(TOP_KEYS)
  }

  private val skewProfileSql =
    s"""WITH k AS (
       |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
       |st AS (SELECT count(*) AS n_keys, sum(cnt) AS total FROM k)
       |SELECT l_partkey, cnt,
       |       round(cnt / CAST(total AS DOUBLE), 4) AS share,
       |       round(cnt / (CAST(total AS DOUBLE) / n_keys), 4) AS skew
       |FROM k, st
       |ORDER BY cnt DESC, l_partkey LIMIT $TOP_KEYS""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_histogram", histogram, Some(histogramSql)),
    Q("q_skew_profile", skewProfile, Some(skewProfileSql)))
}
