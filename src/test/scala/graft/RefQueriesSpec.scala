package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.operators.RefQueries

class RefQueriesSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() == 1)
  }

  test("every registered query returns rows and declared columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("flagship avg matches hand computation") {
    import spark.implicits._
    val row = RefQueries.flagship(spark, sfDir).as[(Long, String, Double, Long)]
      .head()
    // recompute the winner's average directly
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .filter(c("c_custkey") === row._1)
    val expected = joined.agg(org.apache.spark.sql.functions.avg("l_quantity"))
      .head().getDouble(0)
    assert(math.abs(BigDecimal(expected).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble - row._3) < 1e-9)
    assert(joined.count() == row._4)
  }

  test("dim joins use broadcast hash join even with auto-broadcast disabled") {
    // README.md:16-17 semantics: explicit broadcast must survive
    // autoBroadcastJoinThreshold=-1.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RefQueries.broadcastDims(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val bhj = collect(plan) { case b: BroadcastHashJoinExec => b }
      assert(bhj.size == 2, s"expected 2 broadcast joins, got:\n$plan")
      // the fact side must not shuffle for dim joins: no ShuffleExchange
      // anywhere below a broadcast join (shuffles above — for the
      // aggregation — are expected)
      bhj.foreach { j =>
        val below = collect(j.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]) {
          case e: ShuffleExchangeExec => e
        }
        assert(below.isEmpty, s"shuffle below broadcast join:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val df = RefQueries.pricingSummary(spark, sfDir)
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val txt = scans.map(_.toString).mkString("\n")
    assert(txt.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$txt")
  }
}
