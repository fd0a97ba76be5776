package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The r14 scale-adaptive fan-out helper + the operator rewrites that
  * ride it: semantics must be exchange-invariant, and the guard must be
  * inert when the plan is already at least machine-wide. */
class ParSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("fan/fanKey preserve the row multiset") {
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val a = df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = Par.fan(df).collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val c = Par.fanKey(df, col("o_orderkey")).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(b == a); assert(c == a)
  }

  test("fan fires on a below-cores plan and is inert at/above cores") {
    val cores = spark.sparkContext.defaultParallelism
    val narrow = spark.range(100).repartition(1).toDF("id")
    assert(Par.fan(narrow).rdd.getNumPartitions == cores)
    val wide = spark.range(100).repartition(cores + 4).toDF("id")
    // inert: no new exchange above the existing repartition
    val plan = Par.fan(wide).queryExecution.optimizedPlan
    assert(Par.fan(wide).rdd.getNumPartitions == cores + 4,
      s"guard must not re-partition an already-wide plan:\n$plan")
  }

  test("approx-distinct pair decomposition matches the direct sketch form") {
    // HLL is duplicate-insensitive: the contract query's est over deduped
    // (flag, partkey) pairs must equal the plain form's est over raw rows
    val direct = operators.Breadth.approxDistinct(spark, sfDir)
      .select("l_returnflag", "approx_parts", "n").collect().map(_.toSeq)
    val viaPairs = operators.Breadth.approxDistinctContract(spark, sfDir)
      .collect().map(r => Seq(r.getString(0), r.getLong(2))) // flag, n
    val directN = direct.map(r => Seq(r(0), r(2)))
    assert(viaPairs.toSeq == directN.toSeq,
      "pair-dedup n census diverged from the direct count")
    val est = operators.Breadth.approxDistinctContract(spark, sfDir)
      .collect().map(_.getBoolean(3))
    assert(est.forall(identity), "sketch left the ±5% contract band")
  }

  test("columnProfile unpivot decomposition equals the wide-aggregate form") {
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, sfDir)
    val expected = cols.map { c =>
      val r = li.agg(count(col(c)).cast("long").as("nv"),
        countDistinct(col(c)).as("nd"),
        round(min(col(c)), 4).as("mn"), round(max(col(c)), 4).as("mx"),
        count(lit(1)).as("n")).collect()(0)
      (c, r.getLong(0), r.getLong(4) - r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))
    }
    val got = operators.Curation.columnProfile(spark, sfDir).as[
      (String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected.sortBy(_._1))
  }

  test("no exchange carries per-PAIR sketch state (the r14 decomposition's point)") {
    // the flag-level merge exchange legitimately carries HLL register
    // words, but only |flags|×tasks rows of them; the defect the
    // decomposition kills is sketch state on rows KEYED BY the distinct
    // column (one 413-word row per (flag, partkey) pair)
    val df = operators.Breadth.approxDistinctContract(spark, sfDir)
    df.collect()
    val bad = collect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec
        if e.output.exists(_.name == "l_partkey") &&
          e.output.exists(_.name.startsWith("MS[")) => e
    }
    assert(bad.isEmpty,
      s"per-pair sketch state crossed an exchange again: $bad")
  }
}
