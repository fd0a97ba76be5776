package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond parquet+CSV: JSON and ORC round-trips
  * of harness data (SURVEY.md §2.1 — a complete engine reads and writes
  * the formats a lakehouse actually contains). Avro is absent from
  * /opt/spark/jars (no spark-avro datasource), so it is out of scope. */
class FormatsSpec extends SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft_formats").toString
  private def sample = Tables.nation(spark, sfDir)

  test("JSON round-trip preserves rows (schema re-read with explicit types)") {
    val out = s"$tmp/nation_json"
    sample.write.mode(SaveMode.Overwrite).json(out)
    // JSON is schemaless on disk: supply the schema on read (the
    // production pattern; inference is a bootstrap-only convenience)
    val back = spark.read.schema(sample.schema).json(out)
    assert(back.count() == sample.count())
    assert(back.schema == sample.schema)
    assert(back.except(sample).isEmpty && sample.except(back).isEmpty)
  }

  test("ORC round-trip preserves rows and types, with predicate pushdown") {
    val out = s"$tmp/lineitem_orc"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode(SaveMode.Overwrite).orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == li.count())
    assert(back.schema == li.schema)
    val filtered = back.filter(col("l_returnflag") === "R")
    val scanTxt = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanTxt.contains("PushedFilters") &&
      scanTxt.contains("EqualTo(l_returnflag,R)"),
      s"ORC scan did not push the filter:\n$scanTxt")
    assert(filtered.count() ==
      Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R").count())
  }
}
