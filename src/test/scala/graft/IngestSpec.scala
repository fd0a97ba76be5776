package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sources.Ingest

/** CSV ingestion parity (SURVEY.md §2.1 S1–S4): header read, schema
  * inference, alias binding, validation — driven end to end through a
  * real CSV round-trip of harness data. */
class IngestSpec extends SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft_ingest").toString

  test("CSV round-trip: write nation as CSV, ingest with inference") {
    val out = s"$tmp/nation_csv"
    Tables.nation(spark, sfDir)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    val df = Ingest.loadCsv(spark, out, "nation")
    assert(df.count() == Tables.nation(spark, sfDir).count())
    // inference must recover integer-typed keys and string names
    assert(df.schema("n_nationkey").dataType == LongType ||
      df.schema("n_nationkey").dataType.typeName.startsWith("int"))
    assert(df.schema("n_name").dataType == StringType)
    // alias binding usable for join disambiguation
    assert(df.select("nation.n_name").columns.sameElements(Array("n_name")))
  }

  test("explicit schema skips inference and wins over inferred types") {
    val out = s"$tmp/region_csv"
    Tables.region(spark, sfDir)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("r_regionkey", StringType),
      org.apache.spark.sql.types.StructField("r_name", StringType)))
    val df = Ingest.loadCsv(spark, out, "region", schema = Some(schema))
    assert(df.schema("r_regionkey").dataType == StringType)
  }

  test("validation: ok, missing column, and empty relation") {
    val out = s"$tmp/nation_csv2"
    Tables.nation(spark, sfDir)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    val df = Ingest.loadCsv(spark, out, "nation")
    assert(Ingest.validate(df, "nation", Seq("n_nationkey", "n_name")).ok)
    val missing = Ingest.validate(df, "nation", Seq("n_name", "no_such_col"))
    assert(!missing.ok && missing.missingColumns == Seq("no_such_col"))
    val empty = Ingest.validate(df.limit(0), "nation")
    assert(!empty.ok && empty.isEmpty)
  }
}
