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

  test("quarantine ingest splits clean rows from raw rejects in one pass") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quarantine")
    val f = dir.resolve("batch.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "good row one"}""",
      """{"doc_id": 2, "text": "good row two"}""",
      """{"doc_id": "THIS IS NOT A NUMBER", "text": "type-broken row"}""",
      """{"doc_id": 3, "text": "unterminated""",
      """{"doc_id": 4, "text": "good row three"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, rejects) = Ingest.loadJsonWithQuarantine(
      spark, dir.toString, schema)
    assert(clean.count() == 3, "three well-formed rows must land")
    assert(clean.columns.toSeq == Seq("doc_id", "text"),
      "corrupt column must not leak into the clean frame")
    val raw = rejects.collect().map(_.getString(0))
    assert(raw.length == 2, s"both bad lines must quarantine: ${raw.toSeq}")
    assert(raw.exists(_.contains("THIS IS NOT A NUMBER")) &&
      raw.exists(_.contains("unterminated")),
      "quarantine must preserve the original raw lines for replay")
  }
}
