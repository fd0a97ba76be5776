package graft

import org.apache.spark.sql.types.TimestampType

/** Fixture-drift tripwire. The driver regenerates /root/testdata between
  * rounds and has already shipped events.ts in two encodings
  * (TIMESTAMP(NANOS) → timestamp[us]-no-tz); the round-5 regeneration broke
  * eight event-time queries silently until driver-verify time. This suite
  * pins the loader CONTRACT — not the on-disk encoding — so the next
  * regeneration fails here, in CI, with a named cause.
  */
class FixtureContractSpec extends SparkTestBase {

  test("events.ts loads as session-tz TimestampType for every fixture on disk") {
    val roots = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
    assert(roots.nonEmpty, "no /root/testdata/sf* fixtures found")
    roots.foreach { root =>
      val dt = Tables.events(spark, root.getPath).schema("ts").dataType
      assert(dt == TimestampType,
        s"${root.getName}: events.ts loaded as $dt — Tables.loadEvents needs a " +
          "branch for this fixture encoding (see its scaladoc)")
    }
  }

  test("epoch-micros arithmetic analyzes and executes over the loaded events") {
    // unix_micros + cast-to-double are the two patterns the event-time
    // family uses; both reject TIMESTAMP_NTZ, so exercising them here
    // catches an encoding drift before the full Verify run does.
    val row = Tables.events(spark, sfDir)
      .selectExpr("max(unix_micros(ts)) as us", "max(cast(ts as double)) as s")
      .head()
    assert(row.getLong(0) > 0L)
    assert(row.getDouble(1) > 0d)
  }

  test("streaming file source agrees with the batch loader on ts") {
    val batchMax = Tables.events(spark, sfDir)
      .selectExpr("max(unix_micros(ts))").head().getLong(0)
    val stream = graft.streaming.StreamOps.eventsFileStream(spark, sfDir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    // Same normalization, batch-executed: read with the stream's sniffed
    // schema+transform but via the batch reader to compare values.
    val q = stream.selectExpr("unix_micros(ts) as us")
      .writeStream.format("memory").queryName("fixture_contract_ts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamMax = spark.table("fixture_contract_ts")
      .selectExpr("max(us)").head().getLong(0)
    assert(streamMax == batchMax,
      s"stream ts ($streamMax) != batch ts ($batchMax) — normalization drift")
  }
}
