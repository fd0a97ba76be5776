package graft

import org.apache.spark.sql.types._

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

  // ---- documents / embeddings loader contracts (VERDICT r6 #7) ----
  // The dedup / text-analysis / similarity fleets assume these exact dtypes
  // (e.g. 1e-6 fixed-point arithmetic on FloatType components, BIGINT ids in
  // shuffle keys). A fixture regeneration that retypes any of them must fail
  // HERE with the drifted table.column named, not at driver-verify time.

  private def fixtureRoots: Array[java.io.File] = {
    val roots = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
    assert(roots.nonEmpty, "no /root/testdata/sf* fixtures found")
    roots
  }

  test("documents columns keep the pinned loader contract on every fixture") {
    val want = Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    fixtureRoots.foreach { root =>
      val schema = Tables.documents(spark, root.getPath).schema
      want.foreach { case (c, dt) =>
        assert(schema.fieldNames.contains(c),
          s"${root.getName}: documents.$c missing — fixture drifted")
        assert(schema(c).dataType == dt,
          s"${root.getName}: documents.$c loaded as ${schema(c).dataType}, " +
            s"contract is $dt — add a normalizing branch in Tables (cf. loadEvents)")
      }
    }
  }

  test("embeddings columns keep the pinned loader contract on every fixture") {
    fixtureRoots.foreach { root =>
      val schema = Tables.embeddings(spark, root.getPath).schema
      assert(schema("vec_id").dataType == LongType,
        s"${root.getName}: embeddings.vec_id is ${schema("vec_id").dataType}, not BIGINT")
      assert(schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
             schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
        s"${root.getName}: embeddings.embedding is ${schema("embedding").dataType}, " +
          "contract is array<float> — 1e-6 fixed-point paths assume Float components")
      assert(schema("label").dataType == IntegerType,
        s"${root.getName}: embeddings.label is ${schema("label").dataType}, not INT")
    }
  }

  test("embedding vectors are uniformly 64-dimensional on every fixture") {
    // Similarity pins DIM=64 (LSH hyperplanes, IVF centroids, codegen dot
    // products all size to it); a regenerated fixture with a new DIM must
    // trip here, not as silently-wrong cosine scores.
    fixtureRoots.foreach { root =>
      val row = Tables.embeddings(spark, root.getPath)
        .selectExpr("min(size(embedding)) as lo", "max(size(embedding)) as hi")
        .head()
      assert(row.getInt(0) == 64 && row.getInt(1) == 64,
        s"${root.getName}: embedding dims span [${row.getInt(0)}, ${row.getInt(1)}], " +
          "contract is uniformly 64 (Similarity.DIM)")
    }
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
