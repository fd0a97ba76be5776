package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Same-data multi-split twin of a base fixture: every table re-sharded
  * into [[ScaleFixture.OUT_PARTS]] part files under target/, rows and
  * values identical to the base (round-robin repartition only — the
  * fleet-wide PartitionInvarianceSpec is the contract that results don't
  * move).
  *
  * Why it exists (VERDICT r14 #5): every base sf fixture is ONE parquet
  * row group, so every scan stage plans 1-3 tasks and the 8-vs-32-core
  * scaling leg measured nothing but per-stage fixed latency — ratios ≈ 1
  * fleet-wide, indistinguishable from "nothing parallelizes". On a
  * ≥32-file fixture the scan width is real, the Par.* guards never fire
  * (planned partitions ≥ cores — the production posture), and the
  * core-count ratio measures the plans. Opt-in via
  * `SPARK_GRAFT_MULTISPLIT=1` on [[Bench]]; the driver never sets it,
  * so the contract bench is untouched.
  *
  * events is written through [[Tables.events]], i.e. with the normalized
  * µs TimestampType column — every consumer reads it through the same
  * loader, which passes an already-TimestampType column through
  * unchanged. The scaling leg is bench-only; the DuckDB oracle keeps
  * running against the base fixtures.
  */
object ShardFixture {
  /** Bump on any derivation change (forces a rebuild). */
  val VER = "v1"

  /** Build (or reuse) the re-sharded twin of `baseDir`; returns its
    * path. Marker-keyed on the base tables' file stats + [[VER]], the
    * [[ScaleFixture]] lifecycle. */
  def ensure(spark: SparkSession, baseDir: String): String = {
    val parts = ScaleFixture.OUT_PARTS
    val tag = baseDir.replaceAll("[^a-zA-Z0-9.]", "_").stripPrefix("_")
    val dir = s"target/shard${parts}_$tag"
    val marker = Paths.get(dir, "_built")
    val fp = ScaleFixture.fingerprint(baseDir, Tables.names, 1,
      s"|shard$VER")
    if (Files.exists(marker) && Files.readString(marker) == fp) return dir
    Tables.names.foreach { t =>
      val df =
        if (t == "events") Tables.events(spark, baseDir)
        else Tables.t(spark, baseDir, t)
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    Files.writeString(marker, fp)
    dir
  }
}
