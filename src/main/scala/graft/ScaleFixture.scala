package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Derived 10×-scale fixture shared by ScalingCurveSpec and
  * [[ScaleBench]] — empirical backing for the 100 TB linearity claims.
  *
  * The read-only harness fixtures stay untouched; the derived corpus
  * lands under target/. Each base document is copied into `scale`
  * shards with every word suffixed `_k` — a bijection on shingles per
  * shard, so each shard reproduces the base corpus's full
  * pairwise-Jaccard structure while shards stay disjoint in shingle
  * space (similar-statistics data shards, the shape a 10× crawl
  * actually has — NOT verbatim copies, which would plant a quadratic
  * true-duplicate pathology no blocker may legally prune). Embeddings
  * get a deterministic per-shard, per-component ±0.3% jitter: distinct
  * vectors, same distribution. Events multiply user cardinality
  * (user_id·scale + k) with per-user structure preserved and the SAME
  * calendar window — 10× rows/day, the realistic growth shape for
  * calendar-bounded monitors. The seven TPC-H-ish tables are symlinked
  * from the base so every registered query still resolves its inputs.
  */
object ScaleFixture {

  val dimTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem")

  /** Build (or reuse) the derived corpus at `dir`. A marker file keyed
    * on the base fixture's file stats plus a builder version makes an
    * in-place fixture regeneration — or a derivation change — a rebuild
    * instead of a stale read. */
  def ensure(spark: SparkSession, baseDir: String, dir: String,
             scale: Int): Unit = {
    val marker = Paths.get(dir, "_built")
    val fp = {
      val parts = Seq("documents", "embeddings", "events").map { t =>
        val f = new java.io.File(s"$baseDir/$t.parquet")
        val files = if (f.isDirectory) f.listFiles() else Array(f)
        files.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
          .sorted.mkString("|")
      }
      baseDir + "||" + parts.mkString("||") + s"|x$scale|v4"
    }
    if (Files.exists(marker) && Files.readString(marker) == fp) return
    val k = explode(sequence(lit(0), lit(scale - 1))).as("k")
    Tables.documents(spark, baseDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), k)
      .select(
        (col("doc_id") * scale + col("k")).as("doc_id"),
        concat(regexp_replace(col("text"), lit(" "),
          concat(lit("_"), col("k"), lit(" "))),
          lit("_"), col("k")).as("text"),
        col("lang"), col("source"))
      // BIGINT like the base fixture: length() returns INT, and a
      // type-mismatched derived table breaks consumers that pin the
      // harness schema (the lake's docs table hit exactly this)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, baseDir)
      .select(col("vec_id"), col("embedding"), col("label"), k)
      .select(
        (col("vec_id") * scale + col("k")).as("vec_id"),
        expr("transform(embedding, (v, j) -> CAST(v * (1.0D + " +
          "((k * 31 + j) % 7 - 3) / 1000.0D) AS FLOAT))").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables.events(spark, baseDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"), k)
      .select(
        (col("event_id") * scale + col("k")).as("event_id"),
        col("ts"),
        (col("user_id") * scale + col("k")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dimTables.foreach { t =>
      val link = Paths.get(dir, s"$t.parquet")
      // always re-point: a rebuild against a DIFFERENT base must not keep
      // links to the old one (mixed-scale corpus), and deleteIfExists
      // removes dangling links Files.exists would miss
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link,
        Paths.get(baseDir, s"$t.parquet").toAbsolutePath)
    }
    Files.createDirectories(marker.getParent)
    Files.writeString(marker, fp)
    ()
  }
}
