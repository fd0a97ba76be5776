package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Append-mode document ingestion — the job the reference cannot express:
  * every reference write is a full-table overwrite
  * (`job1-DDL_Load_Data_Spark_Iceberg.py:295,305,315,325,335`), so a lake
  * user appending a daily batch would re-load and re-dedup the whole
  * corpus. This job composes the incremental machinery instead:
  *
  *  1. SEED (first run only): write the corpus table and its MinHash band
  *     index — the single time the corpus is shingled.
  *  2. APPEND (every run): probe the new batch against the index
  *     ([[Dedup.probeMinhashIndex]] — signature-estimated Jaccard, no
  *     corpus text touched), drop batch docs with a near-dup already in
  *     the lake (exact duplicates score est_jac = 1.0 and are subsumed),
  *     append only the novel docs to the corpus table, and append THEIR
  *     band rows to the index so the next batch dedups against them.
  *
  * The job is idempotent: re-appending the same batch finds every doc
  * self-matched in the index (est 1.0) and appends nothing. Work per
  * append is O(batch + matched index buckets) — the corpus is never
  * rescanned (spec-asserted via the probe's plan in PlanShapeSpec's
  * incremental test; this job reuses that exact probe).
  *
  * The job owns its tables (`<db>.docs_corpus`, `<db>.docs_mhidx`) rather
  * than sharing [[Dedup.ensureMinhashIndexTable]]'s fingerprinted table:
  * an append MUTATES the index, and the registered q_dedup_incremental
  * query's oracle assumes a pristine one.
  */
object AppendJob {

  final case class AppendReport(
      nBatch: Long, nDup: Long, nAppended: Long,
      corpusBefore: Long, corpusAfter: Long)

  /** Near-dup decision threshold on signature-estimated Jaccard. */
  val NEAR_DUP_EST = 0.5

  /** Seed the lake if absent: write the corpus table and its MinHash band
    * index — the single time the corpus is shingled. */
  def seed(spark: SparkSession, corpus: DataFrame,
           db: String = "graft_lake"): Unit = {
    val corpusTbl = s"$db.docs_corpus"
    val idxTbl = s"$db.docs_mhidx"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!spark.catalog.tableExists(corpusTbl)) {
      dropStale(spark, db, "docs_corpus")
      dropStale(spark, db, "docs_mhidx")
      corpus.write.mode(SaveMode.Overwrite).saveAsTable(corpusTbl)
      // the one full shingle pass over the corpus, paid at seed time
      Dedup.minhashBandRows(withShingles(corpus), cap = Some(Dedup.BUCKET_CAP))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("band", "nib")
        .saveAsTable(idxTbl)
    }
  }

  /** Probe-and-append one batch DataFrame against the seeded lake: drop
    * batch docs with a near-dup already indexed, append the novel rest to
    * the corpus, extend the index with their band rows. This is the unit
    * of work shared by the batch job ([[appendDocuments]]) and the
    * streaming sink ([[graft.streaming.StreamOps.nearDupAppendSink]] runs
    * it per micro-batch via foreachBatch). */
  def appendBatch(spark: SparkSession, batch: DataFrame,
                  db: String = "graft_lake",
                  threshold: Double = NEAR_DUP_EST): AppendReport = {
    val corpusTbl = s"$db.docs_corpus"
    val idxTbl = s"$db.docs_mhidx"
    val before = spark.table(corpusTbl).count()
    val nBatch = batch.count()
    val dupIds = Dedup.probeMinhashIndex(spark.table(idxTbl), withShingles(batch))
      .filter(col("est_jac") >= threshold)
      .select(col("b_doc").as("doc_id"))
      .distinct()
    val novel = batch.join(dupIds, Seq("doc_id"), "left_anti")
    // append in the target tables' own column order (insertInto is
    // positional; partition columns sit last in the table schema)
    novel.select(spark.table(corpusTbl).columns.map(col): _*)
      .write.mode(SaveMode.Append).insertInto(corpusTbl)
    Dedup.minhashBandRows(withShingles(novel), cap = None)
      .select(spark.table(idxTbl).columns.map(col): _*)
      .write.mode(SaveMode.Append).insertInto(idxTbl)
    val after = spark.table(corpusTbl).count()
    AppendReport(nBatch, nBatch - (after - before), after - before,
      before, after)
  }

  /** Seed (if needed) then append the batch; returns the append census. */
  def appendDocuments(spark: SparkSession, dir: String,
                      db: String = "graft_lake",
                      threshold: Double = NEAR_DUP_EST): AppendReport = {
    seed(spark, Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(Dedup.BATCH_MOD)) =!= Dedup.BATCH_REM), db)
    appendBatch(spark, Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(Dedup.BATCH_MOD)) === Dedup.BATCH_REM),
      db, threshold)
  }

  /** Index compaction — the maintenance pass that pairs with append:
    * appends extend band buckets UNCAPPED (re-evaluating the hot-bucket
    * cap across old+new rows on every append would rescan the index), so
    * after a run of appends some buckets may exceed [[Dedup.BUCKET_CAP]].
    * Compaction rewrites the index keeping only within-cap buckets —
    * restoring the probe-cost bound — and returns how many buckets it
    * dropped. The rewrite materializes via localCheckpoint before
    * overwriting, so the read never races its own overwrite. */
  def compactIndex(spark: SparkSession, db: String = "graft_lake",
                   cap: Long = Dedup.BUCKET_CAP): Long = {
    val idxTbl = s"$db.docs_mhidx"
    val cols = spark.table(idxTbl).columns
    val sizes = spark.table(idxTbl).groupBy("band", "key")
      .agg(count(lit(1)).as("bn"))
      .localCheckpoint()
    val dropped = sizes.filter(col("bn") > cap).count()
    if (dropped > 0) {
      val keep = sizes.filter(col("bn") <= cap).select("band", "key")
      val compacted = spark.table(idxTbl)
        .join(keep, Seq("band", "key"))
        .select(cols.map(col): _*)
        .localCheckpoint()
      dropStale(spark, db, "docs_mhidx")
      compacted.write.mode(SaveMode.Overwrite)
        .partitionBy("band", "nib")
        .saveAsTable(idxTbl)
    }
    dropped
  }

  /** Drop the job's tables and their on-disk locations — test harness
    * reset (an in-memory catalog forgets tables across JVMs but their
    * files survive; same repair as [[IngestJob]]). */
  def reset(spark: SparkSession, db: String): Unit =
    Seq("docs_corpus", "docs_mhidx").foreach { t =>
      if (spark.catalog.databaseExists(db)) dropStale(spark, db, t)
    }

  private def withShingles(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("toks", graft.functions.TextFns.tokens(col("text")))
      .withColumn("sh", array_distinct(expr("word_shingles(toks, 3)")))
      .select("doc_id", "sh")
  }

  private def dropStale(spark: SparkSession, db: String, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    val loc = Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      s"$db.db", table)
    if (Files.exists(loc)) {
      val s = Files.walk(loc)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.delete(_))
      finally s.close()
    }
  }
}
