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
  *
  * Layout trade-off vs the read-mostly probe index: docs_mhidx stays
  * `partitionBy(band, nib)` because upsert/delete rewrite ONLY the hit
  * partitions (dynamic partition overwrite — the O(delta) CRUD
  * property), which bucket files wouldn't give; the price is that a
  * probe against it shuffles the index side once the batch outgrows the
  * broadcast threshold. The fingerprinted ensureMinhashIndexTable is the
  * opposite trade: `bucketBy(16, band, nib, key)`, exchange-free probes,
  * rebuild-on-change instead of in-place mutation. Pick by workload.
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
      // the corpus partitions by a doc_id hash bucket so UPSERTS rewrite
      // only touched buckets (dynamic partition overwrite), never the
      // whole corpus — the plain-parquet stand-in for Iceberg's MERGE
      withBucket(corpus).write.mode(SaveMode.Overwrite)
        .partitionBy("pbk")
        .saveAsTable(corpusTbl)
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
                  threshold: Double = NEAR_DUP_EST,
                  countCorpus: Boolean = true): AppendReport = {
    val corpusTbl = s"$db.docs_corpus"
    val idxTbl = s"$db.docs_mhidx"
    // the census is the only corpus-wide work in an append; a
    // high-frequency caller (the streaming sink) opts out and reports -1
    val before = if (countCorpus) spark.table(corpusTbl).count() else -1L
    val nBatch = batch.count()
    val dupIds = Dedup.probeMinhashIndex(spark.table(idxTbl), withShingles(batch))
      .filter(col("est_jac") >= threshold)
      .select(col("b_doc").as("doc_id"))
      .distinct()
    // materialize the probe's verdict ONCE: `novel` feeds two writes
    // (corpus + index), which would otherwise re-execute the whole
    // probe join per write
    val novel = batch.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nNovel = novel.count()
    // append in the target tables' own column order (insertInto is
    // positional; partition columns sit last in the table schema)
    withBucket(novel).select(spark.table(corpusTbl).columns.map(col): _*)
      .write.mode(SaveMode.Append).insertInto(corpusTbl)
    Dedup.minhashBandRows(withShingles(novel), cap = None)
      .select(spark.table(idxTbl).columns.map(col): _*)
      .write.mode(SaveMode.Append).insertInto(idxTbl)
    // after-count is arithmetic, not a second corpus scan
    applySummaryDelta(spark, db, plus = Some(novel), minus = None)
    AppendReport(nBatch, nBatch - nNovel, nNovel, before,
      if (countCorpus) before + nNovel else -1L)
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
  /** Corpus small-file compaction (the OPTIMIZE pass): every append adds
    * a file per touched bucket, so a long-lived lake accumulates
    * file-per-batch fragmentation — the classic small-files problem that
    * throttles scan throughput at 100 TB (task-per-file scheduling, no
    * sequential reads). Buckets holding more than `maxFiles` files are
    * rewritten as a single file each via dynamic partition overwrite;
    * buckets already compact are untouched (their files keep their
    * identity — spec-fingerprinted). Returns the number of buckets
    * rewritten. */
  def compactCorpus(spark: SparkSession, db: String = "graft_lake",
                    maxFiles: Int = 4): Long = {
    val corpusTbl = s"$db.docs_corpus"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val tableDir = Paths.get(warehouse, s"$db.db", "docs_corpus")
    val overFull: Seq[Int] = {
      val s = Files.list(tableDir)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("pbk="))
        .filter { p =>
          val f = Files.list(p)
          try f.toArray.count(q => q.toString.endsWith(".parquet")) > maxFiles
          finally f.close()
        }
        .map(_.getFileName.toString.stripPrefix("pbk=").toInt).toSeq
      finally s.close()
    }
    if (overFull.nonEmpty) {
      val cols = spark.table(corpusTbl).columns
      val rewritten = spark.table(corpusTbl)
        .filter(col("pbk").isin(overFull.map(Int.box): _*))
        .repartition(col("pbk"))
        .select(cols.map(col): _*)
        .localCheckpoint()
      withDynamicOverwrite(spark) {
        rewritten.write.mode(SaveMode.Overwrite).insertInto(corpusTbl)
      }
    }
    overFull.length.toLong
  }

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

  final case class UpsertReport(
      nUpserts: Long, nUpdated: Long, nInserted: Long,
      corpusBucketsRewritten: Long, idxPartsRewritten: Long,
      idxPartsDropped: Long)

  /** Upsert a batch of documents by doc_id — the MERGE INTO the
    * reference's Iceberg DDL implies (`job1:223-275` declares merge-able
    * tables but every job write is a full overwrite), expressed on plain
    * partitioned parquet via DYNAMIC partition overwrite:
    *
    *  - corpus: only the hash buckets containing an upserted doc are
    *    rewritten (remaining rows of each touched bucket ∪ the upserts);
    *    untouched buckets' files are never read or written.
    *  - index: only the (band, nib) partitions holding an updated doc's
    *    OLD band rows — or receiving new ones — are rewritten, so stale
    *    signatures can never produce false near-dup hits against
    *    replaced text. A touched partition whose rows all belonged to
    *    updated docs receives no new data, which dynamic overwrite would
    *    silently SKIP (the classic stale-partition pitfall); those are
    *    dropped explicitly.
    *
    * At 100 TB the rewrite cost is O(touched partitions), not O(corpus):
    * the update path reads back only the buckets/partitions it replaces. */
  def upsertDocuments(spark: SparkSession, updates: DataFrame,
                      db: String = "graft_lake"): UpsertReport = {
    val corpusTbl = s"$db.docs_corpus"
    val idxTbl = s"$db.docs_mhidx"
    val up = withBucket(updates).localCheckpoint()
    val nUp = up.count()
    val upIds = up.select("doc_id")

    // ---- corpus: rewrite only the touched buckets -----------------------
    // touched-partition values collect to the driver (≤ N_BUCKETS ints)
    // and re-enter as literal `isin` filters: a semi-JOIN on a partition
    // column does not statically prune the scan, a literal filter does
    // (PartitionFilters) — the whole point of the targeted rewrite
    val bucketVals = up.select("pbk").distinct().collect().map(_.getInt(0))
    val corpusCols = spark.table(corpusTbl).columns
    val keep = spark.table(corpusTbl)
      .filter(col("pbk").isin(bucketVals.map(Int.box): _*))
      .join(upIds, Seq("doc_id"), "left_anti")
    val newCorpusRows = keep.select(corpusCols.map(col): _*)
      .unionByName(up.select(corpusCols.map(col): _*))
      .localCheckpoint()
    val nBuckets = bucketVals.length.toLong

    // ---- index: rewrite the partitions holding old rows or gaining new --
    val oldRows = spark.table(idxTbl)
      .join(upIds, Seq("doc_id"), "left_semi")
    val newBandRows = Dedup.minhashBandRows(withShingles(up), cap = None)
    val affected = oldRows.select("band", "nib")
      .union(newBandRows.select("band", "nib")).distinct()
      .localCheckpoint()
    // ≤ BANDS × 16 pairs: coarse literal per-column pruning at the scan,
    // the broadcast semi-join refines to the exact (band, nib) set
    val affectedPairs = affected.collect().map(r => (r.getInt(0), r.getString(1)))
    val idxCols = spark.table(idxTbl).columns
    val newIdxRows = spark.table(idxTbl)
      .filter(col("band").isin(affectedPairs.map(p => Int.box(p._1)).distinct: _*) &&
        col("nib").isin(affectedPairs.map(_._2).distinct: _*))
      .join(broadcast(affected), Seq("band", "nib"), "left_semi")
      .join(upIds, Seq("doc_id"), "left_anti")
      .select(idxCols.map(col): _*)
      .unionByName(newBandRows.select(idxCols.map(col): _*))
      .localCheckpoint()
    // retraction rows for the summary delta, captured BEFORE the
    // overwrite; also gives the updated-vs-inserted split without a
    // corpus-wide scan (an update's doc lives in a touched bucket by
    // definition, so the bucket-pruned read sees every one)
    val retracted = spark.table(corpusTbl)
      .filter(col("pbk").isin(bucketVals.map(Int.box): _*))
      .join(upIds, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nUpdated = retracted.count()

    withDynamicOverwrite(spark) {
      newCorpusRows.write.mode(SaveMode.Overwrite).insertInto(corpusTbl)
      newIdxRows.write.mode(SaveMode.Overwrite).insertInto(idxTbl)
    }
    applySummaryDelta(spark, db, plus = Some(up), minus = Some(retracted))

    // partitions whose every row belonged to an updated doc got no new
    // data — dynamic overwrite skipped them; drop the stale dirs
    val written = newIdxRows.select("band", "nib").distinct()
    val empties = affected.except(written).collect()
    empties.foreach { r =>
      spark.sql(s"ALTER TABLE $idxTbl DROP IF EXISTS PARTITION " +
        s"(band=${r.getInt(0)}, nib='${r.getString(1)}')")
    }
    UpsertReport(nUp, nUpdated, nUp - nUpdated, nBuckets,
      affected.count() - empties.length, empties.length.toLong)
  }

  final case class DeleteReport(
      nRequested: Long, nDeleted: Long, corpusBucketsRewritten: Long,
      corpusBucketsDropped: Long, idxPartsRewritten: Long,
      idxPartsDropped: Long)

  /** Delete documents by id — the GDPR/takedown path, completing the
    * lake's CRUD story (seed → append → upsert → delete → compact) on
    * plain partitioned parquet. Same targeted-rewrite discipline as
    * [[upsertDocuments]]: only the corpus buckets and index (band, nib)
    * partitions that actually hold a deleted doc are read and rewritten
    * (literal partition filters at the scan), and partitions emptied by
    * the delete are dropped explicitly rather than left stale by
    * dynamic overwrite. Cost at 100 TB: O(partitions hit), not O(corpus). */
  def deleteDocuments(spark: SparkSession, ids: DataFrame,
                      db: String = "graft_lake"): DeleteReport = {
    val corpusTbl = s"$db.docs_corpus"
    val idxTbl = s"$db.docs_mhidx"
    val delIds = ids.select("doc_id").distinct().localCheckpoint()
    val nRequested = delIds.count()

    // full rows so the summary delta can retract them after the rewrite
    val hit = spark.table(corpusTbl)
      .join(delIds, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nDeleted = hit.count()
    val bucketVals = hit.select("pbk").distinct().collect().map(_.getInt(0))
    val corpusCols = spark.table(corpusTbl).columns
    val newCorpusRows = spark.table(corpusTbl)
      .filter(col("pbk").isin(bucketVals.map(Int.box): _*))
      .join(delIds, Seq("doc_id"), "left_anti")
      .select(corpusCols.map(col): _*)
      .localCheckpoint()

    val affected = spark.table(idxTbl)
      .join(delIds, Seq("doc_id"), "left_semi")
      .select("band", "nib").distinct().localCheckpoint()
    val affectedPairs = affected.collect().map(r => (r.getInt(0), r.getString(1)))
    val idxCols = spark.table(idxTbl).columns
    val newIdxRows = spark.table(idxTbl)
      .filter(col("band").isin(affectedPairs.map(p => Int.box(p._1)).distinct: _*) &&
        col("nib").isin(affectedPairs.map(_._2).distinct: _*))
      .join(broadcast(affected), Seq("band", "nib"), "left_semi")
      .join(delIds, Seq("doc_id"), "left_anti")
      .select(idxCols.map(col): _*)
      .localCheckpoint()

    withDynamicOverwrite(spark) {
      newCorpusRows.write.mode(SaveMode.Overwrite).insertInto(corpusTbl)
      newIdxRows.write.mode(SaveMode.Overwrite).insertInto(idxTbl)
    }
    val writtenBuckets = newCorpusRows.select("pbk").distinct()
      .collect().map(_.getInt(0)).toSet
    val emptyBuckets = bucketVals.filterNot(writtenBuckets)
    emptyBuckets.foreach { b =>
      spark.sql(s"ALTER TABLE $corpusTbl DROP IF EXISTS PARTITION (pbk=$b)")
    }
    val writtenParts = newIdxRows.select("band", "nib").distinct()
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val emptyParts = affectedPairs.filterNot(writtenParts)
    emptyParts.foreach { case (b, n) =>
      spark.sql(s"ALTER TABLE $idxTbl DROP IF EXISTS PARTITION " +
        s"(band=$b, nib='$n')")
    }
    applySummaryDelta(spark, db, plus = None, minus = Some(hit))
    DeleteReport(nRequested, nDeleted,
      bucketVals.length.toLong - emptyBuckets.length,
      emptyBuckets.length.toLong,
      affectedPairs.length.toLong - emptyParts.length,
      emptyParts.length.toLong)
  }

  /** Incremental materialized aggregate: a per-(source, lang) census of
    * the corpus (docs + tokens), maintained by DELTAS through every CRUD
    * op — appends add their novel rows' aggregate, upserts retract the
    * replaced rows and add the new ones, deletes retract. The corpus is
    * aggregated exactly once (here, at ensure time); afterwards the
    * summary stays consistent without ever rescanning it — the
    * incremental-view-maintenance shape that makes a 100 TB lake's
    * dashboards affordable. Additive aggregates only (count/sum), which
    * is what makes exact retraction possible. */
  def ensureSummary(spark: SparkSession, db: String = "graft_lake"): Unit = {
    val sumTbl = s"$db.docs_summary"
    if (!spark.catalog.tableExists(sumTbl)) {
      dropStale(spark, db, "docs_summary")
      summaryAgg(spark.table(s"$db.docs_corpus"), sign = 1L)
        .write.mode(SaveMode.Overwrite).saveAsTable(sumTbl)
    }
  }

  private def summaryAgg(docs: DataFrame, sign: Long): DataFrame =
    docs.groupBy("source", "lang")
      .agg((count(lit(1)) * sign).as("n_docs"),
        (sum(size(split(col("text"), " ")).cast("long")) * sign).as("n_tokens"))

  /** Fold a CRUD op's row deltas into the summary (no-op until
    * [[ensureSummary]] has been called). The summary is group-cardinality
    * sized, so the merge rewrite is metadata-scale — the corpus itself is
    * never touched. */
  private def applySummaryDelta(spark: SparkSession, db: String,
                                plus: Option[DataFrame],
                                minus: Option[DataFrame]): Unit = {
    val sumTbl = s"$db.docs_summary"
    if (spark.catalog.tableExists(sumTbl)) {
      val deltas =
        plus.map(summaryAgg(_, sign = 1L)).toSeq ++
          minus.map(summaryAgg(_, sign = -1L)).toSeq
      val merged = deltas
        .foldLeft(spark.table(sumTbl))(_ unionByName _)
        .groupBy("source", "lang")
        .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
        .filter(col("n_docs") > 0)
        .localCheckpoint()
      merged.write.mode(SaveMode.Overwrite).insertInto(sumTbl)
    }
  }

  private def withDynamicOverwrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Corpus-side partition bucket: doc_id-hash partition column so
    * point-ish rewrites (upserts) touch O(buckets-hit) files. */
  private val N_BUCKETS = 16

  private def withBucket(docs: DataFrame): DataFrame =
    docs.withColumn("pbk", pmod(col("doc_id"), lit(N_BUCKETS)).cast("int"))

  /** Drop the job's tables and their on-disk locations — test harness
    * reset (an in-memory catalog forgets tables across JVMs but their
    * files survive; same repair as [[IngestJob]]). */
  def reset(spark: SparkSession, db: String): Unit =
    Seq("docs_corpus", "docs_mhidx", "docs_summary").foreach { t =>
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
