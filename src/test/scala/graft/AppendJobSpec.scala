package graft

import org.apache.spark.sql.functions._

import graft.sources.AppendJob

/** The append-mode ingestion composition: seed → probe → append-novel →
  * extend-index. Census arithmetic, idempotency (the property overwrite-
  * only ingestion cannot have), and index extension are all asserted on
  * the real fixture. */
class AppendJobSpec extends SparkTestBase {

  private val db = "graft_lake_test"

  test("append lands only novel docs and is idempotent on re-append") {
    AppendJob.reset(spark, db)
    val r1 = AppendJob.appendDocuments(spark, sfDir, db)
    assert(r1.nBatch > 0, "fixture batch must be non-empty")
    assert(r1.nBatch == r1.nDup + r1.nAppended,
      s"census must partition the batch: $r1")
    assert(r1.corpusAfter == r1.corpusBefore + r1.nAppended, s"$r1")
    assert(r1.nAppended > 0,
      s"fixture batch should contain novel docs: $r1")

    // the appended docs' band rows must now be in the index
    val idx = spark.table(s"$db.docs_mhidx")
    val batchIdsInIdx = idx
      .filter(pmod(col("doc_id"), lit(graft.operators.Dedup.BATCH_MOD))
        === graft.operators.Dedup.BATCH_REM)
      .select("doc_id").distinct().count()
    assert(batchIdsInIdx == r1.nAppended,
      s"index must gain exactly the novel docs' rows: " +
        s"$batchIdsInIdx != ${r1.nAppended}")

    // idempotency: every batch doc now self-matches at est 1.0 (novel
    // ones) or still matches its original partner (dups) — nothing lands
    val r2 = AppendJob.appendDocuments(spark, sfDir, db)
    assert(r2.nAppended == 0 && r2.nDup == r2.nBatch,
      s"re-append must be a no-op: $r2")
    assert(r2.corpusAfter == r1.corpusAfter, s"$r2")
  }

  test("compaction drops over-cap buckets and leaves the rest untouched") {
    import spark.implicits._
    val idxTbl = s"$db.docs_mhidx"
    val cap = graft.operators.Dedup.BUCKET_CAP
    val before = spark.table(idxTbl).count()
    // plant a synthetic hot bucket (cap + 50 rows on one (band, key))
    val cols = spark.table(idxTbl).columns
    val hot = (1 to (cap + 50).toInt).map { i =>
      (-i.toLong, "deadbeef") // doc_id, shared sig slice
    }.toDF("doc_id", "sig8")
    val hotRows = hot.select(
      cols.map {
        case "doc_id" => col("doc_id")
        case "band" => lit(0)
        case "key" => lit("hotbucketkey")
        case "nib" => lit("h")
        case h => col("sig8").as(h)
      }: _*)
    hotRows.write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto(idxTbl)
    val dropped = AppendJob.compactIndex(spark, db)
    assert(dropped == 1, s"exactly the planted bucket must drop: $dropped")
    val after = spark.table(idxTbl).count()
    assert(after == before,
      s"compaction must remove only the planted bucket: $before -> $after")
    assert(spark.table(idxTbl)
      .filter(col("key") === "hotbucketkey").count() == 0)
    // compacting an already-clean index is a no-op
    assert(AppendJob.compactIndex(spark, db) == 0)
  }

  test("corpus table holds exactly corpus-seed plus novel batch docs") {
    // runs after the test above (same suite instance ordering); re-derive
    // the expectation independently of AppendReport
    val total = Tables.documents(spark, sfDir).count()
    val batch = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(graft.operators.Dedup.BATCH_MOD))
        === graft.operators.Dedup.BATCH_REM)
      .count()
    val corpus = spark.table(s"$db.docs_corpus").count()
    assert(corpus >= total - batch,
      "corpus must contain at least the seed docs")
    assert(corpus <= total,
      "corpus can never exceed seed + full batch")
    // every row in the corpus table is unique by doc_id (append never
    // duplicated a doc)
    val dupRows = spark.table(s"$db.docs_corpus")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupRows == 0, s"$dupRows doc_ids duplicated by append")
  }
}
