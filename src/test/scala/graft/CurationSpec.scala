package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.operators.{Curation, JoinsPlus}

/** Scale-shape and semantics assertions for the curation operators — the
  * properties the row oracle cannot check: what shuffles, how window
  * partitions are bounded, and that single-pass claims are really one scan.
  */
class CurationSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def executed(df: DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  private def exchanges(df: DataFrame): Seq[ShuffleExchangeExec] =
    collect(executed(df)) { case e: ShuffleExchangeExec => e }

  test("pii redaction is scan-local: shuffles carry aggregates, never text") {
    val ex = exchanges(Curation.piiRedact(spark, sfDir))
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val banned = e.output.map(_.name).filter(n => n == "text" || n == "redacted")
      assert(banned.isEmpty, s"shuffle carries document text: $banned")
    }
  }

  test("domain mix hits the target composition exactly (50/30/20 of 50)") {
    val byTier = Curation.domainMix(spark, sfDir)
      .groupBy("tier").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTier == Map("web" -> 25L, "books" -> 15L, "code" -> 10L),
      s"composition off target: $byTier")
  }

  test("domain mix first-level window is salt-bounded, not whole-tier") {
    val ws = collect(executed(Curation.domainMix(spark, sfDir))) {
      case w: WindowExec => w
    }
    assert(ws.size >= 2, "two-level top-k should plan two windows")
    val first = ws.last // innermost window = level 1
    val keys = first.partitionSpec.flatMap(_.references.map(_.name)).distinct
    assert(keys.contains("salt"),
      s"level-1 window partitions by $keys — a whole tier in one partition")
  }

  test("chunk dedup shuffles digests, never chunk or document text") {
    val ex = exchanges(Curation.chunkDedup(spark, sfDir))
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val banned = e.output.map(_.name).filter(n => n == "text" || n == "chunk")
      assert(banned.isEmpty, s"shuffle carries chunk text: $banned")
    }
  }

  test("packing bins overflow by at most one document") {
    // contract: bin boundary is tokens_before < BUDGET, so fill can exceed
    // BUDGET only by the last doc's tokens: fill < BUDGET + max doc tokens
    val maxToks = Tables.documents(spark, sfDir)
      .select(max(size(split(col("text"), " ")))).collect()(0).getInt(0)
    val rows = Curation.packSequences(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val maxFill = r.getAs[Long]("max_fill")
      assert(maxFill < 256L + maxToks,
        s"bin fill $maxFill breaks the ≤ budget+1-doc packing contract")
    }
  }

  test("packing windows are (source, bucket)-bounded, never source alone") {
    val ws = collect(executed(Curation.packSequences(spark, sfDir))) {
      case w: WindowExec => w
    }
    assert(ws.nonEmpty)
    ws.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      assert(keys.contains("bucket"),
        s"running-sum window partitions by $keys — one partition per source " +
          "holds a whole 100 TB stratum")
    }
  }

  test("column profile is a single scan (multi-distinct via Expand, not 4 passes)") {
    val scans = collect(executed(Curation.columnProfile(spark, sfDir))) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"profile read the fact table ${scans.size} times")
  }

  test("grouping sets is one scan (Expand), not a union of per-level scans") {
    val scans = collect(executed(JoinsPlus.groupingSets(spark, sfDir))) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"grouping sets read the fact table ${scans.size} times")
  }

  test("grouping sets levels are consistent: () row equals the sum of (rf) rows") {
    val rows = JoinsPlus.groupingSets(spark, sfDir).collect()
    val totals = rows.filter(r => r.getString(0) == "ALL").map(_.getLong(2)).sum
    val perFlag = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
      .map(_.getLong(2)).sum
    assert(totals == perFlag, s"grand total $totals != sum of flag level $perFlag")
  }
}
