package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.TextFns

/** The composed training-data preparation pipeline — the LLM-side analog
  * of [[graft.sources.IngestJob]]: the sequence a pretraining corpus
  * actually runs, as ONE declarative plan.
  *
  *   documents → exact-dedup keep-one → quality filter → deterministic
  *   train/test split → per-(lang, split) summary
  *
  * Stage posture at 100 TB:
  *  - dedup keep-one computes the survivor set as a DIGEST-ONLY
  *    aggregation (the exchange carries (md5, doc_id) — 40 bytes/row,
  *    never text; same property as q_dedup_exact, asserted in
  *    TrainPipelineSpec) with min(doc_id) as the deterministic survivor —
  *    never dropDuplicates, whose pick is partition-order-dependent. The
  *    corpus then joins the survivor ids on doc_id: broadcast when the
  *    survivor set is small, and exchange-free on the text side when the
  *    corpus is bucketed by doc_id at ingest ([[graft.sources.Ddl]]'s
  *    layout);
  *  - the quality score (q_text_quality's formula) and the split
  *    assignment (q_hash_split's rule) are row-local — no exchange;
  *    Catalyst fuses them into the join's codegen stage.
  *
  * Every stage is SQL-expressible, so the DuckDB oracle replays the exact
  * composition end-to-end — the strongest check in the suite: a drift in
  * ANY stage (normalization, survivor rule, score arithmetic, split rule)
  * shifts the summary counts. */
object TrainPipeline {

  /** Quality cutoff: keeps roughly the top two-thirds of the harness
    * corpus — mirrored into the oracle. */
  private val QUALITY_CUTOFF = 0.4

  /** The prepared corpus at document granularity: one row per surviving
    * doc with its split assignment — what a real pipeline writes out. */
  def prepared(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("h", md5(TextFns.normalize(col("text"))))
    val keepIds = docs
      .select("h", "doc_id")
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keepIds, "doc_id")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("double"))
      .withColumn("avg_wlen",
        (length(col("text")) - col("n_tok") + 1d) / col("n_tok"))
      .withColumn("stop_ratio",
        expr("size(filter(split(text, ' '), x -> x = 'the' OR x = 'a'))")
          .cast("double") / col("n_tok"))
      .withColumn("quality",
        lit(0.5) * col("stop_ratio")
          + lit(0.3) * least(col("n_tok") / 100d, lit(1d))
          + lit(0.2) * when(col("avg_wlen").between(3d, 8d), 1d).otherwise(0d))
      .filter(col("quality") >= QUALITY_CUTOFF)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string")), 32, 1) < "4", "test")
          .otherwise("train"))
      .select("lang", "split", "doc_id", "quality")
  }

  /** Driver-visible summary of the prepared corpus. */
  def summary(s: SparkSession, dir: String): DataFrame =
    prepared(s, dir)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
           // quality is an arbitrary-fraction ratio: quantize to 1e-6
           // BIGINT units pre-sum so the mean is summation-order-free
           // (r12 q_correlated class). avg*1e4 = sum_units/100/n.
           (floor(sum(floor(col("quality") * lit(1000000.0d) + lit(0.5d)))
             .cast("double") / lit(100.0d) / count(lit(1)) + lit(0.5d))
             / lit(10000.0d)).as("avg_quality"))
      .orderBy("lang", "split")

  private val summarySql =
    s"""WITH deduped AS (
      |  SELECT * FROM (
      |    SELECT lang, doc_id, text,
      |           min(doc_id) OVER (PARTITION BY
      |             md5(regexp_replace(lower(trim(text)), '[^a-z0-9 ]+', ' ', 'g')))
      |             AS keep_id
      |    FROM documents)
      |  WHERE doc_id = keep_id),
      |m AS (
      |  SELECT lang, doc_id,
      |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |         (length(text) - CAST(len(string_split(text, ' ')) AS DOUBLE) + 1)
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_wlen,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                              x -> x = 'the' OR x = 'a')) AS DOUBLE)
      |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
      |  FROM deduped),
      |scored AS (
      |  SELECT lang, doc_id,
      |         0.5 * stop_ratio
      |           + 0.3 * least(n_tok / 100, 1.0)
      |           + 0.2 * (CASE WHEN avg_wlen BETWEEN 3 AND 8
      |                         THEN 1.0 ELSE 0.0 END) AS quality
      |  FROM m),
      |kept AS (SELECT * FROM scored WHERE quality >= $QUALITY_CUTOFF),
      |assigned AS (
      |  SELECT lang,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) < '4'
      |              THEN 'test' ELSE 'train' END AS split,
      |         quality
      |  FROM kept)
      |SELECT lang, split, count(*) AS n_docs,
      |       floor(sum(CAST(floor(quality * 1000000.0 + 0.5) AS BIGINT))
      |             / 100.0 / count(*) + 0.5) / 10000.0 AS avg_quality
      |FROM assigned
      |GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_train_pipeline", summary, Some(summarySql)))
}
