package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.TextFns

/** Deduplication operators (north-star [N], SURVEY.md §2.8) — the five
  * standard strategies of a pretraining-data pipeline, each expressed as a
  * shuffle-disciplined Spark plan:
  *
  *  - exact:    hash group-by on normalized text (one shuffle on the hash)
  *  - MinHash:  shingle → k min-hashes → banded LSH keys → bucket
  *              self-join → Jaccard verify. The self-join shuffles only
  *              (doc_id, band_key) pairs — never document text — which is
  *              what makes it the 100 TB path: candidate generation is
  *              linear in corpus size, quadratic only within a bucket.
  *  - SimHash:  one fused fold per doc → 32-bit signature; duplicates =
  *              signature collisions (group-by, one shuffle of 8-byte keys)
  *  - n-gram:   exact Jaccard within (lang, source) blocks — the verify
  *              path; quadratic only inside a block
  *  - embedding: cosine near-dup within label blocks over Array[Float]
  *
  * All hashing is md5-based (TextFns) so every pipeline has an exact
  * DuckDB oracle. No UDFs; everything stays in whole-stage codegen.
  */
object Dedup {

  /** documents + distinct word-3-shingle set column `sh`. */
  private def docsWithShingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh", array_distinct(TextFns.shingles("toks", 3)))

  /** Exact dedup: normalize then count distinct per language. The
    * deterministic keep-one variant is groupBy(norm).agg(min(doc_id)) —
    * never dropDuplicates, whose survivor is partition-order-dependent. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("norm", TextFns.normalize(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct("norm").as("n_unique"),
           (count(lit(1)) - countDistinct("norm")).as("n_dupes"))
      .orderBy("lang")

  private val exactSql =
    """SELECT lang, count(*) AS n_docs,
      |       count(DISTINCT regexp_replace(lower(trim(text)), '[^a-z0-9 ]+', ' ', 'g')) AS n_unique,
      |       count(*) - count(DISTINCT regexp_replace(lower(trim(text)), '[^a-z0-9 ]+', ' ', 'g')) AS n_dupes
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** MinHash signature length and LSH banding: 8 hashes, 4 bands of 2.
    * For threshold t≈(1/b)^(1/r) this targets t≈0.25 Jaccard. */
  private val K = 8
  private val BANDS = 4

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithShingles(s, dir).select("doc_id", "sh").cache()
    val sigs = docs.select(
      (col("doc_id") +: (0 until K).map(i => TextFns.minhash("sh", i).as(s"h$i"))): _*)
    val bandCols = (0 until BANDS).map(b =>
      md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as(s"b$b"))
    val banded = sigs.select((col("doc_id") +: bandCols): _*)
    val kv = banded
      .select(col("doc_id"),
        posexplode(array((0 until BANDS).map(b => col(s"b$b")): _*)))
      .toDF("doc_id", "band", "key")
    val cand = kv.as("x").join(kv.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val verified = cand
      .join(docs.as("sa"), col("a") === col("sa.doc_id"))
      .join(docs.as("sb"), col("b") === col("sb.doc_id"))
      .withColumn("jac", TextFns.jaccard("sa.sh", "sb.sh"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    val nVer = verified.filter(col("jac") >= 0.3)
      .agg(count(lit(1)).as("n_verified"))
    nDocs.crossJoin(nCand).crossJoin(nVer)
  }

  private val minhashLshSql = {
    val sigCols = (0 until K).map(i =>
      s"list_aggregate(list_transform(sh, x -> md5('$i:' || x)), 'min') AS h$i")
      .mkString(",\n         ")
    val bandSelects = (0 until BANDS).map(b =>
      s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS key FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""WITH docs AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           generate_series(1, len(string_split(text, ' ')) - 2),
       |           i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS sh
       |  FROM documents),
       |sigs AS (
       |  SELECT doc_id,
       |         $sigCols
       |  FROM docs),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |ver AS (
       |  SELECT a, b,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |           / CAST(len(list_distinct(list_cat(sa.sh, sb.sh))) AS DOUBLE) AS jac
       |  FROM cand JOIN docs sa ON a = sa.doc_id JOIN docs sb ON b = sb.doc_id)
       |SELECT (SELECT count(*) FROM docs) AS n_docs,
       |       (SELECT count(*) FROM cand) AS n_candidates,
       |       (SELECT count(*) FROM ver WHERE jac >= 0.3) AS n_verified""".stripMargin
  }

  /** SimHash dedup: one 32-bit signature per doc (fused fold, no explode
    * on the Spark side), collision clusters per language. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("dtoks", array_distinct(TextFns.tokens(col("text"))))
      .withColumn("sig", TextFns.simhash32("dtoks"))
      .groupBy("lang", "sig")
      .agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum("c").cast("long").as("n_docs"),
           count(lit(1)).as("n_signatures"),
           max("c").as("max_cluster"))
      .orderBy("lang")

  private val simhashSql =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS tok
      |  FROM documents),
      |votes AS (
      |  SELECT doc_id, lang, k,
      |         sum(CASE WHEN ((strpos('0123456789abcdef',
      |                                substr(md5(tok), CAST(k // 4 AS INTEGER) + 1, 1)) - 1)
      |                        // (1 << CAST(k % 4 AS INTEGER))) % 2 = 1
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) ks
      |  GROUP BY doc_id, lang, k),
      |sig AS (
      |  SELECT doc_id, lang,
      |         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
      |                       ELSE 0 END) AS BIGINT) AS sig
      |  FROM votes GROUP BY doc_id, lang),
      |clusters AS (SELECT lang, sig, count(*) AS c FROM sig GROUP BY lang, sig)
      |SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_signatures,
      |       max(c) AS max_cluster
      |FROM clusters GROUP BY lang ORDER BY lang""".stripMargin

  /** Exact n-gram Jaccard within (lang, source) blocks: the top-10 most
    * similar pairs. Meta-blocking keeps the pair space quadratic only
    * inside a block — the exact-verify complement to MinHash candidates. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh2", array_distinct(TextFns.shingles("toks", 2)))
      .select("lang", "source", "doc_id", "sh2")
    d.as("x").join(d.as("y"),
        col("x.lang") === col("y.lang") &&
          col("x.source") === col("y.source") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.lang").as("lang"), col("x.source").as("source"),
        col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        round(TextFns.jaccard("x.sh2", "y.sh2"), 4).as("jac"))
      .orderBy(col("jac").desc, col("a").asc, col("b").asc)
      .limit(10)
  }

  private val ngramJaccardSql =
    """WITH d AS (
      |  SELECT lang, source, doc_id,
      |         list_distinct(list_transform(
      |           generate_series(1, len(string_split(text, ' ')) - 1),
      |           i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh2
      |  FROM documents)
      |SELECT x.lang AS lang, x.source AS source,
      |       x.doc_id AS a, y.doc_id AS b,
      |       round(CAST(len(list_intersect(x.sh2, y.sh2)) AS DOUBLE)
      |             / CAST(len(list_distinct(list_cat(x.sh2, y.sh2))) AS DOUBLE), 4) AS jac
      |FROM d x JOIN d y
      |  ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
      |ORDER BY jac DESC, a, b LIMIT 10""".stripMargin

  /** Embedding cosine near-dup: top-10 most similar vector pairs within
    * label blocks, double-precision math end to end (float32 inputs are
    * widened first; DuckDB's list_cosine_similarity stays in float32 and
    * would diverge in the 7th digit). */
  def embedCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x))"))
      .select("vec_id", "label", "emb", "nrm")
    e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.label").as("label"),
        col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
        round(
          expr("aggregate(zip_with(x.emb, y.emb, (p, q) -> p * q), cast(0 as double), (s, v) -> s + v)")
            / (col("x.nrm") * col("y.nrm")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("va").asc, col("vb").asc)
      .limit(10)
  }

  private val embedCosineSql =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e)
      |SELECT a.label AS label, a.vec_id AS va, b.vec_id AS vb,
      |       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cos_sim
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |ORDER BY cos_sim DESC, va, vb LIMIT 10""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_dedup_exact", exact, Some(exactSql)),
    Q("q_dedup_minhash", minhashLsh, Some(minhashLshSql)),
    Q("q_dedup_simhash", simhash, Some(simhashSql)),
    Q("q_dedup_ngram", ngramJaccard, Some(ngramJaccardSql)),
    Q("q_dedup_embed", embedCosine, Some(embedCosineSql)))
}
