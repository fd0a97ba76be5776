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

  /** documents + distinct word-3-shingle set column `sh` (compiled
    * word_shingles kernel; bit-identical to TextFns.shingles — asserted
    * in DotProductSpec). */
  private def docsWithShingles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh", array_distinct(expr("word_shingles(toks, 3)")))
  }

  /** Exact dedup: normalize → md5 → count distinct per language. The
    * distinct runs over the 32-char digest, NOT the normalized text, so
    * the two-phase distinct aggregation shuffles 32-byte keys instead of
    * multi-KB documents — at 100 TB that is the difference between
    * shuffling the corpus and shuffling ~1% of it. The deterministic
    * keep-one variant is groupBy(hash).agg(min(doc_id)) — never
    * dropDuplicates, whose survivor is partition-order-dependent. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("h", md5(TextFns.normalize(col("text"))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct("h").as("n_unique"),
           (count(lit(1)) - countDistinct("h")).as("n_dupes"))
      .orderBy("lang")

  private val exactSql =
    """SELECT lang, count(*) AS n_docs,
      |       count(DISTINCT md5(regexp_replace(lower(trim(text)), '[^a-z0-9 ]+', ' ', 'g'))) AS n_unique,
      |       count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '[^a-z0-9 ]+', ' ', 'g'))) AS n_dupes
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** MinHash signature length and LSH banding: 8 hashes, 4 bands of 2.
    * S-curve midpoint t≈(1/b)^(1/r) = (1/4)^(1/2) = 0.5 Jaccard — pairs
    * well below that (incl. the 0.3 verify cutoff) are caught with lower
    * probability; production raises K/BANDS to move the midpoint down. */
  private val K = 8
  private val BANDS = 4

  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = docsWithShingles(s, dir).select("doc_id", "sh").cache()
    // All 8 hash fns in one compiled pass over the shingles (codegen'd
    // MinHashSlicesD): 2 md5 calls per shingle, one buffer, vs the HOF
    // form's ~16 intermediate strings per shingle across 8 lambdas.
    // Bit-identical to the sliced-md5 SQL form (asserted in
    // DotProductSpec) and to the DuckDB oracle.
    val sigs = docs
      .withColumn("mh", expr("minhash_slices(sh)"))
      .select(
        (col("doc_id") +: (0 until K).map(i => col("mh").getItem(i).as(s"h$i"))): _*)
    val bandCols = (0 until BANDS).map(b =>
      TextFns.bandKey(Seq(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as(s"b$b"))
    // kv is cached: it feeds BOTH sides of the self-join and would
    // otherwise recompute the md5 signature stage once per use (profiled
    // 4× recompute = ~75% of this query's runtime before caching). It is
    // tiny — (doc_id, band, key) only, never the shingle arrays — which is
    // also the 100 TB property: candidate generation shuffles 50-byte rows,
    // not documents.
    val kv = sigs.select((col("doc_id") +: bandCols): _*)
      .select(col("doc_id"),
        posexplode(array((0 until BANDS).map(b => col(s"b$b")): _*)))
      .toDF("doc_id", "band", "key")
      .cache()
    val cand = kv.as("x").join(kv.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .cache()
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
      s"list_aggregate(list_transform(hs, h -> substr(h, ${1 + 8 * i}, 8)), 'min') AS h$i")
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
       |based AS (
       |  SELECT doc_id, list_transform(sh, x -> md5(x) || md5('s:' || x)) AS hs
       |  FROM docs),
       |sigs AS (
       |  SELECT doc_id,
       |         $sigCols
       |  FROM based),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |ver AS (
       |  SELECT a, b,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |           / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS jac
       |  FROM cand JOIN docs sa ON a = sa.doc_id JOIN docs sb ON b = sb.doc_id)
       |SELECT (SELECT count(*) FROM docs) AS n_docs,
       |       (SELECT count(*) FROM cand) AS n_candidates,
       |       (SELECT count(*) FROM ver WHERE jac >= 0.3) AS n_verified""".stripMargin
  }

  /** SimHash dedup: one 32-bit signature per doc — the codegen'd
    * [[graft.functions.SimHash32D]] kernel (zero shuffle, compiled loop;
    * bit-identical to the portable-SQL TextFns.simhash32 form, asserted in
    * DotProductSpec) — then collision clusters per language. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("dtoks", array_distinct(TextFns.tokens(col("text"))))
      .withColumn("sig", expr("simhash32_d(dtoks)"))
      .groupBy("lang", "sig")
      .agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum("c").cast("long").as("n_docs"),
           count(lit(1)).as("n_signatures"),
           max("c").as("max_cluster"))
      .orderBy("lang")
  }

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
    * similar pairs, via an INVERTED INDEX rather than a block cross-product.
    * Postings (block, shingle) → doc_id self-join on the shingle, so
    * |a∩b| falls out of a groupBy count and only pairs sharing ≥1 shingle
    * are ever materialized. This is the 100 TB shape: work is
    * Σ_term |posting|² (bounded by term frequency), not Σ_block |block|²,
    * and the shuffle keys are (block, shingle) strings — never documents.
    * Zero-overlap pairs (jac = 0 by definition) don't appear, which cannot
    * affect a most-similar top-k. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = Tables.documents(s, dir)
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("sh2", array_distinct(expr("word_shingles(toks, 2)")))
      .select("lang", "source", "doc_id", "sh2")
      .cache()
    val sizes = d.select(col("doc_id"), size(col("sh2")).as("sz"))
    val posts = d.select(col("lang"), col("source"), col("doc_id"),
      explode(col("sh2")).as("g"))
    val inter = posts.as("x").join(posts.as("y"),
        col("x.lang") === col("y.lang") &&
          col("x.source") === col("y.source") &&
          col("x.g") === col("y.g") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.lang").as("lang"), col("x.source").as("source"),
        col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("lang"), col("source"), col("a"), col("b"),
        round(col("c").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("c")).cast("double"), 4).as("jac"))
      .orderBy(col("jac").desc, col("a").asc, col("b").asc)
      .limit(10)
  }

  private val ngramJaccardSql =
    """WITH d AS (
      |  SELECT lang, source, doc_id,
      |         list_distinct(list_transform(
      |           generate_series(1, len(string_split(text, ' ')) - 1),
      |           i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS sh2
      |  FROM documents),
      |posts AS (SELECT lang, source, doc_id, unnest(sh2) AS g FROM d),
      |inter AS (
      |  SELECT x.lang AS lang, x.source AS source,
      |         x.doc_id AS a, y.doc_id AS b, count(*) AS c
      |  FROM posts x JOIN posts y
      |    ON x.lang = y.lang AND x.source = y.source AND x.g = y.g
      |   AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT i.lang AS lang, i.source AS source, a, b,
      |       round(CAST(c AS DOUBLE)
      |             / CAST(sa.len_sh + sb.len_sh - c AS DOUBLE), 4) AS jac
      |FROM inter i
      |JOIN (SELECT doc_id, len(sh2) AS len_sh FROM d) sa ON a = sa.doc_id
      |JOIN (SELECT doc_id, len(sh2) AS len_sh FROM d) sb ON b = sb.doc_id
      |ORDER BY jac DESC, a, b LIMIT 10""".stripMargin

  /** Embedding cosine near-dup: top-10 most similar vector pairs within
    * label blocks, double-precision math end to end (float32 inputs are
    * widened first; DuckDB's list_cosine_similarity stays in float32 and
    * would diverge in the 7th digit). */
  def embedCosine(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFns
    val e = Similarity.corpus(s, dir)
    e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.label").as("label"),
        col("x.vec_id").as("va"), col("y.vec_id").as("vb"),
        round(VectorFns.cosineWithNorms("x.emb", "y.emb", "x.nrm", "y.nrm"), 4)
          .as("cos_sim"))
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
