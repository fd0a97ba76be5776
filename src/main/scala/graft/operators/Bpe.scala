package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Byte-pair-encoding tokenizer training — the "train the tokenizer on
  * the corpus" step of an LLM data pipeline (Sennrich et al. 2016:
  * iteratively merge the most frequent adjacent symbol pair).
  *
  * Scale shape — the part that matters at 100 TB: the corpus is touched
  * EXACTLY ONCE, to build the (word, freq) table; every merge iteration
  * then runs on that VOCABULARY-sized table (millions of rows for a
  * 100 TB corpus — cluster work, but corpus-independent). The driver
  * sequences the merges (each needs the previous merge applied — the
  * same driver-loop shape as the Lloyd trainer in [[Similarity]]) and
  * receives only the 1-row argmax per round. Pair counting weights each
  * word's pairs by its corpus frequency, so the result is identical to
  * counting over the raw corpus.
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right) — reproducible across runs, partitionings, and engines. The
  * merge application is leftmost non-overlapping ("a a a" merges to
  * "aa a", never "a aa"), matching the reference BPE implementations.
  *
  * No DuckDB oracle: the merge loop is data-dependently sequential (each
  * round's regex depends on the previous argmax) — the q_bpe_merges
  * registration is declared rows-only; BpeSpec verifies the merge
  * sequence on the classic hand-computable corpus and pins determinism.
  */
object Bpe {

  private val N_MERGES = 12

  /** End-of-word marker (the classic `</w>`), kept to one char so the
    * symbol-sequence strings stay compact. */
  private val EOW = "·"

  /** (word, freq) → (space-joined symbol sequence, freq). */
  private[graft] def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // chars joined by single spaces + end-of-word marker (the split
      // excludes the END position too: Spark's split keeps trailing
      // empties, which would inject a phantom "" symbol into every word)
      .select(concat(
        concat_ws(" ", split(col("word"), "(?!^)(?!$)")), lit(" " + EOW))
        .as("syms"), col("freq"))

  /** One training run: returns (step, left, right, pair_count) rows, one
    * per merge, in merge order. `vocab` is a (syms, freq) frame. */
  private[graft] def trainMerges(vocab: DataFrame,
                                 nMerges: Int): Seq[(Int, String, String, Long)] = {
    var v = vocab.cache()
    v.count() // materialize before the loop so each round reuses it
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      // adjacent symbol pairs of every word, weighted by word frequency —
      // vocabulary-sized work, shuffled as (pair, partial-count) rows
      val top = v.select(col("freq"), split(col("syms"), " ").as("s"))
        .select(col("freq"), expr(
          """CASE WHEN size(s) >= 2
            |  THEN transform(sequence(1, size(s) - 1),
            |    i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))
            |  ELSE cast(array() as array<string>) END""".stripMargin)
          .as("ps"))
        .select(col("freq"), explode(col("ps")).as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (pair, n) = (top(0).getString(0), top(0).getLong(1))
        val Array(l, r) = pair.split(" ", 2)
        merges += ((step, l, r, n))
        // leftmost non-overlapping merge: the zero-width boundary guards
        // consume nothing, and the regex engine resumes AFTER the matched
        // "l r" text — so "a a a" becomes "aa a", the reference behavior
        val pat = s"(?<=^|\\s)${Pattern.quote(l)} ${Pattern.quote(r)}(?=\\s|$$)"
        // regexp_replace's replacement treats \ and $ specially; symbols
        // here are corpus chars + EOW, so plain escape of \ and $ suffices
        val next = v.select(
          regexp_replace(col("syms"), pat,
            l.concat(r).replace("\\", "\\\\").replace("$", "\\$"))
            .as("syms"), col("freq"))
          .groupBy("syms").agg(sum("freq").as("freq"))
          // the working table is vocabulary-sized; don't pay 32-task
          // scheduling per round for it (each round is 2 tiny jobs — at
          // corpus scale the ROUNDS are cheap, the one corpus scan isn't)
          .coalesce(4)
          .localCheckpoint() // cut the per-round lineage
        v.unpersist()
        v = next.cache()
        step += 1
      }
    }
    val out = merges.result()
    v.unpersist()
    out
  }

  /** Trained-merge memo per corpus dir — tokenizer training is
    * once-per-corpus work (the ingest-time-index precedent in
    * [[Similarity]]): the merges query and the encode query share one
    * training run instead of each re-running the loop. Keyed by dir; the
    * harness fixture dirs are immutable (a regenerated-in-place corpus
    * would serve stale merges — the same documented trade as GraftSql's
    * view memo). */
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, Long)]]()

  private def trainedMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    trained.computeIfAbsent(dir,
      _ => trainMerges(wordTable(Tables.documents(s, dir)), N_MERGES))

  /** Registered query: the first N_MERGES BPE merges learned from the
    * documents corpus, with their pair frequencies. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, dir).toDF("step", "left", "right", "pair_count")
      .orderBy("step")
  }

  /** Apply a learned merge list to a (syms, freq) vocabulary: the merges
    * replay IN TRAINING ORDER as chained leftmost-nonoverlap replaces —
    * encoding therefore agrees exactly with what training saw. */
  private[graft] def encodeWith(vocab: DataFrame,
                                merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.foldLeft(vocab) { case (df, (_, l, r, _)) =>
      val pat = s"(?<=^|\\s)${Pattern.quote(l)} ${Pattern.quote(r)}(?=\\s|$$)"
      df.withColumn("syms",
        regexp_replace(col("syms"), pat,
          l.concat(r).replace("\\", "\\\\").replace("$", "\\$")))
    }

  /** Registered query: encode the corpus with the trained merges and
    * report the compression census — the at-scale half of BPE (training
    * is a once-per-corpus loop; ENCODING is what runs over all 100 TB).
    *
    * Scale shape: encoding runs over the DISTINCT-WORD table (the chained
    * replaces execute once per vocabulary entry, not once per corpus
    * occurrence) and the corpus-level stats weight by word frequency. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val vocab = wordTable(Tables.documents(s, dir))
    val merges = trainedMerges(s, dir)
    encodeWith(vocab, merges)
      .select(col("freq"), size(split(col("syms"), " ")).as("n_tok"),
        (length(col("syms")) - size(split(col("syms"), " ")) + 1
          - lit(1)).as("n_chars")) // minus the EOW marker char
      .agg(count(lit(1)).as("n_distinct_words"),
        sum("freq").as("n_words"),
        sum(col("freq") * col("n_tok")).as("n_bpe_tokens"),
        sum(col("freq") * col("n_chars")).as("n_chars"))
      .select(col("n_distinct_words"), col("n_words"),
        col("n_bpe_tokens"), col("n_chars"),
        (floor(col("n_chars").cast("double") / col("n_bpe_tokens")
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d))
          .as("chars_per_token"))
  }

  val all: Seq[Q] = Seq(
    Q("q_bpe_merges", bpeMerges, None,
      doc = "BPE tokenizer training: first merges + frequencies (rows-only: " +
        "data-dependently sequential merge loop has no SQL replay)"),
    Q("q_bpe_encode", bpeEncode, None,
      doc = "BPE corpus encoding census with the trained merges (rows-only: " +
        "depends on the sequential training loop)"))
}
