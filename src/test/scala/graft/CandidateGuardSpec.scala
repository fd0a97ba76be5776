package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.{Breadth, Dedup, Similarity}

/** Candidate-cardinality guards for every blocked operator — the round-2
  * lesson: a plan-node assertion ("no cartesian") passed while the fuzzy
  * gram join regenerated every pair through one degenerate key. The only
  * assertion that can see a degenerate key distribution is a BOUND ON THE
  * CANDIDATE COUNT itself.
  *
  * The bound must respect what is achievable: a LOSSLESS candidate
  * generator can never emit fewer pairs than the true-match set, so O(n)
  * bounds are asserted on fixtures where true matches are sparse (keys
  * carry entropy), and on intrinsically dense fixtures (sequential
  * templated keys, where a constant fraction of ALL pairs genuinely match)
  * the assertion is exact completeness instead.
  */
class CandidateGuardSpec extends SparkTestBase {
  import spark.implicits._

  test("fuzzy blocking stays O(n) on high-entropy templated names") {
    // The round-2 failure shape: every name shares a long literal template,
    // only the suffix digits distinguish. Lexicographic prefix grams
    // degenerate to one bucket (all pairs); df-ordered prefix grams must
    // keep only the rare digit grams. Suffixes are spread (multiplicative
    // hash) so true matches are sparse and an O(n) bound is achievable.
    val n = 600
    val sup = (1 to n)
      .map(i => (i.toLong, f"Supplier#${(i.toLong * 48271L) % 999999937L}%09d"))
      .toDF("k", "nm")
      .withColumn("len", length(col("nm")))
    val cand = Breadth.fuzzyCandidates(sup, D = 2, qg = 2).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(cand <= 60L * n,
      s"fuzzy candidates $cand exceed 60n=${60L * n} (all-pairs $allPairs) — " +
        "blocking degenerated on templated keys")
  }

  test("fuzzy blocking is exactly complete on dense sequential names") {
    // Sequential zero-padded codes are the WORST case: only ~3 grams per
    // name carry entropy (fewer than the qD+1=5 the prefix theorem needs),
    // and a large fraction of all pairs are true dist-<=2 matches — so no
    // lossless blocker can stay sub-quadratic, and the hot-gram dense path
    // takes over. The guard here is exactness: the adaptive two-path
    // candidates must reproduce brute-force all-pairs matching verbatim.
    val n = 300
    val sup = (1 to n)
      .map(i => (i.toLong, f"Supplier#$i%09d"))
      .toDF("k", "nm")
      .withColumn("len", length(col("nm")))
    val got = Breadth.fuzzyCandidates(sup, D = 2, qg = 2)
      .filter(levenshtein(col("na"), col("nb")) <= 2)
      .select("ka", "kb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sup.as("a").crossJoin(sup.as("b"))
      .filter(col("a.k") < col("b.k") &&
        levenshtein(col("a.nm"), col("b.nm")) <= 2)
      .select(col("a.k"), col("b.k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should have dense true matches")
    assert(got == brute,
      s"adaptive candidates lost ${(brute -- got).size} true pairs / " +
        s"added ${(got -- brute).size} phantom pairs")
  }

  test("fuzzy gram-df guard: over-cap universes take the join fallback losslessly") {
    // force the wide-alphabet fallback (dfMapCap below the fixture's gram
    // count) and assert it reproduces the inlined-map path's candidates
    // exactly — the guard must change the PLAN, never the ANSWER. This is
    // what protects a future caller on unicode documents.text from a
    // driver-side gram-universe collect.
    val n = 300
    val sup = (1 to n)
      .map(i => (i.toLong, f"Supplier#${(i.toLong * 48271L) % 999999937L}%09d"))
      .toDF("k", "nm")
      .withColumn("len", length(col("nm")))
    def pairs(cap: Int): Set[(Long, Long)] =
      Breadth.fuzzyCandidates(sup, D = 2, qg = 2, dfMapCap = cap)
        .select("ka", "kb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = pairs(Breadth.DF_MAP_CAP)
    val fallback = pairs(4) // far below the fixture's distinct-gram count
    assert(inline.nonEmpty)
    assert(fallback == inline,
      s"fallback path diverged: lost ${(inline -- fallback).size}, " +
        s"added ${(fallback -- inline).size}")
  }

  test("fuzzy blocking on the real supplier fixture is far below all-pairs") {
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("k"), col("s_name").as("nm"))
      .withColumn("len", length(col("nm")))
    val n = sup.count()
    val cand = Breadth.fuzzyCandidates(sup, D = 2, qg = 2).count()
    assert(cand <= n * (n - 1) / 2,
      s"fuzzy candidates $cand exceed all-pairs — duplicate inflation")
  }

  test("minhash-LSH candidates stay O(n) on the documents fixture") {
    val docs = Dedup.docsWithShingles(spark, sfDir).select("doc_id", "sh")
    val n = docs.count()
    val cand = Dedup.minhashCandidates(docs).count()
    assert(cand <= 16L * n,
      s"minhash candidates $cand exceed 16n=${16L * n}")
  }

  test("ngram inverted-index candidates stay O(n) on the documents fixture") {
    val d = Dedup.ngramDocs(spark, sfDir)
    val n = d.count()
    val cand = Dedup.ngramCandidates(d).count()
    assert(cand <= 16L * n,
      s"ngram candidates $cand exceed 16n=${16L * n}")
  }

  test("embedding LSH-band candidates stay O(n) on the embeddings fixture") {
    val e = Similarity.corpus(spark, sfDir)
      .withColumn("sig", expr(VectorFns.lshSignatureSql("emb", 16, 64)))
    val n = e.count()
    val cand = Dedup.embedCandidates(e).count()
    assert(cand <= 16L * n,
      s"embed candidates $cand exceed 16n=${16L * n}")
  }

  test("embed LSH banding recalls planted near-duplicates") {
    // hash_match vs the oracle proves implementation equivalence, not
    // recall: the DuckDB oracle re-derives the same banded candidate set.
    // This is the recall check, in the similarity regime the banding is
    // tuned for (near-duplicates, cos >= ~0.95): plant perturbed copies of
    // five corpus vectors and require every (original, copy) pair to
    // survive banding. (The fixture's organic top-10 pairs sit at cos
    // ~0.4, where 4x4-bit hyperplane LSH keeps ~50% recall by design —
    // asserting exact-top-10 equality there would force near-all-pairs
    // candidate generation and defeat the blocking.)
    val e = Similarity.corpus(spark, sfDir)
    val base = e.filter(col("vec_id") < 5)
      .select("vec_id", "label", "emb")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val planted = base.map { case (id, label, emb) =>
      val nrm = math.sqrt(emb.map(x => x * x).sum)
      val noise = emb.indices.map(j => math.sin(j * 2.7 + id)).toArray
      val nNrm = math.sqrt(noise.map(x => x * x).sum)
      val pert = emb.indices.map(j => emb(j) + 0.2 * nrm * noise(j) / nNrm)
      (10000L + id, label, pert, math.sqrt(pert.map(x => x * x).sum))
    }
    val plantedDf = planted.toSeq
      .toDF("vec_id", "label", "emb", "nrm")
    val aug = e.select("vec_id", "label", "emb", "nrm").union(plantedDf)
      .withColumn("sig", expr(VectorFns.lshSignatureSql("emb", 16, 64)))
    val cand = Dedup.embedCandidates(aug)
      .filter(col("vb") >= 10000L && col("va") === col("vb") - 10000L)
      .count()
    assert(cand == 5L,
      s"banding recalled only $cand of 5 planted near-dup pairs")
  }
}
