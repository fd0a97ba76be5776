package graft

import graft.operators.Bpe

/** BPE training has no SQL oracle (the merge loop is data-dependently
  * sequential), so its semantics are pinned here: the exact merge
  * sequence on the classic hand-computable corpus, leftmost-nonoverlap
  * merge application, and run-to-run determinism.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("classic corpus: merge sequence matches the hand computation") {
    // Sennrich-style fixture. Word freqs: low×5, lower×2, newest×6.
    // Char pairs weighted by freq (· = end-of-word):
    //   e s: 6 (newest)  s t: 6  t ·: 6  n e: 6  e w: 6  w e: 8 (newest
    //   6 + lower 2) ... the clear first merges are driven by newest.
    val docs = Seq(
      ("low low low low low newest newest newest"),
      ("lower lower newest newest newest")).toDF("text")
    val merges = Bpe.trainMerges(Bpe.wordTable(docs), 5)
    assert(merges.length == 5)
    // w e (8 = 6 newest + 2 lower) wins round 1; ties break lexically
    assert(merges.head._2 == "w" && merges.head._3 == "e" &&
      merges.head._4 == 8L, s"first merge: ${merges.head}")
    // after merging "we": newest = n e we s t ·, lower = l o we r ·, and
    // (l,o) = 5 (low) + 2 (lower) = 7 now tops the 6-count newest pairs
    assert(merges(1)._2 == "l" && merges(1)._3 == "o" &&
      merges(1)._4 == 7L, s"second merge: ${merges(1)}")
    // merge counts never exceed the previous round's count: a pair's
    // weighted count can only be created by earlier merges of ITS OWN
    // constituents, which the argmax already saw
    val counts = merges.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"merge counts increased: $counts")
  }

  test("leftmost non-overlapping merge: 'a a a' becomes 'aa a'") {
    val docs = Seq("aaa").toDF("text")
    // word 'aaa' → "a a a ·"; first merge is (a, a) with count 2
    val merges = Bpe.trainMerges(Bpe.wordTable(docs), 2)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    assert(merges.head._4 == 2L,
      "both adjacent pairs count before merging")
    // round 2 operates on "aa a ·": pairs are (aa,a)=1 and (a,·)=1 —
    // lexicographic tiebreak picks "a ·"; overlap was NOT double-merged
    assert(merges(1)._2 == "a" && merges(1)._3 == EOW,
      s"second merge: ${merges(1)}")
  }

  test("encoding round-trips: dropping spaces reproduces word + marker") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val vocab = Bpe.wordTable(docs)
      .withColumn("word_chk", regexp_replace(col("syms"), " ", ""))
    val merges = Bpe.trainMerges(Bpe.wordTable(docs), 6)
    val bad = Bpe.encodeWith(vocab, merges)
      .filter(regexp_replace(col("syms"), " ", "") =!= col("word_chk"))
      .count()
    assert(bad == 0L, "a merge altered characters, not just boundaries")
  }

  test("encoding census: BPE tokens per word sit in [1, chars + 1]") {
    val row = Bpe.bpeEncode(spark, sfDir).collect().head
    val (words, toks, chars) = (row.getAs[Long]("n_words"),
      row.getAs[Long]("n_bpe_tokens"), row.getAs[Long]("n_chars"))
    assert(toks >= words, "every word is at least one token")
    assert(toks <= chars + words, "chars+EOW bounds the token count")
    assert(row.getAs[Double]("chars_per_token") > 0.0)
  }

  test("training is deterministic run to run") {
    val docs = Tables.documents(spark, sfDir)
    val a = Bpe.trainMerges(Bpe.wordTable(docs), 6)
    val b = Bpe.trainMerges(Bpe.wordTable(docs), 6)
    assert(a == b, "same corpus must yield the same merge table")
    assert(a.length == 6)
  }

  test("q_bpe_merges returns the merge table in step order") {
    val rows = Bpe.bpeMerges(spark, sfDir).collect()
    assert(rows.length > 0)
    assert(rows.map(_.getAs[Int]("step")).toSeq == rows.indices.toSeq)
    rows.foreach(r => assert(r.getAs[Long]("pair_count") >= 1L))
  }

  test("unigram LM: frequent whole-word piece beats its char split, " +
    "hand bit-costs recovered exactly") {
    // corpus: 10 x "abab ab". Seed counts: a 30, b 30, ab 30, ba 10,
    // aba 10, bab 10, abab 10 -> T 130, B = bits(130) = 8.
    // Viterbi("abab"): [abab] costs 8-bits(10) = 4 < [ab,ab] = 2*(8-
    // bits(30)) = 6 -> the whole word wins. Round-1 usage: abab 10,
    // ab 10. Refit (+1 smoothing, T2 = 27, B2 = 5): cost(ab) =
    // 5-bits(11) = 1, cost(abab) = 1; segmentation unchanged.
    import spark.implicits._
    val docs = Seq.fill(10)("abab ab").toDF("text")
    val got = operators.Bpe.unigramLmOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("ab", 10L, 1L), ("abab", 10L, 1L)),
      s"got ${got.toSeq}")
  }

  private val EOW = "·"
}
