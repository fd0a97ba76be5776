package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** DotProductD: the codegen'd dot product must be bit-identical to the
  * higher-order-function fold it replaced (same left-to-right order). */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (p, q) -> p * q), cast(0 as double), (s, v) -> s + v)"

  test("dot_d equals the HOF fold bit-for-bit on random vectors") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(expr("dot_d(a, b)").as("fast"), expr(hof).as("ref"))
    // exact equality, not tolerance: the fold order is identical
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("dot_d: nulls propagate, mismatched lengths use the shorter") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_d(cast(null as array<double>), array(1d)) AS n,
        |       dot_d(array(1d, 2d, 3d), array(2d)) AS short""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 2.0)
  }

  test("simhash32_d equals the portable-SQL simhash32 on real documents") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .withColumn("dtoks", array_distinct(split(col("text"), " ")))
      .withColumn("fast", expr("simhash32_d(dtoks)"))
      .withColumn("ref", graft.functions.TextFns.simhash32("dtoks"))
    assert(d.filter(col("fast") =!= col("ref")).count() == 0)
    assert(d.count() > 0)
  }

  test("minhash_slices equals the sliced-md5 SQL form on real documents") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", array_distinct(graft.functions.TextFns.shingles("toks", 3)))
      .withColumn("mh", expr("minhash_slices(sh)"))
      .withColumn("hs", graft.functions.TextFns.minhashBase("sh"))
    val checks = (0 until graft.functions.MinHashKernel.K).map(i =>
      (col("mh").getItem(i) =!= graft.functions.TextFns.minhashSlice("hs", i)) ||
        (col("mh").getItem(i).isNull =!=
          graft.functions.TextFns.minhashSlice("hs", i).isNull))
    assert(d.filter(checks.reduce(_ || _)).count() == 0)
    // empty shingle set -> null signature in both forms
    val e = spark.sql(
      "SELECT minhash_slices(cast(array() as array<string>)) AS m").collect()(0)
    assert(e.isNullAt(0))
  }

  test("word_shingles equals the SQL shingle form, incl. short docs") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir).select("text")
      .union(Seq("one two", "solo", "").toDF("text"))
      .withColumn("toks", split(col("text"), " "))
    Seq(2, 3).foreach { n =>
      val bad = d
        .withColumn("fast", expr(s"word_shingles(toks, $n)"))
        .withColumn("ref", graft.functions.TextFns.shingles("toks", n))
        .filter(col("fast") =!= col("ref"))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
    val e = intercept[Exception](
      spark.sql("SELECT word_shingles(array('a'), 1 + 1)").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("fingerprint_min equals the HOF min-md5-over-shingles form") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir).select("text")
      .union(Seq("one two", "one two three", "solo", "").toDF("text"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("fast", expr("fingerprint_min(toks, 3)"))
      .withColumn("ref", graft.functions.TextFns.fingerprint("toks"))
    val bad = d.filter(
      (col("fast") =!= col("ref")) || (col("fast").isNull =!= col("ref").isNull))
    assert(bad.count() == 0)
    // short docs (< 3 tokens) -> NULL in both forms
    assert(d.filter(col("text") === "solo").select("fast").collect()(0).isNullAt(0))
  }

  test("rolling_fingerprint equals a naive per-window reference hash") {
    GraftFunctions.register(spark)
    import graft.functions.RollingHashKernel.{B, M, W}
    def naive(s: String): Long = {
      val b = s.getBytes("UTF-8")
      if (b.isEmpty) 0L
      else {
        val windows =
          if (b.length < W) Seq(b.toSeq) else b.toSeq.sliding(W).toSeq
        windows.map(_.foldLeft(0L)((h, c) => (h * B + (c & 0xff)) % M)).min
      }
    }
    val texts = Tables.documents(spark, sfDir).select("text")
      .limit(50).collect().map(_.getString(0)) ++
      Seq("", "a", "short", "x" * 16, "y" * 17)
    val got = texts.toSeq.toDF("t")
      .selectExpr("rolling_fingerprint(t)").collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(naive).toSeq)
  }

  test("dot_d rejects non-double-array inputs at analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT dot_d('x', 'y')").collect())
    assert(e.getMessage.contains("dot_d"))
  }

  test("dot_d runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(100)
      .selectExpr("dot_d(array(cast(id as double)), array(2d)) AS v")
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_d"))
    assert(df.agg(sum("v")).collect()(0).getDouble(0) == 9900.0)
  }

  test("hilbert_d: bijective on the grid, strict neighbor adjacency") {
    // the property Morton lacks and Hilbert is FOR: consecutive indexes
    // are always grid neighbors (|Δx|+|Δy| = 1) — checked exhaustively
    // at several orders, plus bijectivity (every cell exactly once)
    for (bits <- 1 to 5) {
      val n = 1 << bits
      val cells = for (x <- 0 until n; y <- 0 until n)
        yield graft.functions.HilbertKernel.hilbert(bits, x, y) -> (x, y)
      val byD = cells.sortBy(_._1)
      assert(byD.map(_._1) == (0L until n.toLong * n).toSeq,
        s"bits=$bits: not a bijection onto 0..${n * n - 1}")
      byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: ($x1,$y1) -> ($x2,$y2) not adjacent")
      }
    }
  }

  test("hilbert_d matches the kernel through codegen and rejects bad args") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .selectExpr("x", "y", "hilbert_d(x, y, 16) AS d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == graft.functions.HilbertKernel.hilbert(16, x, y))
    }
    val plan = spark.range(100)
      .selectExpr("hilbert_d(id, id + 1, 16) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hilbert_d"),
      s"hilbert_d outside whole-stage codegen:\n$plan")
    val e = intercept[Exception](
      spark.sql("SELECT hilbert_d('a', 'b', 16)").collect())
    assert(e.getMessage.contains("hilbert_d"))
  }

  test("myers_ed equals built-in levenshtein(a, b, k) on random ASCII, " +
    "unicode, supplementary, and edge-case strings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val ascii = "abcdefgh#0123456789 _"
    val uni = "aé漢x🙂b0"
    def mk(alpha: String, len: Int): String =
      // build by code point so supplementary chars stay whole
      (0 until len).map { _ =>
        val cps = alpha.codePoints().toArray
        new String(Character.toChars(cps(rnd.nextInt(cps.length))))
      }.mkString
    val cases =
      Seq.fill(300)((mk(ascii, 1 + rnd.nextInt(30)), mk(ascii, 1 + rnd.nextInt(30)))) ++
      // near-identical pairs (the fuzzy workload shape): one random edit
      Seq.fill(200) {
        val s = mk(ascii, 10 + rnd.nextInt(15))
        val i = rnd.nextInt(s.length)
        (s, s.substring(0, i) + "Q" + s.substring(math.min(i + 1, s.length)))
      } ++
      Seq.fill(100)((mk(uni, 1 + rnd.nextInt(12)), mk(uni, 1 + rnd.nextInt(12)))) ++
      // > 64 code points exercises the built-in fallback branch
      Seq.fill(20)((mk(ascii, 65 + rnd.nextInt(20)), mk(ascii, 65 + rnd.nextInt(20)))) ++
      Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"))
    import spark.implicits._
    for (k <- Seq(0, 1, 2, 5)) {
      val bad = cases.toDF("a", "b")
        .selectExpr("a", "b", s"myers_ed(a, b, $k) AS fast",
          s"levenshtein(a, b, $k) AS ref")
        .filter(col("fast") =!= col("ref"))
        .collect()
      assert(bad.isEmpty, s"k=$k mismatches: " + bad.take(3).map(r =>
        s"('${r.getString(0)}','${r.getString(1)}') fast=${r.getInt(2)} " +
          s"ref=${r.getInt(3)}").mkString("; "))
    }
  }

  test("myers_ed runs inside whole-stage codegen and propagates nulls") {
    GraftFunctions.register(spark)
    val df = spark.range(100)
      .selectExpr("myers_ed(cast(id as string), '50', 2) AS d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [myers_ed"),
      s"myers_ed outside whole-stage codegen:\n$plan")
    assert(df.filter(col("d") >= 0).count() ==
      spark.range(100).selectExpr("levenshtein(cast(id as string), '50', 2) AS d")
        .filter(col("d") >= 0).count())
    val r = spark.sql(
      "SELECT myers_ed(cast(null as string), 'x', 2) AS n").collect()(0)
    assert(r.isNullAt(0))
  }
}
