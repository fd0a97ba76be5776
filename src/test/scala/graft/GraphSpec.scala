package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Invariant specs for the PageRank core on planted graphs — structure
  * properties the DuckDB oracle (which replays the arithmetic, not the
  * graph theory) cannot check. */
class GraphSpec extends SparkTestBase {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    // symmetrize: every undirected pair becomes both directed edges
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst").distinct()
  }

  test("planted star: the hub outranks every spoke, spokes tie exactly") {
    val star = edgesDf((1L to 10L).map(i => (0L, i)))
    val ranks = Graph.pagerankOn(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    val spokes = (1L to 10L).map(ranks)
    assert(spokes.toSet.size == 1, s"spokes must tie exactly: $spokes")
    assert(hub > spokes.head * 5,
      s"hub rank $hub should dominate spoke rank ${spokes.head}")
  }

  test("ring: perfect symmetry gives identical integer ranks summing to ~1e9") {
    val n = 12L
    val ring = edgesDf((0L until n).map(i => (i, (i + 1) % n)))
    val ranks = Graph.pagerankOn(ring).collect().map(_.getLong(1))
    assert(ranks.length == n)
    assert(ranks.toSet.size == 1, "ring nodes must all tie")
    val total = ranks.sum
    // integer rounding leaks at most ~1 nano per node per round
    assert(math.abs(total - 1000000000L) < n * 6,
      s"total mass $total drifted from 1e9")
  }

  test("triangles: K4 has four, a square has none, pendant edges add none") {
    import spark.implicits._
    def und(pairs: (Long, Long)*) = pairs.toDF("a", "b")
    val k4 = und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Graph.trianglesOn(k4).collect().head.getAs[Long]("n_triangles") == 4L)
    spark.catalog.clearCache()
    val square = und((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(Graph.trianglesOn(square).collect().head
      .getAs[Long]("n_triangles") == 0L)
    spark.catalog.clearCache()
    // one triangle + a pendant edge hanging off it
    val tri = und((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    val r = Graph.trianglesOn(tri).collect().head
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_nodes") == 4L && r.getAs[Long]("n_edges") == 4L)
    spark.catalog.clearCache()
  }

  test("modularity: two brand-aligned triangles joined by one bridge " +
    "score 6/7 - 1/2; a brand-orthogonal partition goes negative") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val aligned = Seq((1L, "X"), (2L, "X"), (3L, "X"),
      (4L, "Y"), (5L, "Y"), (6L, "Y")).toDF("p_partkey", "p_brand")
    val rows = operators.Graph.modularityOn(und, aligned).collect()
    assert(rows.length == 2)
    // m=7, each community: e_c=3, d_c=7 => Q = 2*(3/7 - (7/14)^2)
    val q = rows.head.getAs[Double]("modularity")
    assert(math.abs(q - (6.0 / 7.0 - 0.5)) < 1e-5, s"Q=$q")
    rows.foreach { r =>
      assert(r.getAs[Long]("e_c") == 3L && r.getAs[Long]("d_c") == 7L)
    }
    // checkerboard assignment cuts every triangle: internal edges only
    // where parity ties happen; modularity must drop below the aligned Q
    val ortho = Seq((1L, "X"), (2L, "Y"), (3L, "X"),
      (4L, "Y"), (5L, "X"), (6L, "Y")).toDF("p_partkey", "p_brand")
    val q2 = operators.Graph.modularityOn(und, ortho).collect()
      .head.getAs[Double]("modularity")
    assert(q2 < q, s"orthogonal partition must score below aligned: $q2 vs $q")
  }

  test("freq triples: a planted triangle of frequent pairs is counted " +
    "with its exact basket support") {
    import spark.implicits._
    // three baskets {1,2,3} plus one {1,2}: every pair is frequent,
    // the only candidate triangle is (1,2,3) with support 3 and
    // min pair support 3
    val li = (10L to 12L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
      Seq((13L, 1L), (13L, 2L))
    val df = li.toDF("l_orderkey", "l_partkey")
    val got = operators.Graph
      .freqTriplesOn(df, operators.Graph.affinityEdgesOn(df)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("support"), r.getAs[Long]("min_pair_w")))
    assert(got.toSeq == Seq((1L, 2L, 3L, 3L, 3L)), s"got ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("assoc rules: hand baskets give exact confidence and lift, " +
    "ordered by confidence with id tiebreaks") {
    import spark.implicits._
    // baskets: {1,2} x2, {1,3} x2 -> pairs (1,2) w=2, (1,3) w=2;
    // item supports 1:4, 2:2, 3:2; N=4
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 1L), (13L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val und = operators.Graph.affinityEdgesOn(li)
    val got = operators.Graph.assocRulesOn(li, und).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getAs[Long]("pair_support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(got.toSeq == Seq(
      (2L, 1L, 2L, 1.0, 1.0), (3L, 1L, 2L, 1.0, 1.0),
      (1L, 2L, 2L, 0.5, 1.0), (1L, 3L, 2L, 0.5, 1.0)), s"got ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("link prediction: square predicts both diagonals at jaccard 1, " +
    "existing edges are excluded, hub centers contribute no evidence") {
    import spark.implicits._
    // square 1-2-3-4-1: non-edges (1,3) and (2,4) each share BOTH
    // opposite corners -> inter=2, union=2+2-2=2 -> jaccard 1.0
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val got = operators.Graph.linkPredictionOn(square).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("common_nb"),
        r.getAs[Double]("jaccard")))
    assert(got.toSet == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)),
      s"got ${got.toSeq}")
    spark.catalog.clearCache()
    // a path 1-2-3 predicts (1,3) through center 2; an over-cap hub
    // (degree 65 > 64) is excluded as evidence, so its spokes yield
    // NO candidate pairs
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = operators.Graph.linkPredictionOn(path).collect()
    assert(p.length == 1 && p.head.getLong(0) == 1L &&
      p.head.getLong(1) == 3L && p.head.getAs[Double]("jaccard") == 1.0)
    spark.catalog.clearCache()
    val hub = (1L to 65L).map(i => (100L, 100L + i)).toDF("a", "b")
    assert(operators.Graph.linkPredictionOn(hub).isEmpty,
      "over-cap hub must contribute no wedge evidence")
    spark.catalog.clearCache()
    // capped-Jaccard consistency: y and z share an over-cap hub h AND a
    // small center c. The hub is excluded from the intersection, so it
    // must be excluded from the union too: degc(y) = degc(z) = 1 ({c}),
    // inter = 1 -> jaccard 1.0 (the old full-degree union said 1/3)
    val spokes = (1L to 63L).map(i => (500L, 600L + i))
    val mixed = (spokes ++ Seq((500L, 1L), (500L, 2L), (9L, 1L), (9L, 2L)))
      .toDF("a", "b")
    // (a second candidate (9, 500) arises through centers 1 and 2:
    // inter = 2, degc(9) = 2, degc(500) = 65 -> union 65, j = .030769)
    val mx = operators.Graph.linkPredictionOn(mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("common_nb"),
        r.getAs[Long]("union_nb"), r.getAs[Double]("jaccard")))
    assert(mx.toSet == Set((1L, 2L, 1L, 1L, 1.0),
      (9L, 500L, 2L, 65L, 0.030769)), s"got ${mx.toSeq}")
    spark.catalog.clearCache()
  }

  test("k-core: chain periphery peels away, K4 survives to k=3, " +
    "nothing survives k=4") {
    import spark.implicits._
    // K4 on {1..4} with a 5-node chain hanging off node 4
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("a", "b")
    val core2 = Graph.kCoreOn(g, 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core2 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)), s"2-core must be exactly K4, got $core2")
    // cores nest: peeling the 2-core at k=3 equals peeling the full graph
    val core3 = Graph.kCoreOn(Graph.kCoreOn(g, 2), 3).collect()
    assert(core3.length == 6, "K4 is its own 3-core")
    val core4 = Graph.kCoreOn(g, 4)
    assert(core4.count() == 0, "no node has degree >= 4")
    // driverCap = 0 forces the DISTRIBUTED batched peel on the same
    // fixture (the default cap sends sub-100k edge sets to the driver
    // finish) — both paths must reach the identical fixpoint
    val distributed = Graph.kCoreOn(g, 2, driverCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(distributed == core2,
      s"distributed peel must match driver peel, got $distributed")
  }

  test("result is layout-independent: different partitioning, identical ranks") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val a = Graph.pagerankOn(edgesDf(pairs).repartition(3))
      .orderBy("node").collect().toSeq
    spark.catalog.clearCache()
    val b = Graph.pagerankOn(edgesDf(pairs).repartition(7))
      .orderBy("node").collect().toSeq
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("giant-order cap: an over-cap order contributes no edges, sane " +
    "orders are untouched") {
    import spark.implicits._
    // two normal orders sharing parts, plus one pathological order with
    // ORDER_CAP+1 distinct parts (the merged-cart / ingestion-bug shape
    // whose |order|² explode the cap exists to prevent)
    val giant = (1000L to 1000L + Graph.ORDER_CAP).map(p => (99L, p))
    val sane = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
    val li = (sane ++ giant).toDF("l_orderkey", "l_partkey")

    val directed = Graph.copurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // order 1 yields all 6 directed pairs of {10,11,12}; order 2 adds
    // nothing new except the 10↔11 pair it shares with order 1
    val expected = Set((10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L),
      (11L, 12L), (12L, 11L))
    assert(directed == expected,
      s"giant order leaked into the directed edge set: $directed")

    // affinity build: {10,11} co-occur in 2 orders (≥ support), {10,12}
    // and {11,12} only once — and nothing from the giant order
    val und = Graph.affinityEdgesOn(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(und == Set((10L, 11L)),
      s"affinity edges wrong under the cap: $und")
  }

  test("assortativity: star is maximally disassortative, cycle is NULL") {
    import spark.implicits._
    // star K1,3: hub degree 3 meets leaves of degree 1 on every edge —
    // the textbook r = −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val rs = Graph.assortativityOn(star).collect().head
    assert(rs.getLong(0) == 3L)
    assert(rs.getDouble(1) == -1.0, s"star assortativity: $rs")
    // 4-cycle: every degree is 2 — zero variance must yield NULL, not a
    // divide error
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val rc = Graph.assortativityOn(cyc).collect().head
    assert(rc.getLong(0) == 4L && rc.isNullAt(1), s"cycle: $rc")
  }
}
