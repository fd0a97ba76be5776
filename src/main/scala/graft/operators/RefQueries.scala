package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Reference-parity analytics queries.
  *
  * The reference's analytics job is specified (not coded) in
  * `/root/reference/README.md:13-26`: join two bucket-partitioned fact
  * tables plus explicitly-broadcast small dimensions, then answer four
  * "which X most" group-by/argmax questions, with automatic broadcast
  * disabled so the physical strategies are deliberate. The Halo schema has
  * no data in this harness, so each query re-targets the same semantics
  * onto the isomorphic TPC-H-ish star schema (SURVEY.md §7.1):
  * `lineitem`≈`match_details` (big fact), `orders`≈`matches` (bridge fact),
  * `customer`/`part`/`supplier`/`nation`/`region` ≈ the broadcastable dims.
  *
  * Scale posture: fact⋈fact joins shuffle on the join key (at 100 TB this
  * is the co-bucketed/bucket-join path — see graft.sources.Ddl for the
  * shuffle-free layout and its plan-shape test); every dim join carries an
  * explicit `broadcast()` hint so the plan stays correct even with
  * `spark.sql.autoBroadcastJoinThreshold=-1` (README.md:16-17) and never
  * shuffles the fact side for a dimension lookup.
  */
object RefQueries {

  /** Flagship (SURVEY §7.2): "which customer averages the highest quantity
    * per order line" — the A1 analog ("which player averages the most kills
    * per game", README.md:20). lineitem⋈orders on the shared key (bucket-join
    * analog), broadcast customer, aggregate, argmax. */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(Fmt.fix4(avg("l_quantity")).as("avg_qty"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("avg_qty").desc, col("c_custkey").asc)
      .limit(1)
  }

  private val flagshipSql =
    """SELECT c_custkey, c_name, floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY avg_qty DESC, c_custkey LIMIT 1""".stripMargin

  /** Pricing-summary scan+agg (TPC-H Q1 shape): single wide fact, predicate
    * pushed to the parquet scan, hash aggregate with partial/final phases
    * (SURVEY §2.4 A5). At 100 TB this is scan-bound: the shipdate filter and
    * 7-column ReadSchema must reach the scan — asserted in PlanShapeSpec. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        Fmt.fix4(avg("l_quantity")).as("avg_qty"),
        // l_discount is 2-decimal but NON-integer-valued in double, so
        // fix4(avg(double)) is summation-order-dependent (the r12
        // q_correlated class): sum exact 1e-2 units as BIGINT, then one
        // deterministic divide. avg*1e4 = sum_units*100/n.
        (floor(sum(floor(col("l_discount") * lit(100.0d) + lit(0.5d)))
          .cast("double") * lit(100.0d) / count(lit(1)) + lit(0.5d))
          / lit(10000.0d)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice), 4) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |       floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
      |       floor(sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
      |             * 100.0 / count(*) + 0.5) / 10000.0 AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Fact⋈fact join + agg — the bucket-join analog (README.md:18,
    * `match_details ⋈ matches` on match_id → `lineitem ⋈ orders` on
    * orderkey). In catalog form both sides are bucketed 16-way on the key
    * (graft.sources.Ddl) and the exchange is elided; reading raw parquet the
    * join shuffles both sides once on the key, which AQE sizes. */
  def bucketJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  private val bucketJoinAggSql =
    """SELECT o_orderpriority,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Explicit broadcast of two small dims onto the fact (README.md:17:
    * "Explicitly broadcast JOINs medals and maps"). part and supplier stand
    * in for the dims; the fact side never shuffles. */
  def broadcastDims(s: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(s, dir)
    val p   = Tables.part(s, dir)
    val sup = Tables.supplier(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .groupBy("p_brand")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        countDistinct("s_suppkey").as("n_suppliers"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  private val broadcastDimsSql =
    """SELECT p_brand,
      |       round(sum(l_quantity), 4) AS sum_qty,
      |       count(DISTINCT s_suppkey) AS n_suppliers,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** A2 analog ("which playlist gets played the most", README.md:21):
    * distinct-count + count by a low-cardinality attribute. countDistinct
    * expands to a two-phase shuffle; at 100 TB swap in
    * approx_count_distinct when exactness isn't required (q_rollup shows
    * the sketch variant). */
  def priorityDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private val priorityDistinctSql =
    """SELECT o_orderpriority,
      |       count(DISTINCT o_custkey) AS n_customers,
      |       count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** A3 analog ("which map gets played the most", README.md:22): fact rolled
    * up through a broadcast dim hierarchy (customer→nation→region). */
  def dimHierarchy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"),
           // exact cents before ONE divide — fix4(avg(c_acctbal)) is the
           // order-dependent r12 q_correlated class (see JoinsPlus)
           (floor(sum(floor(col("c_acctbal") * lit(100.0d) + lit(0.5d)))
             .cast("double") * lit(100.0d) / count(lit(1)) + lit(0.5d))
             / lit(10000.0d)).as("avg_bal"))
      .orderBy("r_name", "n_name")
  }

  private val dimHierarchySql =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |       floor(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
      |             * 100.0 / count(*) + 0.5) / 10000.0 AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** A4 analog ("which map do players get the most Killing Spree medals on",
    * README.md:23): filter a dim attribute, then roll the fact up a second
    * hierarchy. The p_brand predicate is applied under the broadcast, so only
    * matching part rows ship to executors. */
  def filteredDimAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
           count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  private val filteredDimAggSql =
    """SELECT r_name, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** TPC-H Q3 analog (shipping priority): segment-filtered customers ⋈
    * unshipped-as-of-date orders ⋈ post-date lineitems → top-10 orders by
    * revenue. External-comparability classic (VERDICT r12 #8). Revenue
    * accumulates as EXACT 1e-6-dollar BIGINT units (cents × (10000 −
    * discount·10⁴) — both factors on their decimal grids), summed in
    * decimal(38,0), so the DESC sort key is an exact integer in both
    * engines — a raw-double revenue sort flips at FP-sum ulp ties. No
    * broadcast hint: customer is a FACT-sized table at 100 TB; AQE
    * picks broadcast at small SF and sort-merge at scale. */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cut = to_timestamp(lit("1998-03-15"))
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          * (lit(10000L) - floor(col("l_discount") * lit(10000.0d)
            + lit(0.5d)))).as("rev_u6"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("rev_u6").cast("decimal(38,0)")).as("rev_u6"))
      .orderBy(col("rev_u6").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        (floor(col("rev_u6").cast("double") / lit(100.0d) + lit(0.5d))
          / lit(10000.0d)).as("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
  }

  private val tpchQ3Sql =
    """WITH t AS (
      |  SELECT l_orderkey,
      |         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
      |             * (10000 - CAST(floor(l_discount * 10000.0 + 0.5)
      |                             AS BIGINT))) AS rev_u6,
      |         o_orderdate, o_orderpriority
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1998-03-15'
      |    AND l_shipdate > TIMESTAMP '1998-03-15'
      |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |  ORDER BY rev_u6 DESC, l_orderkey LIMIT 10)
      |SELECT l_orderkey,
      |       floor(rev_u6 / 100.0 + 0.5) / 10000.0 AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_orderpriority
      |FROM t ORDER BY revenue DESC, l_orderkey""".stripMargin

  /** TPC-H Q18 analog (large-volume customers): orders whose total
    * quantity exceeds the threshold, with their customer. The HAVING
    * side aggregates lineitem BY ITS JOIN KEY (l_orderkey), so the agg
    * and the orders join share one hash partitioning — the
    * co-partitioned semi-join shape that never rescans the fact. Sums
    * are exact (l_quantity is integer-valued); the top-100 sort keys
    * are a raw stored double (bit-identical in both engines, no
    * arithmetic) plus the unique o_orderkey tiebreak. */
  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 250)
    big.join(Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  private val tpchQ18Sql =
    """SELECT c_name, c_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_totalprice, total_qty
      |FROM (SELECT l_orderkey,
      |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |               AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(CAST(l_quantity AS BIGINT)) > 250) t
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** O2: global top-k — Spark plans orderBy+limit as
    * TakeOrderedAndProject (per-partition heap + driver merge of k rows),
    * never a full global sort; this is the argmax shape of README.md:19-23
    * and stays O(k) in driver memory at any scale. */
  def topLineitems(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
               col("l_linenumber").asc)
      .limit(100)

  private val topLineitemsSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** TPC-H Q5 (local supplier volume) — the canonical 6-way star join:
    * revenue by nation for orders shipped within a region and year where
    * the CUSTOMER's and SUPPLIER's nations coincide (the join-graph
    * cycle that makes Q5 the optimizer-benchmark classic — customer and
    * supplier both bind to nation). Physical shape: region/nation/
    * supplier broadcast (bounded dims), customer⋈orders and
    * lineitem⋈orders shuffle on their keys, the date filter pushes to
    * the orders scan.
    *
    * Exactness: revenue = Σ ext_cents·(100 − disc_cents) as exact
    * integer 1e-4-dollar units (DECIMAL(38,0) sums), ONE final division
    * for display, fix4 ([[Profiling.corrMatrix]] discipline — TPC-H's
    * own sum(l_extendedprice·(1−l_discount)) is FP-order-dependent). */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // compare the raw timestamp (cast the LITERAL to the column's own
    // type): to_date(o_orderdate) >= d is semantically identical but
    // wraps the column and blocks parquet predicate pushdown
    val rawOrders = Tables.orders(s, dir)
    val tsType = rawOrders.schema("o_orderdate").dataType
    val o = rawOrders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(tsType)
        && col("o_orderdate") < lit("1997-01-01").cast(tsType))
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey")
        && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(sum((floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
        .cast("decimal(38,0)")
        * (lit(100L) - floor(col("l_discount") * lit(100.0d) + lit(0.5d))
          .cast("bigint"))).as("r4")).as("rev4"))
      .select(col("n_name"),
        (floor(col("rev4").cast("double") / lit(10000.0d)
          * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  private val tpchQ5Sql =
    """SELECT n_name,
      |       floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
      |                          AS DECIMAL(38,0))
      |                     * (100 - CAST(floor(l_discount * 100.0 + 0.5)
      |                               AS BIGINT))) AS DOUBLE)
      |             / 10000.0 * 10000.0 + 0.5) / 10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      | AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q7 analog (volume shipping): revenue flowing between the two
    * nations of a trading pair, by supplier nation × customer nation ×
    * ship year — the two-nation semi-cycle (nation binds once through
    * supplier and once through customer, and the pair predicate accepts
    * only the two cross terms). With both sides restricted to the pair,
    * `(n1=A ∧ n2=B) ∨ (n1=B ∧ n2=A)` is exactly `supp_nation ≠
    * cust_nation` — applied AFTER the broadcast dims attach, so it
    * never blocks pushdown. Physical shape: nation-filtered supplier
    * broadcasts (bounded dim); the date filter pushes to the lineitem
    * scan; lineitem⋈orders shuffles on orderkey and the
    * customer join on custkey — the two fact exchanges Q7 actually
    * needs. Revenue is exact 1e-6-dollar units summed in decimal(38,0)
    * (the [[tpchQ3]] discipline), one display divide at the end. */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_11", "NATION_12")
    val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables.customer(s, dir)
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .select("c_custkey", "cust_nation")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01"))
        && col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          * (lit(10000L) - floor(col("l_discount") * lit(10000.0d)
            + lit(0.5d)))).as("rev_u6"))
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev_u6").cast("decimal(38,0)")).as("rev_u6"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (floor(col("rev_u6").cast("double") / lit(100.0d) + lit(0.5d))
          / lit(10000.0d)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val tpchQ7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |       floor(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
      |                          AS DECIMAL(38,0))
      |                     * (10000 - CAST(floor(l_discount * 10000.0 + 0.5)
      |                                AS BIGINT))) AS DOUBLE)
      |             / 100.0 + 0.5) / 10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12') OR
      |       (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q10 analog (returned-item reporting): the 20 customers who
    * returned the most revenue in a half-year order window. Scale shape:
    * the return-flag filter pushes to the lineitem scan and the date
    * filter to the orders scan; revenue pre-aggregates per o_custkey
    * BEFORE any customer attribute attaches, so the customer join and
    * the nation broadcast see 20 rows, not the fact (aggregate-then-
    * join, the flagship discipline — TPC-H's canonical group-by-all-
    * customer-attrs shape drags the dim columns through the fact agg).
    * Top-20 sorts on the EXACT integer revenue with the unique custkey
    * tiebreak; display divides once ([[tpchQ3]]). */
  def tpchQ10(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01"))
        && col("o_orderdate") < to_timestamp(lit("1996-07-01")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          * (lit(10000L) - floor(col("l_discount") * lit(10000.0d)
            + lit(0.5d)))).as("rev_u6"))
    val top = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev_u6").cast("decimal(38,0)")).as("rev_u6"))
      .orderBy(col("rev_u6").desc, col("o_custkey").asc)
      .limit(20)
    top
      .join(Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        (floor(col("rev_u6").cast("double") / lit(100.0d) + lit(0.5d))
          / lit(10000.0d)).as("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
  }

  private val tpchQ10Sql =
    """WITH t AS (
      |  SELECT o_custkey,
      |         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
      |             * (10000 - CAST(floor(l_discount * 10000.0 + 0.5)
      |                             AS BIGINT))) AS rev_u6
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  GROUP BY o_custkey
      |  ORDER BY rev_u6 DESC, o_custkey LIMIT 20)
      |SELECT c_custkey, c_name,
      |       floor(rev_u6 / 100.0 + 0.5) / 10000.0 AS revenue,
      |       c_acctbal, n_name
      |FROM t
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey""".stripMargin

  /** TPC-H Q14 analog (promotion effect): the revenue share of PROMO
    * parts in a ship-date window — the conditional-aggregate-ratio
    * shape. Part broadcasts (bounded dim), the date filter pushes to
    * the lineitem scan, and ONE aggregate computes both branches
    * (`sum(when(...))`) instead of two scans. Numerator and
    * denominator each sum exact 1e-6-dollar units in decimal(38,0);
    * the percentage is then one deterministic double divide, fix4'd —
    * the ratio-of-exact-sums discipline ([[tpchQ5]]). */
  def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01"))
        && col("l_shipdate") < to_timestamp(lit("1997-07-01")))
      .select(col("l_partkey"),
        (floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          * (lit(10000L) - floor(col("l_discount") * lit(10000.0d)
            + lit(0.5d)))).as("rev_u6"))
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_u6"))
          .otherwise(lit(0L)).cast("decimal(38,0)")).as("promo_u6"),
        sum(col("rev_u6").cast("decimal(38,0)")).as("total_u6"),
        sum(when(col("p_type") === "PROMO", 1L).otherwise(0L))
          .as("promo_lines"),
        count(lit(1)).as("n_lines"))
      .select(
        (floor(col("promo_u6").cast("double") / col("total_u6").cast("double")
          * lit(1000000.0d) + lit(0.5d)) / lit(10000.0d)).as("promo_pct"),
        col("promo_lines"), col("n_lines"))
  }

  private val tpchQ14Sql =
    """SELECT floor(CAST(sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END)
      |                  AS DOUBLE)
      |             / CAST(sum(r) AS DOUBLE) * 1000000.0 + 0.5) / 10000.0
      |         AS promo_pct,
      |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS promo_lines,
      |       count(*) AS n_lines
      |FROM (SELECT p_type,
      |             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
      |             * (10000 - CAST(floor(l_discount * 10000.0 + 0.5)
      |                             AS BIGINT)) AS r
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')""".stripMargin

  /** TPC-H Q16 analog (parts/supplier relationship): how many distinct
    * suppliers ship each (brand, type, size) combination, over a size
    * IN-list, excluding one brand and excluding "complaint" suppliers
    * (negative account balance stands in for TPC-H's comment-text
    * predicate). The exclusion subquery plans as a broadcast LEFT ANTI
    * join — the null-FREE `NOT IN` plan (s_suppkey is non-nullable;
    * the null-aware BNLJ case is q_null_anti's job). lineitem's
    * (partkey, suppkey) pairs stand in for partsupp; part broadcasts,
    * so the only fact exchange is the two-phase distinct aggregate on
    * (brand, type, size, suppkey). Top-40 with full tiebreak. */
  def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 9, 14, 19, 23, 36, 45, 49)
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#3" && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
      .limit(40)
  }

  private val tpchQ16Sql =
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 40""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_tpch_q14", tpchQ14, Some(tpchQ14Sql),
      doc = "TPC-H Q14 promotion effect: conditional-aggregate revenue " +
        "ratio from exact integer sums, broadcast part dim"),
    Q("q_tpch_q16", tpchQ16, Some(tpchQ16Sql),
      doc = "TPC-H Q16 supplier-count: distinct-count by part attrs " +
        "with broadcast anti-join supplier exclusion"),
    Q("q_tpch_q7", tpchQ7, Some(tpchQ7Sql),
      doc = "TPC-H Q7 volume-shipping: two-nation semi-cycle (nation " +
        "binds via supplier AND customer), exact integer revenue by " +
        "supp/cust nation and ship year"),
    Q("q_tpch_q10", tpchQ10, Some(tpchQ10Sql),
      doc = "TPC-H Q10 returned-item revenue: pushed returnflag/date " +
        "filters, aggregate-then-join top-20 customers on the exact " +
        "integer revenue key"),
    Q("q_tpch_q3", tpchQ3, Some(tpchQ3Sql),
      doc = "TPC-H Q3 analog: top-10 unshipped orders by revenue " +
        "(exact integer-unit revenue sort)"),
    Q("q_tpch_q18", tpchQ18, Some(tpchQ18Sql),
      doc = "TPC-H Q18 analog: large-volume customers via the " +
        "co-partitioned HAVING semi-join"),
    Q("q_tpch_q5", tpchQ5, Some(tpchQ5Sql),
      doc = "TPC-H Q5 local-supplier-volume: the 6-way star join with " +
        "the customer=supplier nation cycle, exact integer revenue in " +
        "1e-4-dollar units, broadcast dims + pushed date filter"),
    Q("q_flagship_top_customer", flagship, Some(flagshipSql)),
    Q("q_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    Q("q_bucket_join_agg", bucketJoinAgg, Some(bucketJoinAggSql)),
    Q("q_broadcast_dims", broadcastDims, Some(broadcastDimsSql)),
    Q("q_priority_distinct", priorityDistinct, Some(priorityDistinctSql)),
    Q("q_dim_hierarchy", dimHierarchy, Some(dimHierarchySql)),
    Q("q_filtered_dim_agg", filteredDimAgg, Some(filteredDimAggSql)),
    Q("q_top_lineitems", topLineitems, Some(topLineitemsSql)))
}
