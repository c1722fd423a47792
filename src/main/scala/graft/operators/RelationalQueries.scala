package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage: scan+filter+project, hash
  * aggregation, broadcast + shuffle joins, semi/anti joins, windows,
  * set ops, top-k.
  *
  * Scale notes (100 TB design):
  *  - Dimension tables (region/nation/supplier/part at these SFs, and in
  *    TPC-H generally region/nation always) are broadcast explicitly so
  *    the fact-table scan never shuffles for them.
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key — both
  *    sides are pre-projected to the needed columns so the shuffle
  *    payload is minimal; at warehouse scale these tables would be
  *    bucketed by orderkey to eliminate the shuffle entirely.
  *  - Aggregations are expressed as single groupBy so Catalyst plans
  *    partial (map-side) aggregation before the exchange.
  */
object RelationalQueries {

  // Pricing summary (TPC-H Q1 shape): single scan, partial-agg friendly.
  private val q1 = QuerySpec.of(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  (floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2) AS sum_qty,
      |  (floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2) AS sum_base_price,
      |  (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2) AS sum_disc_price,
      |  (floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1e2 + 0.5) / 1e2) AS sum_charge,
      |  (floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4) AS avg_qty,
      |  (floor((avg(l_extendedprice)) * 1e4 + 0.5) / 1e4) AS avg_price,
      |  (floor((avg(l_discount)) * 1e6 + 0.5) / 1e6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    headline = true) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (floor((sum("l_quantity")) * 1e2 + 0.5) / 1e2).as("sum_qty"),
        (floor((sum("l_extendedprice")) * 1e2 + 0.5) / 1e2).as("sum_base_price"),
        (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e2 + 0.5) / 1e2)
          .as("sum_disc_price"),
        (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))) * 1e2 + 0.5) / 1e2).as("sum_charge"),
        (floor((avg("l_quantity")) * 1e4 + 0.5) / 1e4).as("avg_qty"),
        (floor((avg("l_extendedprice")) * 1e4 + 0.5) / 1e4).as("avg_price"),
        (floor((avg("l_discount")) * 1e6 + 0.5) / 1e6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // Forecast revenue (TPC-H Q6 shape): tight filter, scalar agg —
  // exercises predicate pushdown to the parquet scan.
  private val q6 = QuerySpec.of(
    "q6_forecast_revenue",
    """SELECT (floor((sum(l_extendedprice * l_discount)) * 1e2 + 0.5) / 1e2) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin,
    headline = true) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.03, 0.07)
        && col("l_quantity") < 24)
      .agg(
        (floor((sum(col("l_extendedprice") * col("l_discount"))) * 1e2 + 0.5) / 1e2).as("revenue"),
        count(lit(1)).as("n"))
  }

  // Shipping-priority top-k (TPC-H Q3 shape): fact⋈fact shuffle join +
  // agg + deterministic top 10.
  private val q3 = QuerySpec.of(
    "q3_top_orders",
    """SELECT l_orderkey,
      |  (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_orderpriority
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin,
    headline = true) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e2 + 0.5) / 1e2)
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // Region revenue (TPC-H Q5 shape): 5-way join; all dims broadcast.
  private val q5 = QuerySpec.of(
    "q5_region_revenue",
    """SELECT n_name,
      |  (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin,
    headline = true) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_regionkey", "n_name")
    val r = Tables.region(s, d)
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .select("r_regionkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e2 + 0.5) / 1e2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  // Order-priority count (TPC-H Q4 shape): left-semi join (EXISTS).
  private val q4 = QuerySpec.of(
    "q4_priority_semi",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(li,
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // Customers with no recent orders: left-anti join (NOT EXISTS).
  private val qAnti = QuerySpec.of(
    "q_customers_no_recent_orders",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // Supplier revenue rank within nation: shuffle agg + window rank.
  private val qWindow = QuerySpec.of(
    "q_supplier_rank_window",
    """WITH rev AS (
      |  SELECT l_suppkey, (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2) AS revenue
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, n_name, revenue,
      |  rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS rnk,
      |  (floor((sum(revenue) OVER (PARTITION BY n_name)) * 1e2 + 0.5) / 1e2) AS nation_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY n_name, rnk, s_suppkey""".stripMargin,
    headline = true) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e2 + 0.5) / 1e2)
        .as("revenue"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    val w = Window.partitionBy("n_name")
      .orderBy(col("revenue").desc, col("s_suppkey"))
    rev.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("revenue"),
        rank().over(w).as("rnk"),
        (floor((sum("revenue").over(Window.partitionBy("n_name"))) * 1e2 + 0.5) / 1e2)
          .as("nation_revenue"))
      .orderBy(col("n_name"), col("rnk"), col("s_suppkey"))
  }

  // Market-segment stats: distinct aggregation + conditional aggregation.
  private val qSegment = QuerySpec.of(
    "q_segment_stats",
    """SELECT c_mktsegment,
      |  count(DISTINCT o_custkey) AS active_customers,
      |  count(*) AS n_orders,
      |  (floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END)) * 1e2 + 0.5) / 1e2) AS finished_value,
      |  (floor((max(o_totalprice)) * 1e2 + 0.5) / 1e2) AS max_order
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct("o_custkey").as("active_customers"),
        count(lit(1)).as("n_orders"),
        (floor((sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0))) * 1e2 + 0.5) / 1e2).as("finished_value"),
        (floor((max("o_totalprice")) * 1e2 + 0.5) / 1e2).as("max_order"))
      .orderBy("c_mktsegment")
  }

  // Set operation: parts sold in early window UNION-minus-INTERSECT late
  // window — exercises union/intersect/except distinct semantics.
  private val qSetOps = QuerySpec.of(
    "q_part_setops",
    """WITH early AS (SELECT DISTINCT l_partkey FROM lineitem
      |               WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
      |     late AS (SELECT DISTINCT l_partkey FROM lineitem
      |              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
      |SELECT 'both' AS bucket, count(*) AS n FROM (SELECT * FROM early INTERSECT SELECT * FROM late) t
      |UNION ALL
      |SELECT 'early_only' AS bucket, count(*) AS n FROM (SELECT * FROM early EXCEPT SELECT * FROM late) t
      |UNION ALL
      |SELECT 'late_only' AS bucket, count(*) AS n FROM (SELECT * FROM late EXCEPT SELECT * FROM early) t
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select("l_partkey", "l_shipdate")
    val cut = lit("1997-01-01").cast("timestamp")
    val early = li.filter(col("l_shipdate") < cut).select("l_partkey").distinct()
    val late = li.filter(col("l_shipdate") >= cut).select("l_partkey").distinct()
    val both = early.intersect(late).agg(count(lit(1)).as("n"))
      .select(lit("both").as("bucket"), col("n"))
    val earlyOnly = early.except(late).agg(count(lit(1)).as("n"))
      .select(lit("early_only").as("bucket"), col("n"))
    val lateOnly = late.except(early).agg(count(lit(1)).as("n"))
      .select(lit("late_only").as("bucket"), col("n"))
    both.unionByName(earlyOnly).unionByName(lateOnly).orderBy("bucket")
  }

  // Top customers by revenue (TPC-H Q10 shape) — join + agg + top-k.
  private val qTopCustomers = QuerySpec.of(
    "q10_top_customers",
    """SELECT c_custkey, c_name, n_name,
      |  (floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2) AS revenue
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin,
    headline = true) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg((floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 1e2 + 0.5) / 1e2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // Promotion revenue share (TPC-H Q14 shape), in EXACT integers:
  // prices and discounts are 2-decimal, so revenue×10⁴ =
  // price_cents·(100 − discount_cents) is an exact bigint per row and
  // the promo share is integer basis points — no cross-row float sum
  // for either engine to disagree on. Fact side filters on the
  // pushed-down shipdate range; the part dim broadcasts.
  private val q14 = QuerySpec.of(
    "q14_promo_revenue",
    """WITH j AS (
      |  SELECT p_type,
      |    CAST(floor((l_extendedprice * 100) + 0.5) AS BIGINT)
      |      * (100 - CAST(floor((l_discount * 100) + 0.5) AS BIGINT)) AS rev_e4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
      |SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
      |    AS BIGINT) AS promo_rev_e4,
      |  CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
      |    * 10000 // sum(rev_e4) AS BIGINT) AS promo_share_bp
      |FROM j""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .select(col("l_partkey"),
        (expr("CAST(floor((l_extendedprice * 100) + 0.5) AS BIGINT)")
          * (lit(100) - expr(
            "CAST(floor((l_discount * 100) + 0.5) AS BIGINT)")))
          .as("rev_e4"))
    val p = Tables.part(s, d).select("p_partkey", "p_type")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_e4")).otherwise(0L))
          .as("promo_rev_e4"),
        sum("rev_e4").as("total_rev_e4"),
        expr("CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)" +
          " * 10000 DIV sum(rev_e4) AS BIGINT)").as("promo_share_bp"))
  }

  // Hierarchical ROLLUP over (year, month): the OLAP drill-down
  // surface — Spark's `rollup` and DuckDB's GROUP BY ROLLUP both emit
  // the subtotal rows with NULL grouped columns; both are coalesced to
  // -1 so the sorted-row compare never depends on engine NULL ordering.
  // Money is summed as exact integer cents (see QuerySpec scaladoc).
  private val qRollup = QuerySpec.of(
    "q_rollup_revenue",
    """SELECT coalesce(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), -1) AS y,
      |  coalesce(CAST(EXTRACT(month FROM o_orderdate) AS BIGINT), -1) AS m,
      |  CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate),
      |                 EXTRACT(month FROM o_orderdate))
      |ORDER BY y, m""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).cast("bigint").as("y"),
        month(col("o_orderdate")).cast("bigint").as("m"),
        expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)").as("cents"))
      .rollup("y", "m")
      .agg(sum("cents").as("revenue_cents"), count(lit(1)).as("n_orders"))
      .select(coalesce(col("y"), lit(-1L)).as("y"),
        coalesce(col("m"), lit(-1L)).as("m"),
        col("revenue_cents"), col("n_orders"))
      .orderBy("y", "m")
  }

  // RFM segmentation: per-customer recency/frequency/monetary quartiles
  // via ntile windows PARTITIONED by market segment (a global ntile
  // would be a global sort — partitioning by segment keeps each window
  // a within-partition sort at warehouse scale), then a rollup of
  // segment×RFM-cell populations. Ties inside each ntile ordering are
  // broken by custkey so the bucket assignment is deterministic in both
  // engines (ntile's floor/ceil bucket-size split is part of the SQL
  // standard and identical in Spark and DuckDB).
  private val qRfm = QuerySpec.of(
    "q_customer_rfm",
    """WITH m AS (
      |  SELECT c_mktsegment AS segment, o_custkey AS custkey,
      |    max(o_orderdate) AS last_order,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rfm AS (
      |  SELECT segment,
      |    ntile(4) OVER (PARTITION BY segment
      |                   ORDER BY last_order DESC, custkey) AS r_q,
      |    ntile(4) OVER (PARTITION BY segment
      |                   ORDER BY frequency DESC, custkey) AS f_q,
      |    ntile(4) OVER (PARTITION BY segment
      |                   ORDER BY monetary_cents DESC, custkey) AS m_q,
      |    monetary_cents
      |  FROM m)
      |SELECT segment, r_q, f_q, m_q, count(*) AS n_customers,
      |  CAST(sum(monetary_cents) AS BIGINT) AS cell_value_cents
      |FROM rfm
      |GROUP BY segment, r_q, f_q, m_q
      |ORDER BY segment, r_q, f_q, m_q""".stripMargin) { (s, d) =>
    val m = Tables.orders(s, d)
      .join(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_custkey").as("custkey"))
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)"))
          .as("monetary_cents"))
    def q(orderCol: String) = ntile(4).over(Window.partitionBy("segment")
      .orderBy(col(orderCol).desc, col("custkey")))
    m.select(col("segment"),
        q("last_order").as("r_q"), q("frequency").as("f_q"),
        q("monetary_cents").as("m_q"), col("monetary_cents"))
      .groupBy("segment", "r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        sum("monetary_cents").as("cell_value_cents"))
      .orderBy("segment", "r_q", "f_q", "m_q")
  }

  // Market-basket pair mining: parts co-ordered in the same order,
  // counted across orders, top 25. The pair space is generated by an
  // equi-join on orderkey over the DISTINCT (order, part) set — per-
  // order pair fan-out is bounded by order width (≤7 lines in TPC-H),
  // so the join output is O(rows · width), never quadratic in the
  // table; the top-k is TakeOrdered (no global sort materialized).
  private val qBasket = QuerySpec.of(
    "q_basket_pairs",
    """WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |  count(*) AS n_orders
      |FROM po a JOIN po b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY part_a, part_b
      |ORDER BY n_orders DESC, part_a, part_b
      |LIMIT 25""".stripMargin) { (s, d) =>
    val po = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey").distinct()
    val a = po.toDF("o", "part_a")
    val b = po.toDF("o2", "part_b")
    a.join(b, col("o") === col("o2") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(25)
  }

  // Column profiler: per-column null count, exact distinct count, and
  // canonical min/max over every lineitem column — the data-quality
  // summary an ingest pipeline emits per batch. One narrow
  // column-pruned scan per column (parquet reads just that column's
  // pages), each with its own partial-agg distinct — deliberately NOT
  // a single 11-distinct aggregate, whose Expand would ship every
  // full row ×12 through one exchange and sort-spill at scale; the
  // per-column shape exchanges only (value) pairs. At 100 TB the
  // distinct counts would flip to HLL sketches (the portable-sketch
  // path q_events_hll_users demonstrates) with everything else
  // unchanged. Min/max canonicalize to strings type-faithfully:
  // doubles as exact integer cents, timestamps as ISO seconds — no
  // engine-specific float formatting anywhere.
  private val profInts =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
  private val profDbls =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val profStrs = Seq("l_returnflag", "l_linestatus")
  private val profTss = Seq("l_shipdate")

  private val qProfile = QuerySpec.of(
    "q_profile_columns", {
      def block(c: String, mn: String, mx: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  $mn AS min_repr, $mx AS max_repr FROM lineitem""".stripMargin
      val blocks =
        profInts.map(c => block(c,
          s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")) ++
        profDbls.map(c => block(c,
          s"CAST(CAST(floor((min($c) * 100) + 0.5) AS BIGINT) AS VARCHAR)",
          s"CAST(CAST(floor((max($c) * 100) + 0.5) AS BIGINT) AS VARCHAR)")) ++
        profStrs.map(c => block(c, s"min($c)", s"max($c)")) ++
        profTss.map(c => block(c,
          s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(max($c), '%Y-%m-%d %H:%M:%S')"))
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val all = profInts ++ profDbls ++ profStrs ++ profTss
    def repr(c: String, side: String) =
      if (profDbls.contains(c))
        expr(s"CAST(CAST(floor(($side * 100) + 0.5) AS BIGINT) AS STRING)")
      else if (profTss.contains(c))
        date_format(col(side), "yyyy-MM-dd HH:mm:ss")
      else col(side).cast("string")
    def colStats(c: String): DataFrame =
      li.select(col(c))
        .agg(count(lit(1)).as("n_rows"), count(col(c)).as("nn"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).as("mn"), max(col(c)).as("mx"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("nn")).as("n_null"), col("n_distinct"),
          repr(c, "mn").as("min_repr"), repr(c, "mx").as("max_repr"))
    all.map(colStats).reduce(_.unionByName(_)).orderBy("col_name")
  }

  // Bucketed co-located join: both sides are written bucketed by the
  // join key (8 buckets, sorted within bucket), so the join planner
  // reads bucket i against bucket i directly — NO exchange on either
  // side of the join (BucketedJoinSpec pins that on the physical
  // plan). This is the warehouse-scale mechanism every fact⋈fact
  // scale note in this repo defers to: pay one shuffle at WRITE time,
  // then every subsequent join on the bucket key is shuffle-free.
  // The scratch tables live in a per-call temp dir (external tables,
  // dropped and deleted after the result is checkpointed).
  private val BucketN = 8

  /** Registers `df` as an external bucketed table and returns it. */
  private def writeBucketed(s: SparkSession, df: DataFrame, name: String,
      key: String, dir: String): DataFrame = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.write.format("parquet")
      .bucketBy(BucketN, key).sortBy(key)
      .option("path", s"$dir/$name")
      .mode("overwrite")
      .saveAsTable(name)
    s.table(name)
  }

  /** The bucketed orders⋈customer join, exposed for the plan spec. */
  private[graft] def bucketedJoin(s: SparkSession, d: String,
      dir: String): DataFrame = {
    val o = writeBucketed(s, Tables.orders(s, d)
        .select("o_custkey", "o_totalprice"),
      "graft_bkt_orders", "o_custkey", dir)
    val c = writeBucketed(s, Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment"),
      "graft_bkt_customer", "c_custkey", dir)
    // merge hint: at this SF the dim side would broadcast; the point
    // is the fact⋈fact shape, where SMJ over co-bucketed sorted data
    // needs neither exchange NOR sort
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
  }

  private val qBucketed = QuerySpec.of(
    "q_bucketed_join",
    """SELECT c_mktsegment,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val dir = graft.TempDirs.scoped("graft_bkt_").toString
    try {
      bucketedJoin(s, d, dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)"))
            .as("revenue_cents"))
        .orderBy("c_mktsegment")
        .localCheckpoint() // the scratch tables are dropped on return
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      s.sql("DROP TABLE IF EXISTS graft_bkt_customer")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  // MERGE INTO (upsert/delete apply): a deterministic changeset —
  // deletes, +10% price updates, and new-key inserts, each selected
  // by an independent hash of the order key (like q_corpus_diff's
  // simulated snapshot) — applied to orders with MERGE semantics:
  // matched+delete → drop, matched+update → replace, not-matched →
  // insert. Expressed Spark-first as anti-join the delete/update
  // keys, union the rewritten and inserted rows — the shape a Delta
  // MERGE compiles to, minus the transaction log. The per-status
  // member_md5 over the ordered surviving key list proves the exact
  // post-merge membership, not just counts. All joins key on
  // o_orderkey; everything reduces with map-side partials.
  private val qMergeUpsert = QuerySpec.of(
    "q_merge_upsert", {
      def h(tag: String) = graft.functions.HashFunctions
        .sqlHash32(s"CAST(o_orderkey AS VARCHAR) || ':$tag'")
      s"""WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT) AS cents,
        |    (${h("d")}) % 20 = 0 AS is_del,
        |    (${h("u")}) % 10 = 0 AS is_upd,
        |    (${h("i")}) % 20 = 0 AS spawns_ins
        |  FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, cents
        |  FROM base WHERE NOT is_del AND NOT is_upd
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, cents * 110 // 100
        |  FROM base WHERE NOT is_del AND is_upd
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, 'N', cents
        |  FROM base WHERE spawns_ins)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  md5(string_agg(CAST(o_orderkey AS VARCHAR), ','
        |    ORDER BY o_orderkey)) AS member_md5
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions
    def h(tag: String) = HashFunctions.hash32(
      concat(col("o_orderkey").cast("string"), lit(s":$tag")))
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)").as("cents"),
        (pmod(h("d"), lit(20)) === 0).as("is_del"),
        (pmod(h("u"), lit(10)) === 0).as("is_upd"),
        (pmod(h("i"), lit(20)) === 0).as("spawns_ins"))
      .localCheckpoint() // three MERGE branches read it
    val kept = base.filter(!col("is_del") && !col("is_upd"))
      .select("o_orderkey", "o_orderstatus", "cents")
    val updated = base.filter(!col("is_del") && col("is_upd"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("cents * 110 DIV 100").as("cents"))
    val inserted = base.filter(col("spawns_ins"))
      .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("cents"))
    kept.unionByName(updated).unionByName(inserted)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum("cents").as("revenue_cents"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("o_orderkey")))),
          x => x.getField("o_orderkey").cast("string")), ","))
          .as("member_md5"))
      .orderBy("o_orderstatus")
  }

  // Join-key skew profiler: for each lineitem join key, the numbers a
  // planner (or an engineer choosing a salting factor) needs before a
  // 100 TB shuffle — key cardinality, the hottest key's row count and
  // integer-bp share, and max/mean as an integer percent. Per-key
  // narrow scans like q_profile_columns; the per-key rollup is one
  // partial agg + a 1-row top-key reduction.
  private val profJoinKeys = Seq("l_orderkey", "l_partkey", "l_suppkey")

  private val qJoinKeys = QuerySpec.of(
    "q_profile_join_keys", {
      def block(c: String) =
        s"""SELECT '$c' AS key_col,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_keys,
           |  CAST(max(cnt) AS BIGINT) AS max_key_rows,
           |  CAST(max(cnt) * 10000 // count(*) AS BIGINT)
           |    AS top_share_bp,
           |  CAST(max(cnt) * count(DISTINCT $c) * 100 // count(*)
           |    AS BIGINT) AS max_over_mean_pct
           |FROM (SELECT $c, count(*) OVER (PARTITION BY $c) AS cnt
           |      FROM lineitem) t""".stripMargin
      profJoinKeys.map(block)
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
    }) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def keyStats(c: String): DataFrame = {
      val per = li.select(col(c)).groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
      per.agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
          max("cnt").as("max_key_rows"))
        .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          expr("CAST(max_key_rows * 10000 DIV n_rows AS BIGINT)")
            .as("top_share_bp"),
          expr("CAST(max_key_rows * n_keys * 100 DIV n_rows AS BIGINT)")
            .as("max_over_mean_pct"))
    }
    profJoinKeys.map(keyStats).reduce(_.unionByName(_))
      .orderBy("key_col")
  }

  // Revenue concentration (Pareto/Lorenz): customers ranked by spend,
  // revenue share per spend decile in exact integer cents, and the
  // Gini coefficient via the closed form G = (2·Σi·xᵢ − (n+1)·Σx) /
  // (n·Σx) — computed over FLOORED DOLLARS (the cents-level numerator
  // overflows int64 already at sf0.1), and the ×10⁴ bp scaling runs
  // in 128-bit arithmetic on BOTH sides (Spark DECIMAL(38,0) /
  // DuckDB explicit HUGEINT): the r15 sf1 sweep caught the bigint
  // version overflowing at 10× the bench scale — numerator ≈
  // G·n·totd ≈ 10¹⁵ there, ×10⁴ > 2⁶³ — with Spark's ANSI multiply
  // erroring while DuckDB's would promote silently. The numerator is
  // ≥ 0 by Chebyshev's sum inequality (rk ascends with cents), so
  // floor (//) and truncate (DIV) agree. The rank window runs over
  // the PER-CUSTOMER aggregate (|customers| ≪ |orders|); ties rank
  // by custkey so both engines walk the Lorenz curve identically.
  private val qPareto = QuerySpec.of(
    "q_customer_pareto",
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT cents, cents // 100 AS dollars,
      |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT)
      |      AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS n,
      |    CAST(sum(cents) OVER () AS BIGINT) AS tot
      |  FROM c),
      |g AS (
      |  SELECT CAST(max(n) AS BIGINT) AS n,
      |    CAST(sum(dollars) AS BIGINT) AS totd,
      |    CAST(sum(rk * dollars) AS BIGINT) AS sic
      |  FROM r),
      |dec AS (
      |  SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS decile,
      |    CAST(count(*) AS BIGINT) AS n_customers,
      |    CAST(sum(cents) AS BIGINT) AS cents,
      |    CAST(max(tot) AS BIGINT) AS tot
      |  FROM r GROUP BY 1)
      |SELECT dec.decile, dec.n_customers, dec.cents,
      |  CAST(dec.cents * 10000 // dec.tot AS BIGINT) AS share_bp,
      |  CAST((2 * CAST(g.sic AS HUGEINT) - (g.n + 1)
      |      * CAST(g.totd AS HUGEINT)) * 10000
      |    // (CAST(g.n AS HUGEINT) * g.totd) AS BIGINT) AS gini_bp
      |FROM dec, g ORDER BY dec.decile""".stripMargin) { (s, d) =>
    val c = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)"))
        .as("cents"))
    // rank window over the per-customer aggregate — single-partition,
    // but over |customers| rows, not |orders|; at warehouse scale
    // this flips to the two-level bucket-cumsum the packer uses
    val r = c
      .withColumn("dollars", expr("cents DIV 100"))
      .withColumn("rk",
        row_number().over(Window.orderBy("cents", "o_custkey"))
          .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("tot", sum("cents").over(Window.partitionBy()))
      .localCheckpoint() // gini scalar + decile rollup read it
    val g = r.agg(max("n").as("n"), sum("dollars").as("totd"),
      sum(col("rk") * col("dollars")).as("sic"))
    val dec = r.groupBy(expr("CAST((rk - 1) * 10 DIV n AS BIGINT)")
        .as("decile"))
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("cents"),
        max("tot").as("tot"))
    dec.crossJoin(broadcast(g))
      .select(col("decile"), col("n_customers"), col("cents"),
        expr("CAST(cents * 10000 DIV tot AS BIGINT)").as("share_bp"),
        expr("CAST((2 * CAST(sic AS DECIMAL(38,0)) - (n + 1)" +
          " * CAST(totd AS DECIMAL(38,0))) * 10000" +
          " DIV (CAST(n AS DECIMAL(38,0)) * totd) AS BIGINT)")
          .as("gini_bp"))
      .orderBy("decile")
  }

  // Declarative data-quality constraint suite (the Deequ shape): each
  // constraint is one declarative count over the fact tables —
  // referential integrity as an anti-join, domain ranges and
  // positivity as filters, key uniqueness as a grouped-multiplicity
  // count — unioned into a violations report. One scan per involved
  // table; every check reduces with map-side partials. A constraint
  // passes iff its violation count is zero, so the report doubles as
  // the ingest gate.
  private val qConstraints = QuerySpec.of(
    "q_quality_constraints",
    """SELECT 'lineitem_orderkey_fk' AS constraint_name,
      |  CAST((SELECT count(*) FROM lineitem
      |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |    AS BIGINT) AS n_violations
      |UNION ALL
      |SELECT 'orders_custkey_fk',
      |  CAST((SELECT count(*) FROM orders
      |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |    AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem_quantity_range',
      |  CAST((SELECT count(*) FROM lineitem
      |    WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem_discount_range',
      |  CAST((SELECT count(*) FROM lineitem
      |    WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
      |UNION ALL
      |SELECT 'orders_totalprice_positive',
      |  CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |    AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem_pk_unique',
      |  CAST((SELECT coalesce(sum(c - 1), 0) FROM (
      |    SELECT count(*) AS c FROM lineitem
      |    GROUP BY l_orderkey, l_linenumber) t WHERE c > 1) AS BIGINT)
      |ORDER BY constraint_name""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    def report(name: String, n: DataFrame): DataFrame =
      n.select(lit(name).as("constraint_name"),
        col(n.columns.head).cast("bigint").as("n_violations"))
    val checks = Seq(
      report("lineitem_orderkey_fk",
        li.select("l_orderkey")
          .join(o.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)))),
      report("orders_custkey_fk",
        o.select("o_custkey")
          .join(cust.select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)))),
      report("lineitem_quantity_range",
        li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
          .agg(count(lit(1)))),
      report("lineitem_discount_range",
        li.filter(col("l_discount") < 0 || col("l_discount") > 0.1)
          .agg(count(lit(1)))),
      report("orders_totalprice_positive",
        o.filter(col("o_totalprice") <= 0).agg(count(lit(1)))),
      report("lineitem_pk_unique",
        li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)))))
    checks.reduce(_.unionByName(_)).orderBy("constraint_name")
  }

  // Cumulative user growth: first-seen day per customer (via orders),
  // new-per-day + running total + day-over-day growth in integer bp.
  // Per-customer min is the only corpus-sized exchange; the day-level
  // cumsum runs over the calendar-bounded series.
  private val qGrowth = QuerySpec.of(
    "q_customer_growth",
    """WITH f AS (
      |  SELECT o_custkey,
      |    min(strftime(o_orderdate, '%Y-%m')) AS first_month
      |  FROM orders GROUP BY o_custkey),
      |m AS (
      |  SELECT first_month AS month, CAST(count(*) AS BIGINT) AS new_customers
      |  FROM f GROUP BY first_month),
      |c AS (
      |  SELECT month, new_customers,
      |    CAST(sum(new_customers) OVER (ORDER BY month
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
      |  FROM m)
      |SELECT month, new_customers, cum_customers,
      |  CAST(new_customers * 10000
      |    // (cum_customers - new_customers + 1) AS BIGINT) AS growth_bp
      |FROM c ORDER BY month""".stripMargin) { (s, d) =>
    val m = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(min(date_format(col("o_orderdate"), "yyyy-MM"))
        .as("first_month"))
      .groupBy(col("first_month").as("month"))
      .agg(count(lit(1)).as("new_customers"))
    m.withColumn("cum_customers",
        sum("new_customers").over(Window.orderBy("month")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("month"), col("new_customers"), col("cum_customers"),
        expr("CAST(new_customers * 10000" +
          " DIV (cum_customers - new_customers + 1) AS BIGINT)")
          .as("growth_bp"))
      .orderBy("month")
  }

  // Large-volume orders (TPC-H Q18 shape): nested aggregate HAVING —
  // orders whose line quantities sum past a threshold, re-joined to
  // the customer. The HAVING runs on the orderkey-grouped partial
  // aggregate; only qualifying keys rejoin.
  private val q18 = QuerySpec.of(
    "q18_large_orders",
    """SELECT c_custkey, c_name, o_orderkey,
      |  (floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey
      |HAVING sum(l_quantity) > 210
      |ORDER BY sum_qty DESC, o_orderkey""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg((floor((sum("l_quantity")) * 1e2 + 0.5) / 1e2).as("sum_qty"))
      .filter(col("sum_qty") > 210)
    big.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d)
        .select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "sum_qty")
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  // Top supplier(s) by revenue (TPC-H Q15 shape): aggregate, take the
  // max of the aggregate, and keep every supplier achieving it —
  // the max-of-aggregate pattern (a 1-row broadcast back, never a
  // global sort).
  private val q15 = QuerySpec.of(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey),
      |mx AS (SELECT max(rev_cents) AS m FROM rev)
      |SELECT s_suppkey, s_name, rev_cents
      |FROM rev, mx, supplier
      |WHERE l_suppkey = s_suppkey AND rev_cents = mx.m
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(floor((l_extendedprice * (1 - l_discount)" +
        " * 100) + 0.5) AS BIGINT)")).as("rev_cents"))
      .localCheckpoint() // max + output read it
    val mx = rev.agg(max("rev_cents").as("m"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_cents") === col("m"))
      .join(Tables.supplier(s, d)
        .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "rev_cents")
      .orderBy("s_suppkey")
  }

  // Correlated scalar subqueries, executed through the spark.sql()
  // surface: orders priced ≥ 1.5× their own customer's average —
  // proving the SQL front-end decorrelates (Catalyst rewrites the
  // correlated aggregates into joins) rather than re-expressing them
  // with window functions by hand. The comparison is cross-multiplied
  // into exact integer cents (2·price·countᵢ ≥ 3·Σcentsᵢ), so no
  // float mean with engine-dependent summation order sits on the
  // threshold. Temp views register per-call; the oracle is the
  // IDENTICAL statement.
  private val correlatedSql =
    """SELECT o_custkey, count(*) AS n_big_orders,
      |  CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |    AS big_cents
      |FROM orders o
      |WHERE CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT) * 2 * (
      |    SELECT count(*) FROM orders i
      |    WHERE i.o_custkey = o.o_custkey)
      |  >= 3 * (
      |    SELECT sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT))
      |    FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  private val qCorrelated = QuerySpec.of(
    "q_sql_correlated", correlatedSql) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(correlatedSql)
  }

  // Dormant high-balance customers (TPC-H Q22 shape): above the
  // average positive balance AND no orders — a global scalar
  // aggregate (broadcast back, cross-multiplied into exact cents so
  // no float mean sits on the threshold) composed with an anti-join,
  // rolled up per nation.
  private val q22 = QuerySpec.of(
    "q22_dormant_balances",
    """WITH pos AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor((c_acctbal * 100) + 0.5) AS BIGINT)) AS BIGINT) AS s
      |  FROM customer WHERE c_acctbal > 0),
      |el AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(floor((c_acctbal * 100) + 0.5) AS BIGINT) AS bal
      |  FROM customer, pos
      |  WHERE CAST(floor((c_acctbal * 100) + 0.5) AS BIGINT) * pos.n > pos.s
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey))
      |SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |  count(*) AS n_customers,
      |  CAST(sum(bal) AS BIGINT) AS total_bal_cents
      |FROM el GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(floor((c_acctbal * 100) + 0.5) AS BIGINT)").as("bal"))
    val pos = cust.filter(col("bal") > 0)
      .agg(count(lit(1)).as("n"), sum("bal").as("s"))
    cust.crossJoin(broadcast(pos))
      .filter(col("bal") * col("n") > col("s"))
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("bigint").as("nation"))
      .agg(count(lit(1)).as("n_customers"),
        sum("bal").as("total_bal_cents"))
      .orderBy("nation")
  }

  // Shipping SLA: per order priority, line items shipped more than 90
  // days after the order date — integer day arithmetic (epoch-day
  // difference), late share in bp. One fact⋈fact join pre-projected
  // to three columns, then a 5-row rollup.
  private val qSla = QuerySpec.of(
    "q_orders_shipping_sla",
    """SELECT o_orderpriority,
      |  count(*) AS n_lines,
      |  CAST(sum(CASE WHEN epoch_ms(l_shipdate) // 86400000
      |      - epoch_ms(o_orderdate) // 86400000 > 90
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(sum(CASE WHEN epoch_ms(l_shipdate) // 86400000
      |      - epoch_ms(o_orderdate) // 86400000 > 90
      |    THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS late_bp
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    def epochDay(c: String) =
      expr(s"unix_micros(CAST($c AS TIMESTAMP)) DIV 1000 DIV 86400000")
    Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        when(epochDay("l_shipdate") - epochDay("o_orderdate") > 90, 1L)
          .otherwise(0L).as("late"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum("late").as("n_late"))
      .select(col("o_orderpriority"), col("n_lines"), col("n_late"),
        expr("CAST(n_late * 10000 DIV n_lines AS BIGINT)").as("late_bp"))
      .orderBy("o_orderpriority")
  }

  // Small-quantity revenue (TPC-H Q17 shape): lines whose quantity is
  // under 20% of their part's average, rolled up per brand. The
  // correlated avg is a per-part partial aggregate REJOINED to the
  // fact on the same key — both sides shuffle once on l_partkey (at
  // warehouse scale: bucketed by partkey, zero exchange), and the
  // threshold is cross-multiplied into integers (5·qty·n < Σqty; the
  // synthetic quantities are integral) so no float mean sits on the
  // comparison boundary.
  private val q17 = QuerySpec.of(
    "q17_small_qty_revenue",
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5) AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |pa AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_p,
      |    CAST(sum(q) AS BIGINT) AS sum_q
      |  FROM li GROUP BY l_partkey),
      |small AS (
      |  SELECT li.l_partkey, li.cents
      |  FROM li JOIN pa ON li.l_partkey = pa.l_partkey
      |  WHERE li.q * 5 * pa.n_p < pa.sum_q)
      |SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(cents) AS BIGINT) AS rev_cents
      |FROM small JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity").cast("bigint").as("q"),
        expr("CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)" +
          " AS BIGINT)").as("cents"))
    val pa = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_p"), sum("q").as("sum_q"))
    li.join(pa, "l_partkey")
      .filter(col("q") * 5 * col("n_p") < col("sum_q"))
      .join(Tables.part(s, d).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("rev_cents"))
      .orderBy("p_brand")
  }

  // Suppliers who kept finished orders waiting (TPC-H Q21 shape): on
  // multi-supplier 'F' orders, the supplier who was the ONLY late one
  // (shipped > 60 days after the order date). The classic
  // exists/not-exists double self-join is re-expressed as ONE
  // per-(order, supplier) aggregate + a per-order rollup — the fact
  // table is scanned once and shuffles once on the order key instead
  // of three times; `n_supp >= 2` replays EXISTS(other supplier) and
  // `n_late = 1` replays NOT EXISTS(other late supplier). Day lag is
  // exact integer epoch-day arithmetic.
  private val q21 = QuerySpec.of(
    "q21_waiting_supplier",
    """WITH j AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CASE WHEN epoch_ms(l_shipdate) // 86400000
      |      - epoch_ms(o_orderdate) // 86400000 > 60
      |    THEN 1 ELSE 0 END AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |su AS (
      |  SELECT l_orderkey, l_suppkey, max(late) AS late
      |  FROM j GROUP BY l_orderkey, l_suppkey),
      |ord AS (
      |  SELECT l_orderkey, count(*) AS n_supp,
      |    CAST(sum(late) AS BIGINT) AS n_late
      |  FROM su GROUP BY l_orderkey),
      |blame AS (
      |  SELECT su.l_suppkey
      |  FROM su JOIN ord ON su.l_orderkey = ord.l_orderkey
      |  WHERE su.late = 1 AND ord.n_supp >= 2 AND ord.n_late = 1)
      |SELECT s_suppkey, s_name, count(*) AS numwait
      |FROM blame JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey""".stripMargin) { (s, d) =>
    def epochDay(c: String) =
      expr(s"unix_micros(CAST($c AS TIMESTAMP)) DIV 1000 DIV 86400000")
    val j = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(epochDay("l_shipdate") - epochDay("o_orderdate") > 60, 1)
          .otherwise(0).as("late"))
    val su = j.groupBy("l_orderkey", "l_suppkey")
      .agg(max("late").as("late"))
      .localCheckpoint() // per-order rollup + blame both read it
    val ord = su.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum("late").cast("bigint").as("n_late"))
    su.join(ord, "l_orderkey")
      .filter(col("late") === 1 && col("n_supp") >= 2
        && col("n_late") === 1)
      .join(Tables.supplier(s, d)
        .select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  // Dynamic partition pruning: the fact table is persisted as a
  // ship-month-PARTITIONED scaffold (the layout a 100 TB fact ships
  // with), and the join's dim side — the top-3 revenue months,
  // derived from `orders` AT RUNTIME — prunes the fact scan to 3 of
  // the ~83 month partitions via Spark's DPP (the broadcast exchange
  // is reused as a partition filter; DppPlanSpec pins
  // `dynamicpruning` in the scan's PartitionFilters). The oracle
  // replays the same top-3 selection over the raw table.
  private val qDpp = QuerySpec.of(
    "q_dpp_join",
    """WITH m AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
      |    CAST(sum(CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |      AS ord_cents
      |  FROM orders GROUP BY 1),
      |top3 AS (
      |  SELECT mon FROM m ORDER BY ord_cents DESC, mon LIMIT 3)
      |SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |    AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem
      |WHERE strftime(l_shipdate, '%Y-%m') IN (SELECT mon FROM top3)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    monthFact(s, d)
      .join(broadcast(topMonths(s, d)),
        col("ship_month") === col("mon"))
      .groupBy("ship_month")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("rev_cents"))
      .orderBy("ship_month")
  }

  /** Ship-month-partitioned lineitem scaffold (see q_dpp_join). */
  private[graft] def monthFact(s: SparkSession, d: String): DataFrame =
    graft.Scaffold.partitionedTable(s, "lineitem-month",
      Tables.fingerprint(s, d, "lineitem"), Seq("ship_month")) {
      Tables.lineitem(s, d).select(
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        expr("CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)" +
          " AS BIGINT)").as("cents"))
    }

  /** Month dimension scaffold: per-month order revenue with a
    * precomputed revenue rank. Materialized (not inlined) so the
    * query-time dim side is a plain Filter-over-scan — the canonical
    * shape Spark's DPP broadcast-reuse matches on (an inline
    * Window+Filter subtree fails the canonical-plan comparison and
    * the pruning expression silently trivializes to `true`).
    */
  private[graft] def monthDim(s: SparkSession, d: String): DataFrame =
    graft.Scaffold.table(s, "month-dim",
      Tables.fingerprint(s, d, "orders")) {
      val w = Window.orderBy(col("ord_cents").desc, col("mon"))
      Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          expr("CAST(floor((o_totalprice * 100) + 0.5) AS BIGINT)").as("cents"))
        .groupBy("mon").agg(sum("cents").as("ord_cents"))
        .withColumn("rk", row_number().over(w))
    }

  /** Top-3 revenue months — a selective Filter over the materialized
    * dim, the precondition for the dynamic pruning subquery.
    */
  private[graft] def topMonths(s: SparkSession, d: String): DataFrame =
    monthDim(s, d).filter(col("rk") <= 3).select("mon")

  // ---- q_profile_corr: Pearson correlation matrix, one exact pass -----
  // All pairwise correlations of lineitem's four measures from ONE
  // map-side-combinable aggregate of exact integer moments (values
  // scaled to integers first: whole units / cents / percent points,
  // sums in DECIMAL(38,0) ≙ DuckDB HUGEINT — no float accumulation, so
  // the moments are identical across engines and the only doubles are
  // the final 14-term formula, computed in the same operation order on
  // identical inputs and rounded to 6 dp). One scan, no shuffle except
  // the scalar aggregate; the 6-pair matrix unpivots from the single
  // moment row. Profilers run this BEFORE training-feature selection.
  private val qProfileCorr = QuerySpec.of(
    "q_profile_corr", {
      def corrSql(x: String, y: String): String =
        s"""(floor((CAST(n * s_$x$y - s_$x * s_$y AS DOUBLE) /
           |  sqrt(CAST(n * s_$x$x - s_$x * s_$x AS DOUBLE) *
           |       CAST(n * s_$y$y - s_$y * s_$y AS DOUBLE))) * 1e6 + 0.5) / 1e6)"""
          .stripMargin
      val pairs = Seq("q" -> "p", "q" -> "d", "q" -> "t",
        "p" -> "d", "p" -> "t", "d" -> "t")
      val names = Map("q" -> "quantity", "p" -> "price_cents",
        "d" -> "discount_pct", "t" -> "tax_pct")
      val sel = pairs.map { case (x, y) =>
        s"SELECT '${names(x)}' AS col_x, '${names(y)}' AS col_y, " +
          s"n, ${corrSql(x, y)} AS corr FROM m"
      }.mkString("\n|", "\n|UNION ALL\n|", "")
      s"""WITH v AS (
        |  SELECT CAST(floor((l_quantity) + 0.5) AS BIGINT) AS q,
        |    CAST(floor((l_extendedprice * 100) + 0.5) AS BIGINT) AS p,
        |    CAST(floor((l_discount * 100) + 0.5) AS BIGINT) AS d,
        |    CAST(floor((l_tax * 100) + 0.5) AS BIGINT) AS t
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(q AS HUGEINT)) AS s_q, sum(CAST(p AS HUGEINT)) AS s_p,
        |    sum(CAST(d AS HUGEINT)) AS s_d, sum(CAST(t AS HUGEINT)) AS s_t,
        |    sum(CAST(q AS HUGEINT) * q) AS s_qq,
        |    sum(CAST(p AS HUGEINT) * p) AS s_pp,
        |    sum(CAST(d AS HUGEINT) * d) AS s_dd,
        |    sum(CAST(t AS HUGEINT) * t) AS s_tt,
        |    sum(CAST(q AS HUGEINT) * p) AS s_qp,
        |    sum(CAST(q AS HUGEINT) * d) AS s_qd,
        |    sum(CAST(q AS HUGEINT) * t) AS s_qt,
        |    sum(CAST(p AS HUGEINT) * d) AS s_pd,
        |    sum(CAST(p AS HUGEINT) * t) AS s_pt,
        |    sum(CAST(d AS HUGEINT) * t) AS s_dt
        |  FROM v)
        |SELECT col_x, col_y, CAST(n AS BIGINT) AS n, corr FROM ($sel)
        |ORDER BY col_x, col_y""".stripMargin
    }) { (s, d) =>
    val dec = "DECIMAL(38,0)"
    val v = Tables.lineitem(s, d).selectExpr(
      "CAST(CAST(floor((l_quantity) + 0.5) AS BIGINT) AS " + dec + ") AS q",
      "CAST(CAST(floor((l_extendedprice * 100) + 0.5) AS BIGINT) AS " + dec +
        ") AS p",
      "CAST(CAST(floor((l_discount * 100) + 0.5) AS BIGINT) AS " + dec + ") AS d",
      "CAST(CAST(floor((l_tax * 100) + 0.5) AS BIGINT) AS " + dec + ") AS t")
    val m = v.agg(
      expr(s"CAST(count(*) AS $dec)").as("n"),
      expr("sum(q)").as("s_q"), expr("sum(p)").as("s_p"),
      expr("sum(d)").as("s_d"), expr("sum(t)").as("s_t"),
      expr("sum(q * q)").as("s_qq"), expr("sum(p * p)").as("s_pp"),
      expr("sum(d * d)").as("s_dd"), expr("sum(t * t)").as("s_tt"),
      expr("sum(q * p)").as("s_qp"), expr("sum(q * d)").as("s_qd"),
      expr("sum(q * t)").as("s_qt"), expr("sum(p * d)").as("s_pd"),
      expr("sum(p * t)").as("s_pt"), expr("sum(d * t)").as("s_dt"))
    def corrOf(x: String, y: String) = expr(
      s"""(floor((CAST(n * s_$x$y - s_$x * s_$y AS DOUBLE) /
         |  sqrt(CAST(n * s_$x$x - s_$x * s_$x AS DOUBLE) *
         |       CAST(n * s_$y$y - s_$y * s_$y AS DOUBLE))) * 1e6 + 0.5) / 1e6)"""
        .stripMargin)
    val names = Map("q" -> "quantity", "p" -> "price_cents",
      "d" -> "discount_pct", "t" -> "tax_pct")
    val pairs = Seq("q" -> "p", "q" -> "d", "q" -> "t",
      "p" -> "d", "p" -> "t", "d" -> "t")
    pairs.map { case (x, y) =>
      m.select(lit(names(x)).as("col_x"), lit(names(y)).as("col_y"),
        expr("CAST(n AS BIGINT)").as("n"), corrOf(x, y).as("corr"))
    }.reduce(_.unionByName(_)).orderBy("col_x", "col_y")
  }

  val specs: Seq[QuerySpec] =
    Seq(q1, q3, q4, q5, q6, q14, qAnti, qWindow, qSegment, qSetOps,
      qTopCustomers, qRollup, qRfm, qBasket, qProfile, qBucketed,
      qMergeUpsert, qJoinKeys, qPareto, qConstraints, qGrowth, q18, q15,
      qCorrelated, q22, qSla, q17, q21, qDpp, qProfileCorr)
}
