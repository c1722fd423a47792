package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ten TPC-H query shapes not yet covered by
  * [[RelationalQueries]] — with these, every one of the 22 classic
  * queries has a shape-faithful adaptation to the driver's reduced
  * schema (no `partsupp` table, no ship/commit/receipt mode columns;
  * see each query's comment for the substitution it makes).
  *
  * Cross-engine exactness: all money flows as integer cents
  * (`round(x*100)` → BIGINT) and every ratio is integer basis points
  * over non-negative operands (Spark `DIV` ≡ DuckDB `//` there), so
  * hash-equality with the DuckDB oracle never rides on float
  * formatting.
  *
  * Scale notes (100 TB design): lineitem is the only unbounded
  * table. Every query here scans it ONCE, projects it down before
  * the first exchange, and aggregates with map-side partial
  * aggregation. Dimension-join hint policy: only dims BOUNDED by the
  * schema itself (nation = 25 rows, region = 5, single-row derived
  * scalars) carry an explicit `broadcast()` hint; SF-SCALING dims
  * (part, supplier, customer — they grow with the warehouse, a
  * customer table is terabytes at 100 TB) are left unhinted so the
  * size-based planner / AQE chooses — at test SF they broadcast
  * statically anyway (file size < autoBroadcastJoinThreshold), at
  * warehouse SF they degrade to shuffle joins instead of OOMing
  * every executor on a forced broadcast (TpchScaleSpec pins exactly
  * this cutover against a generated sf1-size scaffold). The
  * pseudo-`partsupp` catalogs (q2/q16/q20) are derived
  * per-(part,supplier) aggregates — shuffles keyed on l_partkey that
  * AQE coalesces; at warehouse scale the catalog would be a bucketed
  * materialization shared across the three.
  */
object TpchSuite {

  private def cents(e: String) =
    expr(s"CAST(floor(($e * 100) + 0.5) AS BIGINT)")

  private def epochDay(c: String) =
    expr(s"unix_micros(CAST($c AS TIMESTAMP)) DIV 1000 DIV 86400000")

  // Q2 shape — min-cost supplier. The partsupp catalog is derived
  // from lineitem: a supplier's "cost" for a part is its cheapest
  // observed line total (integer cents). For STANDARD mid-size
  // parts, pick the EUROPE supplier(s) achieving the per-part
  // minimum — the classic correlated-min subquery, expressed as a
  // window min over the region-filtered catalog (one shuffle on
  // l_partkey; the correlated subquery and the outer query share it).
  private val q2 = QuerySpec.of(
    "q2_min_cost_supplier",
    """WITH cat AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(min(CAST(floor((l_extendedprice * 100) + 0.5) AS BIGINT))
      |      AS BIGINT) AS cost_cents
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name,
      |    CAST(floor((s_acctbal * 100) + 0.5) AS BIGINT) AS bal_cents, n_name
      |  FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |pc AS (
      |  SELECT cat.l_partkey, cat.cost_cents, eu.s_name, eu.bal_cents,
      |    eu.n_name,
      |    min(cat.cost_cents) OVER (PARTITION BY cat.l_partkey)
      |      AS best_cents
      |  FROM cat JOIN eu ON cat.l_suppkey = eu.s_suppkey)
      |SELECT p_partkey, p_name, s_name, n_name, bal_cents, cost_cents
      |FROM pc JOIN part ON pc.l_partkey = p_partkey
      |WHERE cost_cents = best_cents
      |  AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
      |ORDER BY bal_cents DESC, s_name, p_partkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    val cat = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents("l_extendedprice").as("c"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("c").as("cost_cents"))
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"),
        cents("s_acctbal").as("bal_cents"), col("n_name"))
    val p = Tables.part(s, d)
      .filter(col("p_type") === "STANDARD"
        && col("p_size").between(10, 20))
      .select("p_partkey", "p_name")
    cat.join(eu, col("l_suppkey") === col("s_suppkey"))
      .withColumn("best_cents",
        min("cost_cents").over(Window.partitionBy("l_partkey")))
      .filter(col("cost_cents") === col("best_cents"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "s_name", "n_name", "bal_cents",
        "cost_cents")
      .orderBy(col("bal_cents").desc, col("s_name"), col("p_partkey"))
      .limit(100)
  }

  // Q7 shape — volume shipping between a nation pair, by ship year.
  // Both nation roles broadcast; the pair filter is pushed INTO the
  // broadcast dims so non-pair fact rows drop at the join, not after.
  private val q7 = QuerySpec.of(
    "q7_nation_volume",
    """WITH li AS (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    strftime(l_shipdate, '%Y') AS l_year,
      |    CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |      AS BIGINT) AS cents
      |  FROM lineitem
      |    JOIN orders   ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
      |SELECT supp_nation, cust_nation, l_year,
      |  count(*) AS n_lines, CAST(sum(cents) AS BIGINT) AS rev_cents
      |FROM li GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) {
    (s, d) =>
    val pair = Seq("NATION_1", "NATION_2")
    def natDim(key: String, out: String) = broadcast(
      Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as(key), col("n_name").as(out)))
    val su = (Tables.supplier(s, d)
      .select("s_suppkey", "s_nationkey")
      .join(natDim("sn_key", "supp_nation"),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation"))
    val cu = (Tables.customer(s, d)
      .select("c_custkey", "c_nationkey")
      .join(natDim("cn_key", "cust_nation"),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey", "cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        date_format(col("l_shipdate"), "yyyy").as("l_year"),
        cents("l_extendedprice * (1 - l_discount)").as("cents"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("rev_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // Q8 shape — market share: of all ECONOMY-part revenue sold to
  // AMERICA customers, the share supplied from NATION_9, per order
  // year. Share is integer basis points (num·10000 DIV den; both
  // non-negative so Spark DIV ≡ DuckDB //).
  private val q8 = QuerySpec.of(
    "q8_market_share",
    """WITH al AS (
      |  SELECT strftime(o_orderdate, '%Y') AS o_year,
      |    CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |      AS BIGINT) AS cents,
      |    CASE WHEN ns.n_name = 'NATION_9' THEN 1 ELSE 0 END AS tgt
      |  FROM lineitem
      |    JOIN orders   ON l_orderkey = o_orderkey
      |    JOIN part     ON l_partkey = p_partkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation nc ON c_nationkey = nc.n_nationkey
      |    JOIN region   ON nc.n_regionkey = r_regionkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
      |SELECT o_year,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(sum(CASE WHEN tgt = 1 THEN cents ELSE 0 END) AS BIGINT)
      |    AS nation_cents,
      |  CAST(sum(CASE WHEN tgt = 1 THEN cents ELSE 0 END) * 10000
      |    // sum(cents) AS BIGINT) AS share_bp
      |FROM al GROUP BY o_year ORDER BY o_year""".stripMargin) {
    (s, d) =>
    val pt = (Tables.part(s, d)
      .filter(col("p_type") === "ECONOMY").select("p_partkey"))
    val amCust = (Tables.customer(s, d)
      .select("c_custkey", "c_nationkey")
      .join(Tables.nation(s, d).select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "AMERICA")
        .select("r_regionkey"),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey"))
    val su = (Tables.supplier(s, d)
      .select("s_suppkey", "s_nationkey")
      .join(Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name")),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"),
        when(col("n_name") === "NATION_9", 1).otherwise(0).as("tgt")))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        cents("l_extendedprice * (1 - l_discount)").as("cents"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(amCust, col("o_custkey") === col("c_custkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(sum("cents").as("total_cents"),
        sum(when(col("tgt") === 1, col("cents")).otherwise(0L))
          .as("nation_cents"))
      .select(col("o_year"), col("total_cents"), col("nation_cents"),
        expr("CAST(nation_cents * 10000 DIV total_cents AS BIGINT)")
          .as("share_bp"))
      .orderBy("o_year")
  }

  // Q9 shape — product-line profit by supplier nation and order
  // year. The missing ps_supplycost is substituted by a deterministic
  // unit cost of p_retailprice/10 (integer cents: retail·10), so
  // profit = revenue_cents − cost_cents can go negative — all BIGINT,
  // sign-safe on both engines.
  private val q9 = QuerySpec.of(
    "q9_product_profit",
    """WITH pl AS (
      |  SELECT n_name, strftime(o_orderdate, '%Y') AS o_year,
      |    CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |        AS BIGINT)
      |      - CAST(floor((p_retailprice * 10) + 0.5) AS BIGINT)
      |        * CAST(l_quantity AS BIGINT) AS amount
      |  FROM lineitem
      |    JOIN orders   ON l_orderkey = o_orderkey
      |    JOIN part     ON l_partkey = p_partkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%ring%')
      |SELECT n_name, o_year, count(*) AS n_lines,
      |  CAST(sum(amount) AS BIGINT) AS profit_cents
      |FROM pl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val pt = (Tables.part(s, d)
      .filter(col("p_name").like("%ring%"))
      .select(col("p_partkey"),
        expr("CAST(floor((p_retailprice * 10) + 0.5) AS BIGINT)")
          .as("unit_cost")))
    val su = (Tables.supplier(s, d)
      .select("s_suppkey", "s_nationkey")
      .join(Tables.nation(s, d).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        cents("l_extendedprice * (1 - l_discount)").as("rev"),
        col("l_quantity").cast("bigint").as("qty"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"),
        (col("rev") - col("unit_cost") * col("qty")).as("amount"))
      .groupBy("n_name", "o_year")
      .agg(count(lit(1)).as("n_lines"),
        sum("amount").as("profit_cents"))
      .orderBy("n_name", "o_year")
  }

  // Q11 shape — important part concentrations: per-part catalog value
  // from MIDDLE EAST suppliers, kept where a single part holds more
  // than 0.1% of the region's total. The scalar total is broadcast
  // back and the threshold is cross-multiplied (value·1000 > total)
  // so no float fraction sits on the boundary.
  private val q11 = QuerySpec.of(
    "q11_important_parts",
    """WITH me AS (
      |  SELECT s_suppkey FROM supplier
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'MIDDLE EAST'),
      |v AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
      |      * 100) + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      |  FROM lineitem JOIN me ON l_suppkey = s_suppkey
      |  GROUP BY 1),
      |t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total FROM v)
      |SELECT l_partkey, value_cents
      |FROM v, t WHERE value_cents * 1000 > total
      |ORDER BY value_cents DESC, l_partkey""".stripMargin) { (s, d) =>
    val me = (Tables.supplier(s, d)
      .select("s_suppkey", "s_nationkey")
      .join(Tables.nation(s, d).select("n_nationkey", "n_regionkey"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d)
        .filter(col("r_name") === "MIDDLE EAST").select("r_regionkey"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey"))
    val v = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents("l_extendedprice * (1 - l_discount)").as("c"))
      .join(me, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(sum("c").as("value_cents"))
      .localCheckpoint() // read twice: scalar total + threshold filter
    val t = v.agg(sum("value_cents").as("total"))
    v.crossJoin(broadcast(t))
      .filter(col("value_cents") * 1000 > col("total"))
      .select("l_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  // Q12 shape — late-shipment priority accounting. The missing
  // l_shipmode is substituted by l_returnflag as the grouping
  // attribute; "late" = shipped ≥30 epoch-days after the order date,
  // within ship-year 1996; high vs low order priority is the
  // conditional rollup. Exact integer day arithmetic.
  private val q12 = QuerySpec.of(
    "q12_priority_lateness",
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND epoch_ms(l_shipdate) // 86400000
      |    - epoch_ms(o_orderdate) // 86400000 >= 30
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(epochDay("l_shipdate") - epochDay("o_orderdate") >= 30)
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  // Q13 shape — customer order-count distribution: LEFT join with an
  // extra ON-clause predicate (priority class exclusion replaces the
  // comment filter), count per customer INCLUDING zeros, then the
  // histogram of counts. Two aggregations, one outer join.
  private val q13 = QuerySpec.of(
    "q13_order_distribution",
    """WITH co AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // Q16 shape — supplier breadth per part segment. The partsupp
  // relation is the distinct (l_partkey, l_suppkey) pairs actually
  // observed; the excluded-supplier subquery (complaints in TPC-H)
  // becomes negative-balance suppliers, applied as a broadcast
  // anti-join before the distinct count.
  private val q16 = QuerySpec.of(
    "q16_supplier_breadth",
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |ok AS (
      |  SELECT l_partkey, l_suppkey FROM ps
      |  WHERE l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
      |SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM ok JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
      .stripMargin) { (s, d) =>
    val bad = (Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey"))
    val pt = (Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#21"
        && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  // Q19 shape — disjunctive bundle pricing: three OR'd
  // (brand, size-range, quantity-range) bundles evaluated in one
  // broadcast-join pass; Catalyst pushes the common join key and
  // evaluates the disjunction row-at-a-time inside codegen.
  private val q19 = QuerySpec.of(
    "q19_bundle_revenue",
    """SELECT count(*) AS n_lines,
      |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * 100) + 0.5)
      |    AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |    AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val pt = (Tables.part(s, d)
      .filter((col("p_brand") === "Brand#12"
          && col("p_size").between(1, 5))
        || (col("p_brand") === "Brand#23"
          && col("p_size").between(1, 10))
        || (col("p_brand") === "Brand#15"
          && col("p_size").between(1, 15)))
      .select("p_partkey", "p_brand", "p_size"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"),
        cents("l_extendedprice * (1 - l_discount)").as("c"))
      .join(pt, col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#12"
          && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11))
        || (col("p_brand") === "Brand#23"
          && col("p_size").between(1, 10)
          && col("l_quantity").between(10, 20))
        || (col("p_brand") === "Brand#15"
          && col("p_size").between(1, 15)
          && col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"), sum("c").as("rev_cents"))
  }

  // Q20 shape — promotion-eligible suppliers: suppliers who moved
  // more than half of a small-part's total 1996 volume. The nested
  // IN-subqueries become one per-(part,supplier) aggregate rolled up
  // to per-part totals (map-side combinable) and rejoined — lineitem
  // scanned once.
  private val q20 = QuerySpec.of(
    "q20_promo_suppliers",
    """WITH qty AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      |  FROM qty GROUP BY 1),
      |cand AS (
      |  SELECT DISTINCT qty.l_suppkey
      |  FROM qty
      |    JOIN tot ON qty.l_partkey = tot.l_partkey
      |    JOIN part ON qty.l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%' AND supp_qty * 2 > part_qty)
      |SELECT s_suppkey, s_name, n_name
      |FROM cand
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val qty = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("bigint").as("q"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("q").as("supp_qty"))
      .localCheckpoint() // read twice: per-part totals + candidates
    val tot = qty.groupBy("l_partkey")
      .agg(sum("supp_qty").as("part_qty"))
      .withColumnRenamed("l_partkey", "t_partkey")
    val smallParts = (Tables.part(s, d)
      .filter(col("p_name").like("small%")).select("p_partkey"))
    val su = (Tables.supplier(s, d)
      .select("s_suppkey", "s_name", "s_nationkey")
      .join(Tables.nation(s, d).select("n_nationkey", "n_name"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name"))
    qty.join(tot, col("l_partkey") === col("t_partkey"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .select("l_suppkey").distinct()
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  val specs: Seq[QuerySpec] =
    Seq(q2, q7, q8, q9, q11, q12, q13, q16, q19, q20)
}
