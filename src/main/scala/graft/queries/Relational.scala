package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Core relational query surface: scans, filters, joins (broadcast + shuffle,
  * semi/anti), aggregations, windows, sorts/top-k, set ops, rollup.
  *
  * Numeric discipline for oracle parity: every money aggregate is computed in
  * exact DECIMAL arithmetic and only cast to DOUBLE at the very end. Exact
  * decimal sums are order-independent, so Spark (partial aggregation across 32
  * partitions) and single-threaded DuckDB produce bit-identical doubles —
  * a plain SUM(double) would differ in the last ulp and fail the hash compare.
  *
  * Scale notes (100 TB): joins to region/nation/supplier/customer are
  * broadcast (dimension tables); the orders⋈lineitem join shuffles on the
  * order key, which is the natural co-partitioning key for a bucketed layout.
  * All filters are pushed to the parquet scan (verified via explain).
  */
object Relational {
  private val D = "decimal(18,2)"
  private def dec(c: Column): Column = c.cast(D)
  // discount/tax are 2-decimal fractions in [0,1): a narrow decimal keeps
  // products within exact (non-overflowing, non-rounding) precision in BOTH
  // Spark and DuckDB.
  private def frac(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  private def revenue(price: Column, disc: Column): Column =
    dec(price) * (one - frac(disc))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation over a filtered scan (TPC-H Q1 shape) ----
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) *
              ((one - frac(col("l_discount"))) * (one + frac(col("l_tax")))))
            .cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // ---- deterministic top-k (sort + limit with unique tie-break) ----
    "q2_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // ---- 3-way join + group + top-k (TPC-H Q3 shape) ----
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01"))
      // no broadcast hint on customer: it grows with SF, so a forced
      // hint would override AQE's size check at large scale (AQE still
      // broadcasts it at small SF on its own)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- 6-way star join + group (TPC-H Q5 shape) ----
    "q5_region_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1999-01-01"))
      val l = t(s, dir, "lineitem")
      // hints only on the genuinely bounded dims (nation ≤ 25 rows,
      // region ≤ 5); customer/supplier grow with SF — AQE decides
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup,
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- existence semi-join (SURVEY O9: manifest ∩ listing) ----
    "o9_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    }),

    // ---- existence anti-join (SURVEY O9: not_found partition) ----
    "o9_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    }),

    // ---- window functions: per-group top-n + running aggregate ----
    "q_window_topn_per_customer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"),
          dec(col("o_totalprice")).cast("double").as("o_totalprice"), col("rn"))
    }),

    "q_window_running_sum" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_custkey") < 20)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
    }),

    // ---- set operations ----
    "q_setop_intersect" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn)
    }),
    "q_setop_except" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.except(sn)
    }),
    "q_setop_union" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.union(sn).distinct()
    }),

    // ---- grouping sets / rollup ----
    "q_rollup_status_priority" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // ---- distinct aggregation ----
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- date/time functions ----
    "q_orders_by_month" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // ---- correlated scalar subquery shape (avg per group vs row) ----
    "q_above_avg_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val avgPrice = o.groupBy("o_custkey")
        .agg((sum(dec(col("o_totalprice"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"))
      o.join(avgPrice, Seq("o_custkey"))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- in-list + range scan with pushdown ----
    "q_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#13", "Brand#5") &&
          col("p_size").between(5, 25))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * ((CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM region, nation, customer, supplier, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND s_nationkey = n_nationkey AND c_nationkey = s_nationkey
        |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name""".stripMargin,

    "o9_semi_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,

    "o9_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,

    "q_window_topn_per_customer" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn <= 2""".stripMargin,

    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 20""".stripMargin,

    "q_setop_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "q_setop_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "q_setop_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)""".stripMargin,

    "q_rollup_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_orders_by_month" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        | CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders JOIN (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price
        |  FROM orders GROUP BY o_custkey) a ON o_custkey = a.k
        |WHERE o_totalprice > avg_price * 1.5""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_brand IN ('Brand#13', 'Brand#5') AND p_size BETWEEN 5 AND 25""".stripMargin
  )
}
