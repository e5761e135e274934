package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** TPC-H Q13/Q15/Q17/Q22 analogues — the shapes round 3 of the
  * relational surface still lacked: outer-join histograms, scalar
  * subqueries (global max / global avg), correlated per-group
  * averages, and anti-join + scalar-threshold filters. Scalars are
  * computed as exact decimal sums with one final division, then
  * broadcast-cross-joined — deterministic cross-engine, no correlated
  * re-execution per row.
  */
object Relational4 {
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def frac(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")
  private def revenue(price: Column, disc: Column): Column =
    dec(price) * (one - frac(disc))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Q13 shape: customer order-count distribution (left outer
    //      join keeps zero-order customers; two cheap aggregations) ----
    "q13_order_histogram" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
    }),

    // ---- Q15 shape: top supplier by quarterly revenue (scalar max
    //      over a small aggregate, broadcast back — no correlated
    //      subquery per row) ----
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("total_rev"))
      rev
        .crossJoin(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))))
        .filter(col("total_rev") === col("max_rev"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    }),

    // ---- Q17 shape: revenue from small-quantity lines, threshold =
    //      0.2 × the part's average quantity (per-group average joined
    //      back; quantities are integral doubles so the avg is exact) ----
    "q17_small_quantity" -> ((s, dir) => {
      val pa = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pa_partkey"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#23"),
          col("l_partkey") === col("p_partkey"))
        .join(pa, col("l_partkey") === col("pa_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
    }),

    // ---- Q8 shape: a supplier nation's market share inside one
    //      customer region, by year — ratio of conditional decimal
    //      sums, single final division ----
    "q8_market_share" -> ((s, dir) => {
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val rev = revenue(col("l_extendedprice"), col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("c_rk") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
    }),

    // ---- GROUPING SETS beyond rollup/cube: two chosen groupings ----
    "q_grouping_sets" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
    }),

    // ---- date/time function battery ----
    "q_datetime_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate")).as("eom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"))
    }),

    // ---- array function battery (over the embeddings table) ----
    "q_array_funcs" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      t(s, dir, "embeddings").filter(col("vec_id") < 100).select(
        col("vec_id"),
        size(v).as("n"),
        round(element_at(v, 1), 4).as("first"),
        round(array_max(v), 4).as("vmax"),
        round(array_min(v), 4).as("vmin"),
        size(filter(v, x => x > 0)).as("n_pos"),
        round(element_at(array_sort(v), 32), 4).as("sorted_32"),
        round(aggregate(slice(v, 1, 8), lit(0.0), (a, x) => a + x), 4)
          .as("head_sum"))
    }),

    // ---- regex function battery (both engines run RE2-compatible
    //      patterns; no-match extract is '' in both) ----
    "q_regex_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("adjective"),
        regexp_extract(col("p_name"), "([0-9]+)", 1).as("digits"),
        col("p_name").rlike("widget|bolt").as("is_hw"),
        expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked"))
    }),

    // ---- RANGE window frame: per-user sliding 1-hour event-time sum ----
    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600L, 0L)
      t(s, dir, "events")
        .withColumn("hour_value",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("hour_value"))
    }),

    // ---- Q22 shape: well-funded customers with no RECENT orders
    //      (scalar avg threshold + anti join against a pushed-down
    //      date slice) ----
    "q22_idle_balances" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
    })
  )

  private val revSql =
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"

  val oracleSql: Map[String, String] = Map(
    "q13_order_histogram" ->
      """SELECT n_orders, COUNT(*) AS n_customers
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY n_orders""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST($revSql AS DOUBLE) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin,

    "q17_small_quantity" ->
      """WITH pa AS (SELECT l_partkey AS pa_partkey,
        |    SUM(l_quantity) / COUNT(*) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pa ON l_partkey = pa_partkey
        |WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q8_market_share" -> {
      val revTerm = "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         | CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN $revTerm
         |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(SUM($revTerm) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |GROUP BY 1""".stripMargin
    },

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        | CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        | CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        | CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |   AS INT) AS days_to_2002
        |FROM orders""".stripMargin,

    // list_reduce(list_prepend(0.0, ...)) = Spark's aggregate HOF left
    // fold — bit-identical head_sum
    "q_array_funcs" ->
      """SELECT vec_id,
        | len(v) AS n,
        | ROUND(v[1], 4) AS first,
        | ROUND(list_aggregate(v, 'max'), 4) AS vmax,
        | ROUND(list_aggregate(v, 'min'), 4) AS vmin,
        | len(list_filter(v, x -> x > 0)) AS n_pos,
        | ROUND(list_sort(v)[32], 4) AS sorted_32,
        | ROUND(list_reduce(list_prepend(0.0, v[1:8]), (a, x) -> a + x), 4)
        |   AS head_sum
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id < 100)""".stripMargin,

    "q_regex_funcs" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '^([a-z]+) ', 1) AS adjective,
        | regexp_extract(p_name, '([0-9]+)', 1) AS digits,
        | regexp_matches(p_name, 'widget|bolt') AS is_hw,
        | len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
        | regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked
        |FROM part""".stripMargin,

    // integer epoch seconds both sides (truncation = floor for
    // positive epochs); RANGE frame inclusive at both bounds
    "q_window_range" ->
      """SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |   PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
        |   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS hour_value
        |FROM events""".stripMargin,

    "q22_idle_balances" ->
      """WITH avg_bal AS (SELECT
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin
  )
}
