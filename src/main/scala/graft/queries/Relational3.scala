package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Sampling

/** Round-2 relational breadth: multi-nation join shapes (TPC-H Q7/Q10/
  * Q18/Q19 analogues over the testdata schema) plus deterministic
  * stratified sampling. Money discipline as in Relational: exact
  * DECIMAL sums cast to double at the end, so 32-partition Spark and
  * single-threaded DuckDB agree bitwise. Dimension joins broadcast;
  * fact⋈fact joins shuffle on the order key.
  */
object Relational3 {
  private val D = "decimal(18,2)"
  private def dec(c: Column): Column = c.cast(D)
  private def frac(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")
  private def revenue(price: Column, disc: Column): Column =
    dec(price) * (one - frac(disc))

  /** Sketch aggregates (HLL distinct, approx quantiles): the 100 TB
    * substitutes for exact countDistinct / exact median. SPEC-ONLY (not
    * in `queries`): sketch values are engine-specific, so no portable
    * SQL oracle exists — FileIndexSpec bounds the error vs exact, and
    * the hash-gated `q_approx_stats_gate` below asserts the error
    * envelope inside the driver's correctness board, so every board row
    * is a full rows+schema+hash check with zero asterisks.
    */
  def approxStats(s: SparkSession, dir: String): DataFrame =
    // quartiles projected as scalars (p25/p50/p75) — array columns
    // can't be hashed/sorted by a generic row comparator
    t(s, dir, "orders").agg(
      approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_customers"),
      percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
      .select(col("approx_customers"),
        col("q").getItem(0).as("p25"),
        col("q").getItem(1).as("p50"),
        col("q").getItem(2).as("p75"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Q7 shape: bilateral trade volume between two nations ----
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1998-01-01"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
    }),

    // ---- Q10 shape: top-20 customers by returned-item revenue ----
    "q10_returned_items" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01") &&
                    col("o_orderdate") < lit("1996-07-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- Q18 shape: large-volume orders (having over a fact agg) ----
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("sum_qty_d"))
        .filter(col("sum_qty_d") > 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"),
          col("sum_qty_d").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ---- Q19 shape: OR-of-ANDs brand/size/quantity predicate ----
    "q19_discounted_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- relational exactness gate for the sketch path: recompute the
    //      sketches ALONGSIDE the exact count-distinct and exact
    //      rank-window quantile bounds, and emit only exact values plus
    //      the asserted error bounds as booleans. The oracle states the
    //      exact side and literal TRUE for every bound, so a sketch
    //      drifting out of its error envelope flips a boolean and turns
    //      this row red in the driver's hash compare — the raw sketch
    //      values themselves live in the spec-only `approxStats` above
    //      (engine-specific by design). HLL at rsd=1% gates at 3% (3σ);
    //      percentile_approx
    //      at accuracy 10000 has rank error ≤ 1e-4·n, gated via exact
    //      quantiles at fraction ±0.005 (50× margin) — quantile
    //      monotonicity makes the bound interpolation-free ----
    "q_approx_stats_gate" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val qs = Seq(0.25, 0.5, 0.75)
      val eps = 0.005
      val sk = o.agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("hll"),
        percentile_approx(col("o_totalprice"),
          array(qs.map(lit): _*), lit(10000)).as("qarr"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      val bounds = graft.operators.Profile.exactQuantiles(
        o, "o_totalprice", qs.flatMap(q => Seq(q - eps, q + eps)))
      val b = bounds.agg(
        max(when(col("q") === qs.head - eps, col("value"))).as("lo_0"),
        (qs.zipWithIndex.tail.flatMap { case (q, i) =>
          Seq(max(when(col("q") === q - eps, col("value"))).as(s"lo_$i"),
            max(when(col("q") === q + eps, col("value"))).as(s"hi_$i"))
        } :+ max(when(col("q") === qs.head + eps, col("value"))).as("hi_0")): _*)
      val okCols = qs.indices.map { i =>
        val v = col("qarr").getItem(i)
        (v >= col(s"lo_$i") && v <= col(s"hi_$i")).as(s"p${(qs(i) * 100).toInt}_ok")
      }
      sk.crossJoin(broadcast(b)).select(
        (col("exact_customers") +:
          (abs(col("hll").cast("double") -
              col("exact_customers").cast("double")) <=
            lit(0.03) * col("exact_customers").cast("double")).as("hll_ok") +:
          okCols): _*)
    }),

    // ---- deterministic stratified sample (256 md5 buckets/stratum) ----
    "q_stratified_sample" -> ((s, dir) => {
      Sampling.stratifiedHashSample(t(s, dir, "customer"),
          idCol = "c_custkey", strataCol = "c_mktsegment",
          fractions = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.25),
          defaultFraction = 0.125)
        .select("c_custkey", "c_name", "c_mktsegment")
    })
  )

  private val revSql =
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"

  private val bucketSql =
    """((strpos('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 16
      | + strpos('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // the oracle is the EXACT side plus the asserted error bounds: a
    // sketch outside its envelope flips a boolean and fails the hash
    "q_approx_stats_gate" ->
      """SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
        | TRUE AS hll_ok, TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        |FROM orders""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         | CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         | CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         | CAST($revSql AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
        | CAST(sum_qty_d AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_d
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q19_discounted_revenue" ->
      s"""SELECT CAST($revSql AS DOUBLE) AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT c_custkey, c_name, c_mktsegment FROM customer
         |WHERE $bucketSql
         | < CASE c_mktsegment WHEN 'BUILDING' THEN 128
         |     WHEN 'MACHINERY' THEN 64 ELSE 32 END""".stripMargin
  )
}
