package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.TopK

/** Round-4 relational extensions: aggregate top-k (vs window), unpivot
  * (wide→long reshape), and equi-width histogramming.
  *
  * Scale notes per query are on each entry; the common theme is shapes
  * that keep the exchange narrow: the top-k aggregate ships ≤k rows per
  * (group, map task); unpivot is a map-side reshape (no shuffle); the
  * histogram is a map-combinable count over a computed bucket key.
  */
object Relational6 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 orders per customer via the bounded-buffer aggregate
    // (operators/TopK.scala) — the skew-immune form of
    // q_window_topn_per_customer: partial ObjectHashAggregate reduces
    // each map slice to ≤3 rows per customer before the exchange.
    "q_topk_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      TopK.perGroup(o, col("o_custkey"), col("o_totalprice"),
          col("o_orderkey"), 3)
        .select(col("g").as("o_custkey"), col("rk"),
          col("id").as("o_orderkey"), col("score").as("o_totalprice"))
    }),

    // Wide→long reshape: per-nation customer/supplier account totals
    // unpivoted to (nationkey, metric, value). Spark `unpivot` is a
    // pure projection+expand — no shuffle beyond the two small aggs.
    "q_unpivot" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val wide = c.groupBy(col("c_nationkey").as("nationkey"))
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("cust_bal"))
        .join(
          su.groupBy(col("s_nationkey").as("nationkey"))
            .agg(sum(col("s_acctbal").cast("decimal(18,2)")).cast("double")
              .as("supp_bal")),
          Seq("nationkey"), "full_outer")
      // fill nulls so Spark-unpivot vs oracle null handling can't diverge
      wide.na.fill(0.0, Seq("cust_bal", "supp_bal"))
        .unpivot(Array(col("nationkey")),
          Array(col("cust_bal"), col("supp_bal")), "metric", "value")
    }),

    // Equi-width histogram of order totals: bucket = clamped
    // floor((x-lo)/w). The bucket key is computed map-side with a plain
    // arithmetic tree (identical in the oracle → IEEE-exact parity) and
    // the count is map-combinable — one narrow exchange of ≤nb rows per
    // task regardless of data volume.
    "q_histogram" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val lo = lit(0.0); val w = lit(25000.0); val nb = lit(20)
      val raw = floor((col("o_totalprice") - lo) / w).cast("int")
      val bucket = least(greatest(raw, lit(0)), nb - lit(1))
      o.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("bucket_revenue"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_topk_agg" ->
      """SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |         c.cust_bal, s.supp_bal
        |  FROM (SELECT c_nationkey AS nationkey,
        |          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |            AS cust_bal FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN
        |       (SELECT s_nationkey AS nationkey,
        |          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |            AS supp_bal FROM supplier GROUP BY 1) s
        |  USING (nationkey))
        |SELECT nationkey, 'cust_bal' AS metric,
        |       COALESCE(cust_bal, 0.0) AS value FROM wide
        |UNION ALL
        |SELECT nationkey, 'supp_bal' AS metric,
        |       COALESCE(supp_bal, 0.0) AS value FROM wide""".stripMargin,

    "q_histogram" ->
      """SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0)
        |         AS INT), 0), 20 - 1) AS bucket,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS bucket_revenue
        |FROM orders GROUP BY 1""".stripMargin
  )
}
