package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Round-3 relational breadth: the remaining TPC-H join shapes (Q2, Q9,
  * Q11, Q16, Q20, Q21 analogues), adapted to the testdata schema — it
  * carries no `partsupp` table and no commit/receipt dates, so the
  * part↔supplier catalog is derived as `SELECT DISTINCT l_partkey,
  * l_suppkey FROM lineitem` and "cost"/"late" predicates are restated
  * over the columns that exist, keeping each query's characteristic
  * structure (correlated min, scalar-subquery threshold, catalog
  * grouping, nested semi-joins, sole-latest-shipper exists/not-exists).
  *
  * Money discipline as in Relational3: exact DECIMAL arithmetic on both
  * sides, cast to DOUBLE only at the end; threshold comparisons happen
  * on the exact-decimal-derived doubles with identical IEEE expression
  * trees, so Spark and DuckDB agree bitwise. Dimension joins broadcast;
  * fact⋈fact joins shuffle on the order key; per-part windows run on
  * already-aggregated (small) intermediates, never on raw lineitem.
  */
object Relational5 {
  private val D = "decimal(18,2)"
  private def dec(c: Column): Column = c.cast(D)
  private def frac(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")
  private def revenue(price: Column, disc: Column): Column =
    dec(price) * (one - frac(disc))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Q9 shape: product-type profit by supplier nation × order
    //      year. Cost proxy is p_retailprice × quantity (no partsupp
    //      supplycost in this schema). Only nation carries a broadcast
    //      hint — part/supplier grow with SF, AQE decides for them;
    //      the one guaranteed shuffle is lineitem⋈orders ----
    "q9_product_profit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("%bolt%")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")) -
            dec(col("p_retailprice")) * dec(col("l_quantity")))
          .cast("double").as("sum_profit"))
    }),

    // ---- Q2 shape: cheapest supplier per part within a region. The
    //      part↔supplier "catalog" with per-pair min price is derived
    //      from lineitem; the correlated MIN is a window over the
    //      already-aggregated catalog rows of the filtered parts ----
    "q2_min_cost_supplier" -> ((s, dir) => {
      val cat = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec(col("l_extendedprice"))).as("cost_d"))
      val eur = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
      val w = Window.partitionBy(col("l_partkey"))
      cat
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "part")
            .filter(col("p_size") === 15 && col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
        .withColumn("min_cost_d", min(col("cost_d")).over(w))
        .filter(col("cost_d") === col("min_cost_d"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("cost_d").cast("double").as("cost"))
        .orderBy(col("p_partkey").asc, col("s_name").asc)
        .limit(100)
    }),

    // ---- Q11 shape: parts whose value from one nation's suppliers
    //      exceeds a fraction of that nation's total — the scalar
    //      subquery becomes a broadcast cross join of a 1-row agg ----
    "q11_important_parts" -> ((s, dir) => {
      val supp3 = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = t(s, dir, "lineitem")
        .join(supp3, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("value_d"))
      val total = vals.agg(sum(col("value_d")).as("total_d"))
      vals.crossJoin(broadcast(total))
        .filter(col("value_d").cast("double") > col("total_d").cast("double") * 0.001)
        .select(col("l_partkey").as("p_partkey"),
          col("value_d").cast("double").as("part_value"))
    }),

    // ---- Q16 shape: supplier diversity per (brand, type, size) over
    //      the derived catalog, excluding flagged suppliers (negative
    //      balance stands in for the complaints predicate) ----
    "q16_parts_suppliers" -> ((s, dir) => {
      val badSupp = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#12" && !col("p_type").like("PROMO%") &&
              col("p_size").isin(1, 4, 7, 10, 15, 22, 36, 45)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // ---- Q20 shape: suppliers who dominated shipments of a part
    //      family in a year (shipped > 25% of the part's total — the
    //      availqty>half-of-shipped predicate restated without
    //      partsupp). Nested semi-joins; the per-part total is a
    //      window over per-(part,supplier) aggregates ----
    "q20_dominant_suppliers" -> ((s, dir) => {
      val smallParts = t(s, dir, "part")
        .filter(col("p_name").like("small%")).select("p_partkey")
      val bySupp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
                col("l_shipdate") < lit("1996-01-01"))
        .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("qty_d"))
      val w = Window.partitionBy("l_partkey")
      val dominant = bySupp
        .withColumn("tot_d", sum(col("qty_d")).over(w))
        .filter(col("qty_d").cast("double") > col("tot_d").cast("double") * 0.25)
        .select("l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "n_name")
    }),

    // ---- bloom-prefiltered existence semi-join: result is exactly
    //      the plain semi-join (bloom has no false negatives); the
    //      sketch prefilters lineitem map-side so only survivors reach
    //      the exchange — the O9 probe at 100 TB selectivity ----
    "o9_bloom_semi" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
      graft.operators.Bloom.semiJoin(
          t(s, dir, "lineitem"), bigOrders, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // ---- ranking-function battery: rank / dense_rank / percent_rank /
    //      cume_dist / ntile on one keyed window (unique tiebreak →
    //      fully deterministic; the two ratio functions are single
    //      divisions, IEEE-identical across engines) ----
    "q_window_ranks" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").filter(col("o_orderkey") % 37 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).as("quartile"))
    }),

    // ---- one-pass column profiling: nulls / distincts / ranges per
    //      column via a map-side unpivot + one tiny grouped agg ----
    "q_profile" -> ((s, dir) => {
      val d = t(s, dir, "lineitem").select(col("l_quantity"),
        col("l_extendedprice"),
        when(col("l_tax") > 0, col("l_tax")).as("l_tax_nz"))
      graft.operators.Profile.numericProfile(d,
        Seq("l_quantity", "l_extendedprice", "l_tax_nz"))
    }),

    // ---- snapshot diff (CDC shape): added/removed/changed keys
    //      between two table states via one full-outer join with
    //      struct-packed null-safe change detection ----
    "q_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.filter(col("o_orderkey") % 97 =!= 0)
      val neu = o.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_totalprice") > 300000.0, lit("F"))
            .otherwise(col("o_orderstatus")))
      graft.operators.Diff.snapshotDiff(old, neu, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
    }),

    // ---- MERGE/upsert (the apply half of CDC; q_snapshot_diff is
    //      the detect half): a change batch of price corrections on
    //      keys ≡ 0 (mod 13) plus brand-new keys under +10_000_000
    //      merges into the base slice. One full-outer equi-join on
    //      the key — bucket both sides on it and the plan is
    //      exchange-free (PlanSpec proves that shape for the
    //      fact⋈fact join) — with a per-row __op audit column.
    //      The "no-op update" rows (keys ≡ 0 mod 26: same values
    //      resubmitted) must report unchanged, not updated ----
    "q_merge_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") < 20000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val upd = base.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 26 === 0, col("o_orderstatus"))
            .otherwise(lit("P")).as("o_orderstatus"),
          when(col("o_orderkey") % 26 === 0, col("o_totalprice"))
            .otherwise(col("o_totalprice") + 1000.0).as("o_totalprice"))
        .union(base.filter(col("o_orderkey") % 17 === 0)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            lit("O").as("o_orderstatus"), col("o_totalprice")))
      graft.operators.Diff.mergeUpsert(base, upd, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
    }),

    // ---- Q21 shape: suppliers who were the SOLE latest shipper on
    //      multi-supplier finished orders (exists another supplier /
    //      not-exists a later one, restated over shipdates). One
    //      fact⋈fact semi-join on the order key, then windows over
    //      per-(order,supplier) aggregates ----
    "q21_sole_late_shipper" -> ((s, dir) => {
      val fOrders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val perOS = t(s, dir, "lineitem")
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("l_shipdate")).as("s_max"))
      val w = Window.partitionBy("l_orderkey")
      val blamed = perOS
        .withColumn("o_max", max(col("s_max")).over(w))
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("nmax",
          sum(when(col("s_max") === col("o_max"), 1).otherwise(0)).over(w))
        .filter(col("s_max") === col("o_max") &&
          col("nsupp") > 1 && col("nmax") === 1)
      t(s, dir, "supplier")
        .join(blamed.groupBy("l_suppkey").agg(count(lit(1)).as("numwait")),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    })
  )

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val oracleSql: Map[String, String] = Map(
    "q9_product_profit" ->
      s"""SELECT n_name AS nation,
         | CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         | CAST(SUM($revSql
         |   - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH cat AS (SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_d
        |  FROM lineitem GROUP BY 1, 2),
        |eur AS (SELECT s_suppkey, s_name, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |j AS (SELECT p_partkey, p_name, s_name, n_name, cost_d,
        |    MIN(cost_d) OVER (PARTITION BY l_partkey) AS min_cost_d
        |  FROM cat JOIN eur ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15 AND p_type = 'STANDARD')
        |SELECT p_partkey, p_name, s_name, n_name,
        |  CAST(cost_d AS DOUBLE) AS cost
        |FROM j WHERE cost_d = min_cost_d
        |ORDER BY p_partkey ASC, s_name ASC LIMIT 100""".stripMargin,

    "q11_important_parts" ->
      s"""WITH vals AS (SELECT l_partkey, SUM($revSql) AS value_d
         |  FROM lineitem
         |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
         |    JOIN nation ON s_nationkey = n_nationkey
         |    WHERE n_name = 'NATION_3')
         |  GROUP BY 1),
         |tot AS (SELECT SUM(value_d) AS total_d FROM vals)
         |SELECT l_partkey AS p_partkey, CAST(value_d AS DOUBLE) AS part_value
         |FROM vals, tot
         |WHERE CAST(value_d AS DOUBLE) > CAST(total_d AS DOUBLE) * 0.001""".stripMargin,

    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |  AND p_brand <> 'Brand#12' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 7, 10, 15, 22, 36, 45)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH shipped AS (SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2),
        |dom AS (SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, qty_d,
        |      SUM(qty_d) OVER (PARTITION BY l_partkey) AS tot_d
        |    FROM shipped) x
        |  WHERE CAST(qty_d AS DOUBLE) > CAST(tot_d AS DOUBLE) * 0.25)
        |SELECT s_name, n_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)""".stripMargin,

    // the oracle states the SEMANTICS (plain existence join) — it
    // verifies the bloom prefilter drops nothing and adds nothing
    "o9_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_totalprice > 400000.0)""".stripMargin,

    "q_window_ranks" ->
      """SELECT o_orderkey, o_orderpriority,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders WHERE o_orderkey % 37 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,

    "q_profile" ->
      """WITH d AS (SELECT l_quantity, l_extendedprice,
        |    CASE WHEN l_tax > 0 THEN l_tax END AS l_tax_nz FROM lineitem),
        |s AS (SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS v FROM d
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM d
        |  UNION ALL SELECT 'l_tax_nz', CAST(l_tax_nz AS DOUBLE) FROM d)
        |SELECT col_name, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_nulls,
        |  COUNT(DISTINCT v) AS n_distinct,
        |  MIN(v) AS min_v, MAX(v) AS max_v
        |FROM s GROUP BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |n AS (SELECT o_orderkey,
        |    CASE WHEN o_totalprice > 300000.0 THEN 'F'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 89 <> 0)
        |SELECT * FROM (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN (o.o_orderstatus, o.o_totalprice) IS DISTINCT FROM
        |              (n.o_orderstatus, n.o_totalprice) THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey) d
        |WHERE change <> 'unchanged'""".stripMargin,

    "q_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey < 20000),
        |upd AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 26 = 0 THEN o_orderstatus
        |         ELSE 'P' END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 26 = 0 THEN o_totalprice
        |         ELSE o_totalprice + 1000.0 END AS o_totalprice
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'O', o_totalprice
        |  FROM base WHERE o_orderkey % 17 = 0)
        |SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
        |       ELSE b.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
        |       WHEN u.o_orderkey IS NULL
        |         OR (u.o_orderstatus, u.o_totalprice) IS NOT DISTINCT FROM
        |            (b.o_orderstatus, b.o_totalprice) THEN 'unchanged'
        |       ELSE 'updated' END AS "__op"
        |FROM base b FULL OUTER JOIN upd u
        |  ON b.o_orderkey = u.o_orderkey""".stripMargin,

    "q21_sole_late_shipper" ->
      """WITH pos AS (SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS s_max
        |  FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |  GROUP BY 1, 2),
        |x AS (SELECT *,
        |    MAX(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
        |    COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp
        |  FROM pos),
        |y AS (SELECT *,
        |    SUM(CASE WHEN s_max = o_max THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_orderkey) AS nmax
        |  FROM x)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM y JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_max = o_max AND nsupp > 1 AND nmax = 1
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin
  )
}
