package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.t

/** Second relational batch: outer joins, HAVING, subquery SQL surface,
  * string/math function batteries, pivot, deterministic sampling, cube.
  *
  * `sql_*` queries run ONE shared ANSI SQL text through BOTH engines
  * (spark.sql over registered temp views; DuckDB over the same-named
  * parquet views) — the strongest form of surface parity.
  *
  * Cross-engine numeric discipline as in Relational: exact decimal for
  * sums, IEEE-exact ops only (sqrt, x*x — no pow/ln whose libm results
  * may differ in the last ulp).
  */
object Relational2 {

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |  CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val existsInSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 250000.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c_custkey
      |                    AND o2.o_orderstatus = 'P')""".stripMargin

  // latest-per-key window dedup — the most common production dedup
  // idiom, one text for both engines (decimal price tiebreak is exact)
  private val latestPerKeySql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn = 1""".stripMargin

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- left outer join preserving zero-order customers ----
    "q_outer_left_count" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_big_orders"))
    }),

    // ---- full outer join of two aggregates ----
    "q_full_outer_nation" -> ((s, dir) => {
      val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nk"), "full_outer")
        .select(col("nk").as("nationkey"), col("n_cust"), col("n_supp"))
    }),

    // ---- HAVING ----
    "q_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 15)
    }),

    // ---- shared-SQL-text queries (spark.sql == DuckDB text) ----
    "sql_q6_forecast" -> ((s, dir) => {
      Tables.registerAll(s, dir); s.sql(q6Sql)
    }),
    "sql_exists_in" -> ((s, dir) => {
      Tables.registerAll(s, dir); s.sql(existsInSql)
    }),
    "sql_latest_per_key" -> ((s, dir) => {
      Tables.registerAll(s, dir); s.sql(latestPerKeySql)
    }),

    // ---- string function battery ----
    "q_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 2, 3).as("sub"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        expr("replace(p_type, 'E', 'X')").as("repl"),
        instr(col("p_name"), "o").as("pos_o"),
        reverse(col("p_name")).as("rev"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
        expr("left(p_name, 4)").as("l4"),
        expr("split_part(p_name, ' ', 1)").as("word1"),
        col("p_name").like("%bolt%").as("is_bolt"),
        length(trim(concat(lit("  "), col("p_name"), lit("  ")))).as("trimlen"))
    }),

    // ---- math battery (IEEE-exact ops only) ----
    "q_math_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        abs(col("o_totalprice") - 150000.0).as("abs_diff"),
        ceil(col("o_totalprice")).as("ceil_p"),
        floor(col("o_totalprice")).as("floor_p"),
        signum(col("o_totalprice") - 150000.0).cast("int").as("sgn"),
        (col("o_orderkey") % 7).as("mod7"),
        expr("o_orderkey & 255").as("band"),
        expr("o_orderkey ^ 129").as("bxor"),
        shiftleft(col("o_orderkey") % 1024, 2).as("shl"),
        sqrt(col("o_totalprice")).as("sqrt_p"),
        (col("o_totalprice") * col("o_totalprice")).as("sq"),
        greatest(col("o_totalprice"), lit(100000.0)).as("gr"),
        least(col("o_orderkey"), col("o_custkey")).as("ls"),
        round(col("o_totalprice"), 1).as("r1"))
    }),

    // ---- pivot (conditional aggregation; names = priority values) ----
    "q_pivot_priority" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .count().na.fill(0L)
    }),

    // ---- deterministic hash sample (~1/8) ----
    "q_sample_hash" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
          .isin("0", "1"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- cube over status × order year ----
    "q_cube_status_year" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // ---- salted skew join: result identical to the plain equi-join ----
    "q_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice") > 250000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      graft.operators.Skew.saltedJoin(l, o, "l_orderkey", "l_linenumber", 8)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    }),

    // ---- TPC-H Q4 shape: EXISTS semi-join count by priority ----
    "q4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1997-01-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-01-01"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // ---- TPC-H Q12 shape: conditional aggregation over a join ----
    "q12_priority_class" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1997-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),

    // ---- TPC-H Q14 shape: ratio of conditional decimal sums ----
    "q14_promo_share" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
                col("l_shipdate") < lit("1996-04-01"))
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
      // part grows with SF — no forced broadcast; AQE decides
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
          sum(rev).cast("double")).as("promo_share"))
    }),

    // ---- window-function breadth: lag/lead/first/last/ntile ----
    "q_window_funcs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1, -1L).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
          first(col("o_orderkey")).over(w).as("first_key"),
          ntile(4).over(w).as("quartile"))
    }),

    // ---- null-handling battery (nulls injected deterministically) ----
    "q_null_funcs" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("p"),
        col("o_orderstatus"))
      o.select(col("o_orderkey"),
        coalesce(col("p"), lit(-1.0)).as("p_or_neg1"),
        nullif(col("o_orderstatus"), lit("P")).as("status_np"),
        col("p").isNull.as("p_missing"),
        when(col("p").isNull, lit("missing"))
          .when(col("p") > 200000.0, lit("big"))
          .otherwise(lit("small")).as("bucket"))
    }),

    // ---- exact median by element selection (no interpolation —
    //      deterministic across engines) ----
    "q_median_price" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_orderstatus")))
        .filter(col("rn") === expr("(cnt + 1) div 2")) // lower median
        .select(col("o_orderstatus"), col("o_totalprice").as("median_price"))
    }),

    // ---- cross join (tiny dims) ----
    "q_cross_join" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") === col("n_regionkey")).as("is_home"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_outer_left_count" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE o_totalprice > 200000.0) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q_full_outer_nation" ->
      """SELECT COALESCE(a.nk, b.nk) AS nationkey, a.n_cust, b.n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |      FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY 1) b ON a.nk = b.nk""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin,

    "sql_q6_forecast" -> q6Sql,
    "sql_exists_in" -> existsInSql,
    "sql_latest_per_key" -> latestPerKeySql,

    "q_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS up, lower(p_brand) AS lo,
        | substring(p_name, 2, 3) AS sub,
        | lpad(p_brand, 12, '*') AS lpadded,
        | replace(p_type, 'E', 'X') AS repl,
        | instr(p_name, 'o') AS pos_o,
        | reverse(p_name) AS rev,
        | concat_ws('-', p_brand, p_type) AS cw,
        | left(p_name, 4) AS l4,
        | split_part(p_name, ' ', 1) AS word1,
        | p_name LIKE '%bolt%' AS is_bolt,
        | length(trim('  ' || p_name || '  ')) AS trimlen
        |FROM part""".stripMargin,

    "q_math_funcs" ->
      """SELECT o_orderkey,
        | abs(o_totalprice - 150000.0) AS abs_diff,
        | CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
        | CAST(floor(o_totalprice) AS BIGINT) AS floor_p,
        | CAST(sign(o_totalprice - 150000.0) AS INT) AS sgn,
        | o_orderkey % 7 AS mod7,
        | o_orderkey & 255 AS band,
        | xor(o_orderkey, 129) AS bxor,
        | (o_orderkey % 1024) << 2 AS shl,
        | sqrt(o_totalprice) AS sqrt_p,
        | o_totalprice * o_totalprice AS sq,
        | greatest(o_totalprice, 100000.0) AS gr,
        | least(o_orderkey, o_custkey) AS ls,
        | round(o_totalprice, 1) AS r1
        |FROM orders""".stripMargin,

    "q_pivot_priority" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
        | CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
        | CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
        | CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
        | CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')""".stripMargin,

    "q_cube_status_year" ->
      """SELECT o_orderstatus, yr, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (SELECT o_orderstatus,
        |        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr, o_totalprice
        |      FROM orders)
        |GROUP BY CUBE(o_orderstatus, yr)""".stripMargin,

    "q_cross_join" ->
      """SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
        |FROM region CROSS JOIN nation""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00')
        |GROUP BY o_orderpriority""".stripMargin,

    "q12_priority_class" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,

    "q14_promo_share" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        | AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey, 1, -1) OVER w AS prev_key,
        | lead(o_orderkey, 1, -1) OVER w AS next_key,
        | first_value(o_orderkey) OVER w AS first_key,
        | ntile(4) OVER w AS quartile
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        | COALESCE(p, -1.0) AS p_or_neg1,
        | NULLIF(o_orderstatus, 'P') AS status_np,
        | p IS NULL AS p_missing,
        | CASE WHEN p IS NULL THEN 'missing'
        |      WHEN p > 200000.0 THEN 'big' ELSE 'small' END AS bucket
        |FROM (SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS p
        |  FROM orders)""".stripMargin,

    "q_median_price" ->
      """SELECT o_orderstatus, o_totalprice AS median_price
        |FROM (SELECT o_orderstatus, o_totalprice, o_orderkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,

    // un-salted equivalent — proves salting preserves join semantics
    "q_salted_join" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 250000.0
        |GROUP BY l_orderkey""".stripMargin
  )
}
