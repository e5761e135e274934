package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Text
import graft.operators.Mining

/** Pattern-mining queries: skip-gram PMI over the documents corpus (the
  * counting pass under word2vec/GloVe-style embedding training) and
  * market-basket association rules over order line items.
  *
  * Scale shape (see operators/Mining): pair generation is map-side
  * (skip-grams) or basket-key-bounded (rules); marginals are
  * groupBy + equi-join back, never a window over a Zipfian word key.
  */
object MiningQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- skip-gram co-occurrence → PMI. Pair counts feed four pmi
    //      branches, so the aggregate is checkpointed once instead of
    //      re-running the explode+groupBy per branch. Output bounded
    //      by the c >= 5 frequency floor ----
    "t_skipgram_pmi" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      val counts = Mining
        .skipgramPairs(d, Text.tokens(col("text")), window = 3)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      Mining.pmi(counts).filter(col("c") >= 5)
    }),

    // ---- association rules over (order, part-brand) baskets: which
    //      brands co-occur in an order, with support / confidence /
    //      lift. Brand vocabulary is 25, so the rule space is bounded
    //      (≤ 600 directed pairs) at ANY corpus scale ----
    "t_assoc_rules" -> ((s, dir) => {
      // measured r16: Par.spread here is a net LOSS (2.13 → 2.5 s) —
      // the basket build is a broadcast join + project, not a
      // CPU-dense map; the rule mining downstream is shuffle-bound.
      // r17: repartition on the dedup keys BEFORE the checkpoint pins
      // it — unpinned, the broadcast-join output kept the scan's one
      // partition and the 600k-row distinct's partial aggregation ran
      // single-task. The win is WIDTH (the distinct's exchange
      // remains — checkpoint partitioning is invisible to the planner
      // under AQE, measured r17 — but its partial agg runs wide).
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("bk"), col("p_brand").as("item"))
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("bk"), col("item"))
        .localCheckpoint(false)
      Mining.associationRules(baskets, col("bk"), col("item"),
        minSupport = 50)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // window replay: for each offset 1..3 pair token i with token i+off;
    // empty tokens (split artifacts) dropped pairwise; PMI marginals
    // over the full pair table, c >= 5 floor applied at the end.
    "t_skipgram_pmi" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS tk FROM documents
        |  WHERE doc_id < 100),
        |pr AS (
        |  SELECT unnest(flatten(list_transform(range(1, 4), off ->
        |    list_transform(range(1, len(tk) - CAST(off AS INT) + 1), i ->
        |      {'w1': tk[CAST(i AS INT)],
        |       'w2': tk[CAST(i AS INT) + CAST(off AS INT)]})))) AS p
        |  FROM toks),
        |pc AS (
        |  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c FROM pr
        |  WHERE p.w1 <> '' AND p.w2 <> ''
        |  GROUP BY 1, 2),
        |cx AS (SELECT w1, SUM(c) AS cx FROM pc GROUP BY w1),
        |cy AS (SELECT w2, SUM(c) AS cy FROM pc GROUP BY w2),
        |n AS (SELECT SUM(c) AS n FROM pc)
        |SELECT pc.w1, pc.w2, pc.c,
        |  ROUND(ln(CAST(pc.c AS DOUBLE) * n.n
        |    / (CAST(cx.cx AS DOUBLE) * CAST(cy.cy AS DOUBLE))), 6) AS pmi
        |FROM pc JOIN cx ON pc.w1 = cx.w1
        |        JOIN cy ON pc.w2 = cy.w2
        |        CROSS JOIN n
        |WHERE pc.c >= 5""".stripMargin,

    "t_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |ci AS (SELECT item, COUNT(*) AS ci FROM b GROUP BY item),
        |f AS (SELECT bk, item FROM b JOIN ci USING (item)
        |  WHERE ci >= 50),
        |pr AS (
        |  SELECT a.item AS ante, c.item AS cons, COUNT(*) AS support
        |  FROM f a JOIN f c ON a.bk = c.bk AND a.item <> c.item
        |  GROUP BY 1, 2
        |  HAVING COUNT(*) >= 50),
        |n AS (SELECT COUNT(DISTINCT bk) AS n FROM b)
        |SELECT pr.ante, pr.cons, pr.support,
        |  ROUND(CAST(pr.support AS DOUBLE) / CAST(ca.ci AS DOUBLE), 6)
        |    AS confidence,
        |  ROUND(CAST(pr.support AS DOUBLE) * n.n
        |    / (CAST(ca.ci AS DOUBLE) * CAST(cb.ci AS DOUBLE)), 6) AS lift
        |FROM pr JOIN ci ca ON pr.ante = ca.item
        |        JOIN ci cb ON pr.cons = cb.item
        |        CROSS JOIN n""".stripMargin
  )
}
