package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Hll, Kmv}

/** Mergeable-sketch queries with EXACT oracles.
  *
  * The built-in HLL/GK sketch values are engine-internal (spec-only
  * `Relational3.approxStats`, error-enveloped by `q_approx_stats_gate`);
  * this module carries the sketches whose
  * every output bit is a pure function of the input value set, so the
  * DuckDB hash gate applies in full. See [[graft.operators.Kmv]],
  * [[graft.operators.Hll]].
  */
object SketchQueries {

  private val kSrc = 8   // per-source: small k so the estimate path runs
  private val kAll = 64  // global: exercises deep merge across sources

  private val cmsDepth = 3  // independent hash rows
  private val cmsWidth = 16 // counters per row — narrow ON PURPOSE so
                            // collisions actually occur and the min-of-
                            // rows recovery is exercised, not vacuous

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- KMV distinct-count sketch, per source + a global 'ALL' row.
    //      Per-source k=8 (20 sources × ~25 distinct texts → the
    //      (k-1)*2^52/h_k estimator actually engages); global k=64
    //      (the sketch merge path folds 32 map-partial buffers).
    //      Emits the exact count beside the estimate so the row is its
    //      own error report. Shapes: two bounded-buffer aggregations
    //      (≤ k longs cross the exchange per group per task) + one
    //      broadcast-sized join with the exact side — the corpus is
    //      scanned twice and never shuffled at row granularity except
    //      for countDistinct's own two-phase expand. ----
    "q_kmv_distinct" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def side(grouped: DataFrame, k: Int): DataFrame =
        grouped.select(col("g"),
          size(col("kept")).cast("long").as("n_kept"),
          element_at(col("kept"), size(col("kept"))).as("kth_hash"),
          Kmv.estimate(col("kept"), k).as("est_distinct"))
      val perSrc = side(Kmv.sketch(d, col("source"), col("text"), kSrc), kSrc)
      val global = side(
        Kmv.sketch(d, lit("ALL"), col("text"), kAll), kAll)
      val exSrc = d.groupBy(col("source").as("g"))
        .agg(countDistinct(col("text")).as("n_exact"))
      val exAll = d.agg(countDistinct(col("text")).as("n_exact"))
        .select(lit("ALL").as("g"), col("n_exact"))
      perSrc.join(exSrc, "g").unionByName(global.join(exAll, "g"))
        .select(col("g").as("source"), col("n_exact"), col("n_kept"),
          col("kth_hash"), col("est_distinct"))
    }),

    // ---- HLL distinct-count sketch: 1024-register table per return
    //      flag, plus the per-register-MAX merge of those per-flag
    //      tables as the 'ALL' row — oracle equality of the
    //      merged row against a direct global sketch IS the
    //      mergeability proof (sketch(A∪B) == merge(sketch(A),
    //      sketch(B))), the property that lets a 100 TB pipeline
    //      persist one 1 KiB table per partition/day and fold later.
    //      Exact count beside the estimate; v_zero/s_scaled expose the
    //      raw registers so the row self-reports its regime. Shapes:
    //      two bounded aggs (≤1024 rows/group cross the exchange) +
    //      countDistinct's own two-phase expand; zero windows. ----
    "q_hll_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey").cast("string").as("v"))
      val regs = Hll.registers(li, col("l_returnflag"), col("v"))
        .localCheckpoint(false) // consumed per-flag AND by the merge
      val perFlag = Hll.estimate(regs)
      val merged = Hll.estimate(Hll.merge(regs, "ALL"))
      val ex = li.groupBy(col("l_returnflag").as("g"))
        .agg(countDistinct(col("v")).as("n_exact"))
      val exAll = li.agg(countDistinct(col("v")).as("n_exact"))
        .select(lit("ALL").as("g"), col("n_exact"))
      perFlag.join(ex, "g").unionByName(merged.join(exAll, "g"))
        .select(col("g").as("returnflag"), col("n_exact"), col("v_zero"),
          col("s_scaled"), col("est_distinct"))
    }),

    // ---- count-min frequency sketch over the document source stream:
    //      depth 3 × width 16 counters (the width is
    //      deliberately below the 20 live keys so buckets collide
    //      and the min-of-rows recovery does real work). Point
    //      estimates for every live key beside the exact count; the
    //      CMS guarantee est >= exact is emitted as the `overcount` column
    //      (>= 0 by construction, spec-asserted). Shapes: one corpus
    //      pass → posexplode to (row, bucket) → map-combinable count
    //      collapsing to ≤ 48 rows; the probe side joins the 48-row
    //      sketch BROADCAST onto the distinct keys. The sketch size is
    //      independent of stream length — that is the 100 TB story. ----
    "q_cms_freq" -> ((s, dir) => {
      import graft.operators.Cms
      val rows = t(s, dir, "documents").select(col("source").as("key"))
      val sketch = Cms.counters(rows, col("key"), cmsDepth, cmsWidth)
        .localCheckpoint(false) // ≤ depth*width rows, probed 3 times
      val keys = rows.groupBy("key").agg(count(lit(1)).as("exact"))
      Cms.probe(keys, sketch, cmsDepth, cmsWidth)
        .select(col("key"), col("exact"), col("est"),
          (col("est") - col("exact")).as("overcount"))
    })
  )

  val oracleSql: Map[String, String] = {
    val h = Kmv.hash52Sql("text")
    Map(
      "q_kmv_distinct" ->
        s"""WITH hv AS (SELECT DISTINCT source, $h AS hh FROM documents),
           |r AS (SELECT source, hh,
           |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh) AS rn
           |  FROM hv),
           |kq AS (SELECT source, COUNT(*) AS n_kept, MAX(hh) AS kth_hash
           |  FROM r WHERE rn <= $kSrc GROUP BY source),
           |ex AS (SELECT source, COUNT(DISTINCT text) AS n_exact
           |  FROM documents GROUP BY source),
           |ga AS (SELECT DISTINCT $h AS hh FROM documents),
           |gr AS (SELECT hh, ROW_NUMBER() OVER (ORDER BY hh) AS rn FROM ga),
           |gk AS (SELECT COUNT(*) AS n_kept, MAX(hh) AS kth_hash
           |  FROM gr WHERE rn <= $kAll),
           |gx AS (SELECT COUNT(DISTINCT text) AS n_exact FROM documents)
           |SELECT ex.source, ex.n_exact, kq.n_kept, kq.kth_hash,
           |  ${Kmv.estimateSql("kq.n_kept", "kq.kth_hash", kSrc)} AS est_distinct
           |FROM ex JOIN kq USING (source)
           |UNION ALL
           |SELECT 'ALL', gx.n_exact, gk.n_kept, gk.kth_hash,
           |  ${Kmv.estimateSql("gk.n_kept", "gk.kth_hash", kAll)} AS est_distinct
           |FROM gx CROSS JOIN gk""".stripMargin,

      // the oracle sketches 'ALL' directly from the value set; the
      // engine builds it by MERGING the seven per-mode register
      // tables — hash equality of the two constructions is the
      // mergeability proof
      "q_hll_distinct" -> {
        val hll = Hll.estimateSql(
          """SELECT l_returnflag AS g, CAST(l_orderkey AS VARCHAR) AS v
            |  FROM lineitem
            |UNION ALL
            |SELECT 'ALL', CAST(l_orderkey AS VARCHAR) FROM lineitem""".stripMargin)
        s"""WITH est AS ($hll),
           |ex AS (
           |  SELECT l_returnflag AS g,
           |    COUNT(DISTINCT l_orderkey) AS n_exact FROM lineitem GROUP BY 1
           |  UNION ALL
           |  SELECT 'ALL', COUNT(DISTINCT l_orderkey) FROM lineitem)
           |SELECT est.g AS returnflag, ex.n_exact, est.v_zero, est.s_scaled,
           |  est.est_distinct
           |FROM est JOIN ex ON est.g = ex.g""".stripMargin
      },

      "q_cms_freq" -> {
        def bucket(d: Int, e: String) =
          s"(${Kmv.hash52Sql(s"'cms$d:' || $e")} % $cmsWidth)"
        val unioned = (0 until cmsDepth).map(d =>
          s"SELECT $d AS d, ${bucket(d, "key")} AS b FROM rws")
          .mkString(" UNION ALL ")
        s"""WITH rws AS (
           |  SELECT source AS key FROM documents),
           |sk AS (SELECT d, b, COUNT(*) AS c FROM ($unioned) GROUP BY d, b),
           |ks AS (SELECT key, COUNT(*) AS exact FROM rws GROUP BY key),
           |probe AS (
           |  SELECT ks.key, ks.exact,
           |    LEAST(s0.c, s1.c, s2.c) AS est
           |  FROM ks
           |  JOIN sk s0 ON s0.d = 0 AND s0.b = ${bucket(0, "ks.key")}
           |  JOIN sk s1 ON s1.d = 1 AND s1.b = ${bucket(1, "ks.key")}
           |  JOIN sk s2 ON s2.d = 2 AND s2.b = ${bucket(2, "ks.key")})
           |SELECT key, exact, est, est - exact AS overcount FROM probe""".stripMargin
      }
    )
  }
}
