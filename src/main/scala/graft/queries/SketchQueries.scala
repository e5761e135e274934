package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Kmv

/** Mergeable-sketch queries with EXACT oracles.
  *
  * `q_approx_stats` (HLL / GK) is rows-only by design because those
  * sketches are engine-internal; this module carries the sketches whose
  * every output bit is a pure function of the input value set, so the
  * DuckDB hash gate applies in full. See [[graft.operators.Kmv]].
  */
object SketchQueries {

  private val kSrc = 8   // per-source: small k so the estimate path runs
  private val kAll = 64  // global: exercises deep merge across sources

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
           |FROM gx CROSS JOIN gk""".stripMargin
    )
  }
}
