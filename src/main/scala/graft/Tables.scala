package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * one parquet file per table. Filters/projections applied on top of these
  * reads are pushed into the parquet scan by Catalyst (verified via
  * .explain: PushedFilters / ReadSchema), which is the behavior that keeps
  * a 100 TB scan from reading columns and row groups it does not need.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft entry point needs. `nanosAsLong` lets
    * fixtures whose ts is INT64 TIMESTAMP(NANOS) — which Spark's
    * vectorized reader otherwise rejects — read as long so `t` can
    * truncate to microseconds (Spark's native precision). Set at session
    * construction — NOT mutated per-read, which would leak into
    * unrelated reads and race across threads.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Adapt the events `ts` column to TIMESTAMP regardless of the
    * fixture's physical encoding. Producers change writers; an engine
    * that hard-codes one physical type breaks on the first upgrade (the
    * reference likewise degrades gracefully on metadata variance,
    * app/main.py:121-124). Supported encodings:
    *   - INT64 nanos read as LongType (via legacy nanosAsLong) → truncate
    *     to micros;
    *   - native TIMESTAMP / TIMESTAMP_NTZ → normalize to session-TZ
    *     TIMESTAMP (the session runs UTC, so NTZ micros are preserved
    *     bit-for-bit and every downstream query sees one stable type).
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }

  /** Register every table as a temp view so spark.sql(...) parity queries
    * can share the exact SQL text with the DuckDB oracle when convenient.
    *
    * Tolerates per-table failure: one unreadable table must not take down
    * SQL queries that never touch it (an events schema drift once failed
    * every `sql_*` query through this eager loop). The broken table is
    * skipped with a clear stderr note; a query that does reference it
    * then fails with TABLE_OR_VIEW_NOT_FOUND naming the table.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val failures = all.flatMap { n =>
      try { t(spark, dir, n).createOrReplaceTempView(n); None }
      catch {
        case e: Exception =>
          System.err.println(
            s"graft.Tables.registerAll: skipping view '$n' ($dir/$n.parquet): ${e.getMessage}")
          Some(n -> e)
      }
    }
    // one drifted table is survivable; ALL tables failing means the
    // directory itself is wrong (bad path, dead filesystem) and every
    // later sql_* query would die far from this root cause — fail here.
    if (failures.size == all.size)
      throw new IllegalStateException(
        s"registerAll: every table under $dir failed to register — " +
          s"misconfigured directory? First error: ${failures.head._2.getMessage}",
        failures.head._2)
  }
}
