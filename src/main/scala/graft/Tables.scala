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

  /** Session configs every graft entry point needs. In particular,
    * events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; `nanosAsLong` reads nanos as long so
    * `t` can truncate to microseconds (Spark's native precision). Set
    * at session construction — NOT mutated per-read, which would leak
    * into unrelated reads and race across threads.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Requires spark.sql.legacy.parquet.nanosAsLong=true (see
      // sessionConfigs). DuckDB reads the same column as TIMESTAMP_NS
      // directly — date-level outputs in oracles keep both sides
      // comparable.
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) parity queries
    * can share the exact SQL text with the DuckDB oracle when convenient. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
