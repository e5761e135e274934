package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model
import graft.operators.Paths

/** O1 + O8 + O8b + O10 — the CSV manifest reader of pipeline A
  * (SURVEY.md §2.1): `;`-delimited, header row, schema
  * (QuoteId, unixtimestamp, filename); reference read at app/app.py:80,
  * format documented README.md:70-79.
  */
object Manifest {

  /** O1: scan the manifest CSV with the fixed schema. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .schema(model.manifestSchema)
      .csv(path)

  /** O8b (app/app.py:83-86): fail fast if a required column is missing,
    * reporting the columns that ARE available.
    */
  def assertColumn(df: DataFrame, col: String): DataFrame = {
    require(df.columns.contains(col),
      s"Column '$col' not found in manifest. Available columns: ${df.columns.mkString(", ")}")
    df
  }

  /** O8 (app/app.py:89): project `filename`, drop nulls. */
  def filenames(df: DataFrame): DataFrame =
    assertColumn(df, "filename").select("filename").na.drop("any", Seq("filename"))

  /** O8 + O10: filenames normalized to full blob paths under
    * `sourcePrefix` (app/app.py:104-111).
    */
  def blobPaths(df: DataFrame, sourcePrefix: String): DataFrame =
    filenames(df).select(
      Paths.normalizeWithPrefix(col("filename"), sourcePrefix).as("path"))

  /** TABLE-catalog manifest reader — the reference's second fixture
    * family (app/quotes/Results.csv:1, `SourceSchema;SourceTableName;
    * Source`): which source-system tables feed the lake. Same CSV
    * dialect as the file manifest (`;`, header), fixed schema.
    */
  def readCatalog(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .schema(model.catalogSchema)
      .csv(path)

  /** Catalog summary: per (SourceSchema, Source) distinct-table counts
    * — the "what does each source system contribute" inventory view.
    * Rows with a null table name are dropped (same null-hygiene as
    * [[filenames]]); one map-combinable aggregation.
    */
  def catalogSummary(df: DataFrame): DataFrame = {
    assertColumn(df, "SourceTableName")
    df.na.drop("any", Seq("SourceTableName"))
      .groupBy("SourceSchema", "Source")
      .agg(countDistinct(col("SourceTableName")).as("n_tables"))
  }
}
