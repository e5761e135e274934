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
}
