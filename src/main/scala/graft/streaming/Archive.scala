package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Continuous archive mode (SURVEY.md §2.5): the reference's one-shot
  * "list → filter → move" (app/main.py:229-320) as a Structured
  * Streaming file source. Spark's `cleanSource=archive` IS the
  * reference's move semantics — each fully-processed source file is
  * relocated under `archiveDir` by the engine, with exactly-once
  * bookkeeping in the checkpoint (vs the reference's no-retry-story
  * download/upload/delete).
  *
  * `maxFilesPerTrigger` is the streaming analogue of the reference's
  * BATCH_SIZE=50 chunking (app/main.py:278).
  */
object Archive {

  /** Streaming scan of JSON documents arriving under `sourceDir`. */
  def readJsonStream(spark: SparkSession, sourceDir: String, schema: StructType,
                     archiveDir: Option[String] = None,
                     maxFilesPerTrigger: Int = 50): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    val r2 = archiveDir match {
      case Some(dir) => r.option("cleanSource", "archive")
        .option("sourceArchiveDir", dir)
      case None => r
    }
    r2.json(sourceDir)
  }

  /** Sink writing the (possibly transformed) stream as parquet with a
    * checkpoint — the durable, replayable replacement for the
    * reference's print-based reporting.
    */
  def toParquet(df: DataFrame, outDir: String, checkpointDir: String)
      : DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
}
