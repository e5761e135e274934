package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-provenance ledger — the erasure story for artifacts that
  * are AGGREGATES, not row stores. `takedown` can erase a document's
  * rows from the band/IVF/frontier indexes because those artifacts
  * keep per-document rows; a trained classifier's 256 weights or a
  * tokenizer vocabulary are sums over the whole training corpus — no
  * row to delete exists, and (the documented aggregate-statistics
  * position) an individual document's contribution is not
  * reconstructible from the artifact. The remedy a
  * right-to-be-forgotten request needs is therefore: KNOW which
  * trained artifacts a document influenced, erase rows where rows
  * exist, and RETRAIN the aggregates without the erased documents.
  * This ledger is that knowledge: every artifact build/train appends
  * (artifact, kind, doc_id) for its training inputs, and
  * [[influences]] answers "which artifacts did these documents touch,
  * and what is the remedy for each".
  *
  * Scale shape: the ledger is Σ artifact training-set sizes — doc-ID
  * rows, never text — partitioned by doc_id so an erasure probe is
  * one equi-join; the influence report is one groupBy over the hits.
  */
object Provenance {

  /** Artifact kinds whose persisted form keeps per-document rows —
    * erasable in place (the `takedown` path). Everything else is a
    * trained aggregate: the remedy is retraining without the erased
    * documents.
    */
  val RowLevelKinds: Set[String] = Set("band", "ivf", "frontier")

  def actionOf(kind: Column): Column =
    when(kind.isin(RowLevelKinds.toSeq.map(_.asInstanceOf[Any]): _*),
      lit("erase_rows")).otherwise(lit("retrain_required"))

  /** One artifact's training-input records. */
  def record(artifact: String, kind: String, docs: DataFrame,
             idCol: String = "doc_id"): DataFrame =
    docs.select(lit(artifact).as("artifact"), lit(kind).as("kind"),
      col(idCol).cast("long").as("doc_id")).distinct()

  /** Append an artifact's training inputs to the persisted ledger
    * (called where the artifact is built/trained — the same moment
    * the band index writes its rows).
    */
  def append(spark: SparkSession, path: String, artifact: String,
             kind: String, docs: DataFrame,
             idCol: String = "doc_id"): Unit =
    record(artifact, kind, docs, idCol)
      .write.mode("append").parquet(s"$path/entries")

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/entries")

  /** The erasure-impact report: for a set of doc ids to forget, every
    * artifact they influenced — its kind, the remedy
    * ([[actionOf]]: erase rows vs retrain), how many of its training
    * documents are being erased, and the erased share in exact ppm
    * (the "is retraining even material" number). Artifacts the ids
    * never touched still report (n_erased = 0) — a takedown audit
    * must show the artifacts it checked, not only the ones it hit.
    */
  def influences(ledger: DataFrame, ids: DataFrame,
                 idCol: String = "id"): DataFrame = {
    val gone = ids.select(col(idCol).cast("long").as("doc_id"))
      .distinct().withColumn("__gone", lit(true))
    ledger.join(gone, Seq("doc_id"), "left")
      .groupBy("artifact", "kind")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__gone"), 1L).otherwise(0L)).as("n_erased"))
      .select(col("artifact"), col("kind"),
        actionOf(col("kind")).as("action"),
        col("n_docs"), col("n_erased"),
        expr("n_erased * 1000000 div n_docs").as("erased_ppm"))
  }
}
