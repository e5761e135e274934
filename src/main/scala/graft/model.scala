package graft

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core case classes + schemas for the file-mover parity surface.
  * See SURVEY.md §1 (data model) — reference shapes at
  * app/app.py:80 (manifest), app/main.py:205-209 (listing),
  * app/main.py:149-192 (move results).
  */
object model {

  /** D1 — one manifest row (reference: archived_quotes.csv, README.md:74-79). */
  final case class QuoteRef(QuoteId: String, unixtimestamp: Long, filename: String)

  val manifestSchema: StructType = StructType(Seq(
    StructField("QuoteId", StringType),
    StructField("unixtimestamp", LongType),
    StructField("filename", StringType)))

  /** D1b — one TABLE-catalog row (reference: the second fixture
    * app/quotes/Results.csv:1 — `SourceSchema;SourceTableName;Source`,
    * 84 rows; SURVEY.md §1.1 documents table manifests as in-scope for
    * the workload family).
    */
  final case class CatalogRef(SourceSchema: String, SourceTableName: String,
                              Source: String)

  val catalogSchema: StructType = StructType(Seq(
    StructField("SourceSchema", StringType),
    StructField("SourceTableName", StringType),
    StructField("Source", StringType)))

  /** D2 — one listed file (reference: app/main.py:205-209).
    * `creation_time` is null where the filesystem does not expose one
    * (local FS, plain HDFS); cloud stores that do (via their FileStatus
    * subclasses) populate it, giving Select.fileDate's
    * creation-then-modified coalesce (app/main.py:120-124) two real
    * inputs.
    */
  final case class LakeFile(name: String, size: Long,
                            last_modified: Timestamp,
                            creation_time: Timestamp = null)

  /** Per-file outcome of a move/copy — replaces the reference's prints
    * (app/app.py:133-152, app/main.py:305-309) with a result DataFrame.
    * `status` is "success"/"failed" for awaited transfers; "pending"
    * for fire-and-forget copies (MoveSink.CopyAsync) whose issuance
    * succeeded but whose completion is not awaited — the reference's
    * pipeline-A contract (app/app.py:57-64).
    */
  final case class MoveResult(
      src: String,
      dst: String,
      ok: Boolean,
      error: String, // null on success
      bytes: Long,
      status: String)
}
