package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Dedup

/** Continuous-ingest near-dup screening: documents arriving on a stream
  * are checked against a STATIC corpus index — the "is this new page a
  * copy of something we already have?" gate a live training-data
  * pipeline runs before admitting a document.
  *
  * Scale shape: the stream side is banded entirely MAP-SIDE (shingles →
  * minhash signature → LSH band keys, all pure expressions — no
  * streaming state, no watermark needed), then a stream-static
  * equi-join on (band, band-hash) hits the prebuilt index, and exact
  * Jaccard verification prunes LSH false positives. State is zero; the
  * per-batch cost is the candidate join only. The index is a plain
  * DataFrame: rebuild it offline and swap it in between restarts, or
  * persist it via Listing.writeIndex-style parquet.
  */
object DedupStream {

  private def banded(df: DataFrame, idCol: String, textCol: String,
                     n: Int, bands: Int, rowsPerBand: Int,
                     idAs: String, shAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        array_distinct(Text.shingles(Text.tokens(col(textCol)), n)).as(shAs))
      .withColumn("__sig",
        Dedup.minhashSignature(col(shAs), bands * rowsPerBand))
      .select(col(idAs), col(shAs),
        posexplode(Dedup.lshBandKeys(col("__sig"), bands, rowsPerBand))
          .as(Seq("band", "bkey")))

  /** Build the static corpus band index: one row per (band, bkey) per
    * document, carrying the shingle set for exact verification. At
    * scale, persist this bucketed on (band, bkey) so every micro-batch
    * join is co-located. */
  def bandIndex(corpus: DataFrame, idCol: String, textCol: String,
                n: Int, bands: Int, rowsPerBand: Int): DataFrame =
    banded(corpus, idCol, textCol, n, bands, rowsPerBand, "base_id", "base_sh")

  /** Screen a document stream against the index. Emits one row per
    * (new_id, base_id, band) whose exact Jaccard clears `threshold` —
    * a pair matching in several bands appears once per band, because an
    * append-mode stream cannot deduplicate without a watermark;
    * aggregate in `foreachBatch` if single rows per pair are needed. */
  def flagNearDups(stream: DataFrame, index: DataFrame,
                   idCol: String, textCol: String,
                   n: Int, bands: Int, rowsPerBand: Int,
                   threshold: Double): DataFrame =
    banded(stream, idCol, textCol, n, bands, rowsPerBand, "new_id", "new_sh")
      .join(index, Seq("band", "bkey"))
      .withColumn("common",
        size(array_intersect(col("new_sh"), col("base_sh"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("new_sh")) + size(col("base_sh")) - col("common"))
          .cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "base_id", "jaccard", "band")
}
