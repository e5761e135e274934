package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Exact-phrase retrieval over a positional inverted index.
  *
  * `t_bm25`/`t_tfidf_topk` rank by bag-of-words; this is the missing
  * retrieval primitive that needs token POSITIONS: "w1 w2" matches only
  * where the terms are adjacent. The engine path is the real search-
  * engine shape — build postings (term, doc, pos), then resolve a
  * phrase as an equi-join of the w1 posting list against the w2 posting
  * list on (doc, pos+1). The oracle recomputes the same counts directly
  * with per-document list algebra, so the index path is verified against
  * the definition, not against itself.
  *
  * Scale shape: postings are produced map-side (posexplode — no shuffle);
  * the phrase table is tiny and broadcast, so the w1/w2 filters are
  * map-side semi-joins; the adjacency join shuffles only the FILTERED
  * posting rows on (doc, pos) keys — corpus-size-independent once term
  * selectivity applies, and skew-bounded by the df of the queried terms.
  * At 100 TB the postings table is the thing you persist bucketed by
  * term; the per-query work is unchanged.
  */
object SearchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- top-5 corpus bigrams re-resolved as phrase queries through
    //      the positional index: (phrase, docs containing it, total
    //      occurrences). n_occurrences from the index join must equal
    //      the direct bigram count the oracle computes — the query is
    //      self-adversarial. Deterministic phrase pick: count DESC,
    //      then (w1, w2) ASC over lowercase-ASCII tokens (binary
    //      collation on both engines). ----
    "t_phrase_search" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
      val bigrams = toks.select(col("doc_id"),
          explode(expr("transform(sequence(0, size(tk) - 2), " +
            "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val top = bigrams.groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_direct"))
        .orderBy(col("n_direct").desc, col("w1").asc, col("w2").asc)
        .limit(5)
        .select("w1", "w2")
      val postings = toks
        .select(col("doc_id"), posexplode(col("tk")))
        .toDF("doc_id", "pos", "term")
      val p1 = postings.join(broadcast(top), col("term") === col("w1"))
        .select(col("doc_id"), col("pos"), col("w1"), col("w2"))
      // p2 must be pre-filtered to the phrase second-words the same
      // way p1 is to first-words: with t2 === w2 only in the join
      // CONDITION, the adjacency join would shuffle the entire
      // corpus-sized postings relation whenever the filtered side
      // outgrows the broadcast threshold
      val p2 = postings
        .join(broadcast(top.select(col("w2").as("term"))), Seq("term"),
          "left_semi")
        .select(col("doc_id").as("d2"), col("pos").as("pos2"),
          col("term").as("t2"))
      p1.join(p2, col("d2") === col("doc_id") &&
          col("pos2") === col("pos") + 1 && col("t2") === col("w2"))
        .groupBy("w1", "w2")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bge AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(tk)), i -> [tk[i], tk[i+1]]))
        |      AS bg
        |  FROM toks),
        |cnt AS (
        |  SELECT bg[1] AS w1, bg[2] AS w2,
        |    COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
        |  FROM bge GROUP BY 1, 2)
        |SELECT w1, w2, n_docs, n_occurrences FROM cnt
        |ORDER BY n_occurrences DESC, w1, w2 LIMIT 5""".stripMargin
  )
}
