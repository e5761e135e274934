package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t
import graft.functions.Text

/** Conversational (SFT) data plumbing: parse JSON chat transcripts
  * into typed turns, validate role alternation, and compute the
  * assistant-token share (the loss-mask budget).
  *
  * The fixture corpus has no chat column, so each document is first
  * SERIALIZED into a two-turn JSON conversation (user = first half of
  * the tokens, assistant = second half) with `to_json`, then the
  * operator under test parses it back with `from_json` + posexplode —
  * the DuckDB oracle computes the expected turns straight from the
  * raw halves, so any escaping/parsing defect in the JSON round trip
  * diverges the hash. Everything is a map-side projection per doc
  * (explode fanout = #turns); the only shuffle is the final per-doc
  * aggregate in the masking query.
  */
object ChatQueries {

  private val turnSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** (doc_id, conv) — the deterministic two-turn JSON transcript. */
  private def conv(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val tok = Text.tokens(col("text"))
    val n = size(tok)
    val half = greatest((n / 2).cast("int"), lit(1))
    val user = concat_ws(" ", slice(tok, lit(1), half))
    val asst = concat_ws(" ", slice(tok, half + lit(1),
      greatest(n - half, lit(0))))
    d.select(col("doc_id"), to_json(array(
      struct(lit("user").as("role"), user.as("content")),
      struct(lit("assistant").as("role"), asst.as("content"))))
      .as("conv"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- typed turns out of the JSON transcript + alternation flag ----
    "t_chat_turns" -> ((s, dir) => {
      conv(s, dir)
        .select(col("doc_id"),
          posexplode(from_json(col("conv"), turnSchema))
            .as(Seq("turn_idx", "turn")))
        .select(col("doc_id"), col("turn_idx"),
          col("turn.role").as("role"),
          length(col("turn.content")).as("n_chars"),
          (col("turn.role") === when(col("turn_idx") % 2 === 0, "user")
            .otherwise("assistant")).as("alternates"))
    }),

    // ---- per-doc loss-mask budget: assistant share of content chars ----
    "t_chat_mask_budget" -> ((s, dir) => {
      conv(s, dir)
        .select(col("doc_id"),
          explode(from_json(col("conv"), turnSchema)).as("turn"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("turn.role") === "assistant",
            length(col("turn.content"))).otherwise(0L)).as("asst_chars"),
          sum(length(col("turn.content"))).as("total_chars"))
        // parts-per-million via exact integer division: a rounded DOUBLE
        // here is comparator-hostile (ROUND(double, n) differs across
        // engines/versions in the last ULP); BIGINT arithmetic is not.
        .withColumn("asst_share_ppm",
          expr("asst_chars * 1000000L div greatest(total_chars, 1L)"))
    })
  )

  /** Oracle computes the halves straight from the raw text — the
    * engine's to_json/from_json detour must be the identity on top. */
  private val halvesSql =
    """h AS (
      |  SELECT doc_id, tk, len(tk) AS n,
      |    GREATEST(len(tk) // 2, 1) AS half
      |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
      |        FROM documents)),
      |turns AS (
      |  SELECT doc_id, 0 AS turn_idx, 'user' AS role,
      |    length(array_to_string(tk[1:half], ' ')) AS n_chars
      |  FROM h
      |  UNION ALL
      |  SELECT doc_id, 1, 'assistant',
      |    length(CASE WHEN n > half
      |      THEN array_to_string(tk[half + 1:n], ' ') ELSE '' END)
      |  FROM h)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t_chat_turns" ->
      s"""WITH $halvesSql
         |SELECT doc_id, turn_idx, role, n_chars, TRUE AS alternates
         |FROM turns""".stripMargin,

    "t_chat_mask_budget" ->
      s"""WITH $halvesSql
         |SELECT doc_id, COUNT(*) AS n_turns,
         |  CAST(SUM(CASE WHEN role = 'assistant' THEN n_chars ELSE 0 END)
         |    AS BIGINT) AS asst_chars,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  CAST(SUM(CASE WHEN role = 'assistant' THEN n_chars ELSE 0 END)
         |      * 1000000 // GREATEST(SUM(n_chars), 1) AS BIGINT)
         |    AS asst_share_ppm
         |FROM turns GROUP BY doc_id""".stripMargin
  )
}
