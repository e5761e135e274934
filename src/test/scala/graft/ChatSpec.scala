package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-transcript plumbing: the to_json/from_json detour must be the
  * identity even on hostile content (quotes, backslashes, newlines,
  * unicode) — the escaping defects that silently corrupt SFT data.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val turnSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  test("JSON round trip is the identity on hostile content") {
    val hostile = Seq(
      """he said "quote" and \backslash\""",
      "line1\nline2\ttabbed",
      "unicode: café ❤ 😀",
      "{\"fake\": \"json\"}",
      "")
    val df = hostile.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "content")
    val got = df
      .select(col("id"), to_json(array(
        struct(lit("user").as("role"), col("content").as("content"))))
        .as("j"))
      .select(col("id"),
        element_at(from_json(col("j"), turnSchema), 1)
          .getField("content").as("back"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hostile.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == t, s"round trip mangled: <$t> -> <${got(i.toLong)}>")
    }
  }

  test("t_chat_turns: alternation holds and turn counts are exact") {
    val out = SparkEntry.queries("t_chat_turns")(
      spark, "/root/testdata/sf0.001").collect()
    val nDocs = Tables.t(spark, "/root/testdata/sf0.001", "documents").count()
    assert(out.length == 2 * nDocs)
    assert(out.forall(_.getBoolean(4)), "role alternation violated")
    val roles = out.map(r => (r.getInt(1), r.getString(2))).toSet
    assert(roles == Set((0, "user"), (1, "assistant")))
  }

  test("t_chat_mask_budget: ppm shares are in [0,1e6] and exact") {
    val out = SparkEntry.queries("t_chat_mask_budget")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.forall { r =>
      val ppm = r.getLong(4)
      val (ac, tc) = (r.getLong(2), r.getLong(3))
      ppm >= 0L && ppm <= 1000000L && ac <= tc &&
        ppm == ac * 1000000L / math.max(tc, 1L)
    })
  }
}
