package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

class TextSpec extends SparkSpec {

  private def df1(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("shingles: sliding n-grams; short docs yield empty (no desc-sequence trap)") {
    val r = df1("a b c d").select(
      Text.shingles(Text.tokens(col("text")), 3).as("sh")).collect()(0).getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
    val short = df1("a b").select(
      Text.shingles(Text.tokens(col("text")), 3).as("sh")).collect()(0).getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("token and subword counts") {
    val r = df1("the quick-brown fox 42").select(
      Text.tokenCount(col("text")).as("t"),
      Text.subwordCount(col("text")).as("s")).collect()(0)
    assert(r.getInt(0) === 4)
    // subwords: the, quick, brown, fox, 42 runs + 1 hyphen glyph
    assert(r.getInt(1) === 6)
  }

  test("langId: marker argmax with declaration-order ties, und when no hits") {
    def lang(t: String): String =
      df1(t).select(Text.langId(Text.tokens(col("text"))).as("l")).collect()(0).getString(0)
    assert(lang("the cat of doom") === "en")
    assert(lang("der hund ist und") === "de")
    assert(lang("xyzzy plugh") === "und")
    // 'la' is a marker for both es and fr → es wins by declaration order
    assert(lang("la la") === "es")
  }

  test("quality score bounded and monotone in stopword density") {
    val hi = df1("the a of and to the a of and to").select(
      Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      .collect()(0).getDouble(0)
    val lo = df1("xx yy zz ww vv uu tt ss rr qq").select(
      Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      .collect()(0).getDouble(0)
    assert(hi > lo)
    assert(hi <= 1.0 && lo >= 0.0)
  }
}
