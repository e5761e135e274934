package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Banded

/** The banded rank / prefix-sum must equal the plain single-window
  * computations ROW FOR ROW — including null group keys (their own
  * partition, like the window they replace) and null values (the
  * plain sum's skip-null semantics, null until the first non-null).
  */
class BandedSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = spark.range(3000).select(
      // 90% of rows on one key, a null-key group, and small keys
      when(col("id") % 10 < 9, lit("mega"))
        .when(col("id") % 20 === 9, lit(null).cast("string"))
        .otherwise(concat(lit("k"), col("id") % 7)).as("g"),
      col("id"),
      // null values sprinkled in (including id=0, a group's first
      // row in md5 order sometimes)
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 97).as("v"))
    .localCheckpoint(true)

  test("rank == plain row_number under skew and null keys") {
    val df = skewed
    val w = Window.partitionBy(col("g"))
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
    val plain = df.withColumn("expect", row_number().over(w).cast("long"))
    val got = Banded.rank(df, Seq("g"), "id", "got")
    val joined = plain.join(got.select(col("id").as("id2"), col("got")),
      col("id") === col("id2"))
    assert(joined.filter(col("expect") =!= col("got")).isEmpty)
    assert(got.count() === 3000L)
  }

  test("prefixSum == plain inclusive window sum, null-skip semantics") {
    val df = skewed
    val w = Window.partitionBy(col("g"))
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.withColumn("expect", sum(col("v")).over(w))
    val got = Banded.prefixSum(df, Seq("g"), "id", col("v"), "got")
    val joined = plain.join(got.select(col("id").as("id2"), col("got")),
      col("id") === col("id2"))
    // null-safe compare: both null (the all-null prefix) or equal
    assert(joined.filter(!(col("expect") <=> col("got"))).isEmpty)
    // at least one row genuinely exercises the null-prefix edge
    assert(plain.filter(col("expect").isNull).count() ===
      got.filter(col("got").isNull).count())
  }
}
