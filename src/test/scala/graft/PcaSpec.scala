package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PCA first component: the per-partition Gram aggregator must be
  * bit-identical to the declarative explode+groupBy formulation it
  * replaced, and invariant to input partitioning.
  */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Gram aggregator == declarative explode+groupBy, cell for cell") {
    val dim = 64
    val df = Tables.t(spark, dir, "embeddings")
    val xq = transform(col("embedding").cast("array<double>"), x => round(x, 9))
    val meanRows = df.select(posexplode(xq).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(col("x").cast("decimal(28,9)")).as("sx"), count(lit(1)).as("n"))
      .collect()
    val n = meanRows.head.getLong(2)
    val means = new Array[Double](dim)
    meanRows.foreach(r => means(r.getInt(0)) = r.getDecimal(1).doubleValue() / n)
    val cExpr = zip_with(xq, typedLit(means.toSeq), (x, m) => x - m)

    // declarative reference: per-row outer product rows, groupBy(i,j)
    val ref = df
      .select(explode(flatten(transform(cExpr, (ci, i) =>
        transform(cExpr, (cj, j) => struct(i.as("i"), j.as("j"),
          round(ci * cj, 12).cast("decimal(38,12)").as("p")))))).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy("i", "j").agg(sum(col("p")).as("sp"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).stripTrailingZeros)
      .toMap

    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val enc: org.apache.spark.sql.Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
    val cells = df.select(cExpr.as("c")).as[Seq[Double]]
      .select(new graft.operators.GramAggregator(dim).toColumn)
      .head()
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      val got = new java.math.BigDecimal(cells(k)).stripTrailingZeros
      assert(got.compareTo(ref((i, j))) == 0,
        s"Gram cell ($i,$j): aggregator $got != declarative ${ref((i, j))}")
      assert(got.compareTo(ref((j, i))) == 0,
        s"Gram symmetry ($j,$i): $got != ${ref((j, i))}")
      k += 1
    }
    assert(k == dim * (dim + 1) / 2)
  }

  test("pcaProject: deterministic under repartitioning, finite outputs") {
    val df = Tables.t(spark, dir, "embeddings")
    val a = Similarity.pcaProject(df.repartition(2), dim = 64, iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Similarity.pcaProject(df.repartition(7), dim = 64, iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "pc1 differs across partitioning")
    assert(a.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(a.size == df.count())
  }
}
