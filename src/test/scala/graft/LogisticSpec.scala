package graft

import org.apache.spark.sql.functions._

import graft.operators.Logistic

/** Training laws for the in-engine logistic trainer: determinism under
  * partitioning, loss monotonicity on the gated corpus shape, and the
  * learned weights separating a separable fixture.
  */
class LogisticSpec extends SparkSpec {
  import spark.implicits._

  test("training is bit-reproducible under any partitioning") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val feats = Logistic.hashedFeatures(df,
        col("source") === "src18").localCheckpoint(false)
      Logistic.train(spark, feats, df.count(), epochs = 2, lr = 0.05)
    }
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("model artifact round-trips exactly; scoreInline == score; streams") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .localCheckpoint(false)
    val feats = Logistic.hashedFeatures(docs, col("source") === "src18")
      .localCheckpoint(false)
    val w = Logistic.train(spark, feats, docs.count(),
      epochs = 2, lr = 0.5).last
    // artifact law: exact decimals round-trip parquet
    val dir = java.nio.file.Files.createTempDirectory("qclf").toString
    Logistic.writeModel(spark, dir, w)
    assert(Logistic.readModel(spark, dir) === w)
    // deployment law: the per-row token fold equals the feature
    // aggregation's exact decimal sum, doc by doc
    def zs(df: org.apache.spark.sql.DataFrame, zc: String) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[java.math.BigDecimal](zc))
      .toMap.map { case (k, v) => k -> BigDecimal(v) }
    val agg = zs(Logistic.score(feats, w), "z")
    val inline = zs(Logistic.scoreInline(docs, w)
      .filter(col("n_tokens") > 0), "z")
    assert(agg.keySet === inline.keySet)
    assert(agg.forall { case (id, z) => inline(id) == z })
    // ...and scoreInline is stateless: a stream scores bit-equal
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = Logistic.scoreInline(mem.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("qscores")
      .outputMode("append").start()
    try { mem.addData(rows); q.processAllAvailable() } finally q.stop()
    val streamed = zs(spark.sql(
      "SELECT * FROM qscores WHERE n_tokens > 0"), "z")
    assert(streamed === inline)
  }

  test("GD reduces log-loss and separates a separable fixture") {
    // class-1 docs speak only token A, class-0 only token B; pick
    // tokens whose md5 first hex digits differ so the hashed features
    // are linearly separable by construction
    val (ta, tb) = ("alpha", "bravo")
    def bucket(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      "%02x".format(md(0))
    }
    assert(bucket(ta) != bucket(tb), "fixture tokens must hash apart")
    val docs = ((1 to 20).map(i =>
        (i.toLong, "pos", Seq.fill(5)(ta).mkString(" "))) ++
      (21 to 40).map(i =>
        (i.toLong, "neg", Seq.fill(5)(tb).mkString(" "))))
      .toDF("doc_id", "source", "text")
    val feats = Logistic.hashedFeatures(docs, col("source") === "pos")
      .localCheckpoint(false)
    val n = 40L
    val ws = Logistic.train(spark, feats, n, epochs = 4, lr = 0.5)
    // loss strictly decreases across epochs
    val losses = ws.map(w => Logistic.logLoss(spark, feats, w, n))
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      losses.mkString(", "))
    // the positive token's bucket learns a positive weight, the
    // negative token's a negative one; untouched buckets stay 0
    val wf = ws.last
    assert(wf(bucket(ta)) > 0 && wf(bucket(tb)) < 0)
    val touched = Set(bucket(ta), bucket(tb))
    assert(Logistic.bucketSpace().filterNot(touched)
      .forall(b => wf(b) == BigDecimal(0).setScale(6)))
  }
}
