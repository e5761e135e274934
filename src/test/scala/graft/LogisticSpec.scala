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
