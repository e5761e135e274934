package graft

import java.nio.file.Files

import graft.sources.Listing

/** Persisted file-index table: round trip + drop-in use in pipeline A. */
class FileIndexSpec extends SparkSpec {

  test("index round trip preserves the listing; pipelineA consumes it") {
    val root = Files.createTempDirectory("graft-index")
    val raw = root.resolve("raw"); Files.createDirectories(raw)
    Files.writeString(raw.resolve("a.json"), """{"x":1}""")
    Files.writeString(raw.resolve("b.json"), """{"x":2}""")
    val csv = root.resolve("manifest.csv")
    Files.writeString(csv,
      """QuoteId;unixtimestamp;filename
        |q1;1;a.json
        |q2;1;missing.json
        |""".stripMargin)

    val live = Listing.listDistributed(spark, s"file:$root/raw")
    val idxPath = s"file:$root/_index"
    Listing.writeIndex(live, idxPath)
    val idx = Listing.readIndex(spark, idxPath)
    assert(idx.collect().map(f => (f.name.split("/").last, f.size)).sorted.toSeq
      === Seq(("a.json", 7L), ("b.json", 7L)))

    // the index substitutes for the live walk: same found/not-found
    val (found, notFound, _) = Pipelines.pipelineA(
      spark, csv.toString, s"file:$root", "raw/", "archive/",
      dryRun = true, fileIndex = Some(idx))
    assert(found.collect().map(_.getString(0)).toSeq === Seq("raw/a.json"))
    assert(notFound.collect().map(_.getString(0)).toSeq === Seq("raw/missing.json"))
  }

  test("updateIndex: churned prefix refreshed, other prefixes untouched") {
    val root = Files.createTempDirectory("graft-index-upd")
    val raw = root.resolve("raw"); Files.createDirectories(raw)
    val cold = root.resolve("cold"); Files.createDirectories(cold)
    Files.writeString(raw.resolve("a.json"), "1234")
    Files.writeString(raw.resolve("gone.json"), "12")
    Files.writeString(cold.resolve("keep.json"), "123")
    val idx0 = Listing.listDistributed(spark, s"file:$root")
    // churn: one file deleted, one grown, one new — only under raw/
    Files.delete(raw.resolve("gone.json"))
    Files.writeString(raw.resolve("a.json"), "123456789")
    Files.writeString(raw.resolve("new.json"), "12345")
    val freshRaw = Listing.listDistributed(spark, s"file:$root/raw")
    // scheme-qualified prefix — the natural call pattern; updateIndex
    // must normalize it to the scheme-less names the index stores
    val merged = Listing.updateIndex(idx0, freshRaw, s"file:$root/raw")
      .collect().map(f => f.name.split("/").last -> f.size).toMap
    assert(merged === Map(
      "a.json" -> 9L, "new.json" -> 5L, "keep.json" -> 3L))
  }

  test("corrupt file among good ones: ignoreCorruptFiles reads the rest") {
    // the poison-pill contract at the FILE level (e_corrupt_json covers
    // the record level): one truncated/garbage parquet inside a 100 TB
    // scan must cost its own rows only, never the 10-hour job
    import spark.implicits._
    val root = Files.createTempDirectory("graft-corrupt")
    val dir = root.resolve("data")
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"file:$dir")
    Files.writeString(dir.resolve("part-junk.parquet"),
      "this is not parquet at all")
    // default (strict) mode must fail loudly…
    val strict = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(s"file:$dir").count()
    }
    assert(strict.getMessage.toLowerCase.contains("parquet") ||
      strict.getCause != null)
    // …opt-in resilience reads every healthy row
    val got = spark.read.option("ignoreCorruptFiles", "true")
      .parquet(s"file:$dir").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("approx sketches stay within tolerance of exact answers") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val o = Tables.t(spark, dir, "orders")
    val row = graft.queries.Relational3.approxStats(spark, dir).collect()(0)
    val exactDistinct = o.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val approx = row.getAs[Long]("approx_customers")
    assert(math.abs(approx - exactDistinct).toDouble / exactDistinct < 0.05)
    val quartiles = Seq(row.getAs[Double]("p25"), row.getAs[Double]("p50"),
      row.getAs[Double]("p75"))
    val exactMedian = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(quartiles(1) - exactMedian) / exactMedian < 0.05)
    assert(quartiles(0) <= quartiles(1) && quartiles(1) <= quartiles(2))
  }
}
