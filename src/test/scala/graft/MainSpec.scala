package graft

import java.nio.file.{Files, Path => JPath}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import graft.operators.MoveSink

/** The CLI entry: knob resolution (flags > env, reference .env contract)
  * and an end-to-end smoke run over a temp lake.
  */
class MainSpec extends SparkSpec {

  private def write(root: JPath, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("parse: flags beat env; env supplies the rest; date-only widens to midnight") {
    val cfg = Main.parse(
      Seq("pipelineB", "--source", "raw/", "--after", "2024-01-01",
        "--dry-run"),
      env = Map(
        "GRAFT_LAKE_ROOT" -> "file:/lake",
        "GRAFT_SOURCE_PATH" -> "ignored/",   // flag wins
        "GRAFT_TARGET_PATH" -> "archive/",
        "GRAFT_COMPANY_ID" -> "12"))
    assert(cfg.lakeRoot === "file:/lake")
    assert(cfg.source === "raw/")
    assert(cfg.target === "archive/")
    assert(cfg.after === Some(Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(cfg.companyId === Some("12"))
    assert(cfg.dryRun)
    assert(cfg.mode === MoveSink.Copy)
  }

  test("parse: missing required knob and bad mode are loud") {
    intercept[IllegalArgumentException] {
      Main.parse(Seq("pipelineB", "--source", "raw/"), env = Map.empty)
    }
    intercept[IllegalArgumentException] {
      Main.parse(Seq("pipelineB", "--lake-root", "file:/l", "--source", "s",
        "--target", "t", "--mode", "teleport"), env = Map.empty)
    }
    intercept[IllegalArgumentException] { Main.parse(Seq("pipelineC")) }
  }

  test("run: pipelineB smoke over a temp lake — dry-run counts, then real move") {
    val root = Files.createTempDirectory("graft-cli")
    write(root, "raw/a.json", """{"SalesCompanyId":"12"}""")
    write(root, "raw/b.json", """{"SalesCompanyId":"99"}""")
    def cfg(dry: Boolean) = Main.parse(
      Seq("pipelineB", "--lake-root", s"file:$root", "--source", "raw/",
        "--target", "archive/", "--company-id", "12") ++
        (if (dry) Seq("--dry-run") else Nil),
      env = Map.empty)

    val dry = Main.run(spark, cfg(dry = true)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dry === Map("would_move" -> 1L, "skipped" -> 1L))
    assert(Files.exists(root.resolve("raw/a.json"))) // dry run touched nothing

    val real = Main.run(spark, cfg(dry = false)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(real === Map("success" -> 1L))
    assert(!Files.exists(root.resolve("raw/a.json")))
    assert(Files.exists(root.resolve("archive/a.json")))
    assert(Files.exists(root.resolve("raw/b.json"))) // filtered out, untouched
  }

  test("run: pipelineA smoke — manifest drives the copy, statuses reported") {
    val root = Files.createTempDirectory("graft-cli-a")
    write(root, "raw/x.json", """{"QuoteId":"q1"}""")
    val csv = root.resolve("manifest.csv")
    Files.writeString(csv,
      """QuoteId;unixtimestamp;filename
        |q1;1761940950;x.json
        |""".stripMargin)
    val cfg = Main.parse(
      Seq("pipelineA", "--lake-root", s"file:$root", "--manifest",
        csv.toString, "--source", "raw/", "--target", "archive/"),
      env = Map.empty)
    val got = Main.run(spark, cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("success" -> 1L))
    assert(Files.exists(root.resolve("raw/x.json")))      // copy retains
    assert(Files.exists(root.resolve("archive/x.json")))
  }
}
