package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Select

/** O13 date-range (incl. null-date pass-through) + O15 reasons. */
class SelectSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("O13: bounds optional, inclusive, null date always passes") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-06-01 00:00:00")),
      (2, ts("2023-01-01 00:00:00")),
      (3, ts("2025-01-01 00:00:00")),
      (4, null.asInstanceOf[Timestamp])
    ).toDF("id", "d")

    def ids(after: Option[Timestamp], before: Option[Timestamp]): Set[Int] =
      df.filter(Select.inDateRange(col("d"), after, before))
        .select("id").collect().map(_.getInt(0)).toSet

    assert(ids(None, None) === Set(1, 2, 3, 4))
    assert(ids(Some(ts("2024-01-01 00:00:00")), None) === Set(1, 3, 4))
    assert(ids(None, Some(ts("2024-12-31 00:00:00"))) === Set(1, 2, 4))
    assert(ids(Some(ts("2024-01-01 00:00:00")),
               Some(ts("2024-12-31 00:00:00"))) === Set(1, 4))
    // inclusive bounds (reference rejects strictly < after / > before)
    assert(ids(Some(ts("2024-06-01 00:00:00")),
               Some(ts("2024-06-01 00:00:00"))) === Set(1, 4))
  }

  test("O15: keep + reason columns, reference check order") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-06-01 00:00:00"), """{"SalesCompanyId":"12"}"""),
      (2, ts("2023-01-01 00:00:00"), """{"SalesCompanyId":"12"}"""), // too early
      (3, ts("2025-06-01 00:00:00"), """{"SalesCompanyId":"12"}"""), // too late
      (4, ts("2024-06-01 00:00:00"), """{"SalesCompanyId":"99"}"""), // wrong id
      (5, null.asInstanceOf[Timestamp], """{"SalesCompanyId":"12"}""") // no date
    ).toDF("id", "d", "json")
    val (keep, reason) = Select.selection(col("d"), col("json"),
      Some(ts("2024-01-01 00:00:00")), Some(ts("2024-12-31 00:00:00")),
      "SalesCompanyId", Some("12"))
    val rows = df.select(col("id"), keep.as("k"), reason.as("r"))
      .collect().map(r => r.getInt(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(rows(1) === ((true, "Matches all criteria")))
    assert(rows(2)._1 === false)
    assert(rows(2)._2.startsWith("File uploaded before filter date"))
    assert(rows(3)._1 === false)
    assert(rows(3)._2.startsWith("File uploaded after filter date"))
    assert(rows(4) === ((false, "SalesCompanyId does not match")))
    assert(rows(5) === ((true, "Matches all criteria"))) // null date passes
  }
}
