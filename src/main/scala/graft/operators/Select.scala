package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.JsonKeys

/** O13/O15 — the selection predicates of pipeline B (SURVEY.md §2.2).
  *
  * O13 date-range semantics (app/main.py:120-136): the file date is
  * `creation_time` falling back to `last_modified`; each bound is
  * optional; a file with NO known date always passes. Naive
  * `filter(d >= after)` would silently drop null dates — the null-pass
  * branch is explicit here.
  *
  * O15 (app/main.py:109-146): the conjunctive filter returns
  * (keep, reason) rather than discarding rows, so rejected rows remain
  * observable. Reason strings mirror the reference's.
  */
object Select {

  /** Effective file date (app/main.py:120-124). */
  def fileDate(creationTime: Column, lastModified: Column): Column =
    coalesce(creationTime, lastModified)

  /** O13: true iff date within [after, before], either bound optional;
    * null date always passes (app/main.py:128-136).
    */
  def inDateRange(d: Column, after: Option[Timestamp],
                  before: Option[Timestamp]): Column = {
    val afterOk  = after.map(a => d >= lit(a)).getOrElse(lit(true))
    val beforeOk = before.map(b => d <= lit(b)).getOrElse(lit(true))
    when(d.isNull, lit(true)).otherwise(afterOk && beforeOk)
  }

  /** O15: (keep, reason) columns. Check order matches the reference:
    * date-after, then date-before, then content (app/main.py:128-143).
    */
  def selection(d: Column, json: Column,
                after: Option[Timestamp], before: Option[Timestamp],
                contentKey: String, contentFilter: Option[String])
      : (Column, Column) = {
    val beforeAfter = after.map(a => d.isNotNull && d < lit(a)).getOrElse(lit(false))
    val afterBefore = before.map(b => d.isNotNull && d > lit(b)).getOrElse(lit(false))
    val contentFail = !JsonKeys.contentPredicate(json, contentKey, contentFilter)
    val keep = !beforeAfter && !afterBefore && !contentFail
    val reason =
      when(beforeAfter, concat(lit("File uploaded before filter date: "), d.cast("string")))
        .when(afterBefore, concat(lit("File uploaded after filter date: "), d.cast("string")))
        .when(contentFail, lit("SalesCompanyId does not match"))
        .otherwise(lit("Matches all criteria"))
    (keep, reason)
  }
}
