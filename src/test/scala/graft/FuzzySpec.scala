package graft

import graft.operators.Fuzzy

/** Deletion-neighborhood fuzzy join: exact recall at distance ≤ 1 —
  * substitutions, insertions, deletions all found; distance-2 pairs
  * excluded; equals brute force on a random-ish fixture. */
class FuzzySpec extends SparkSpec {

  test("editNeighborPairs == brute-force levenshtein<=1, all edit kinds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution (first char!)
      (3L, "kitte"),                    // deletion at end
      (4L, "kittens"),                  // insertion at end
      (5L, "sitting"),                  // distance 2+ from all
      (6L, "skitten"),                  // insertion at FRONT
      (7L, "kitten"))                   // exact duplicate (dist 0)
      .toDF("id", "s")
    val got = Fuzzy.editNeighborPairs(rows, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val brute = rows.as("a").crossJoin(rows.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id"), col("b.id"), levenshtein(col("a.s"), col("b.s")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === brute)
    // the cases the naive prefix/length blocking would miss are here:
    assert(got.contains((1L, 2L)) && got.contains((1L, 6L)))
    assert(got((1L, 7L)) === 0 && !got.contains((1L, 5L)))
  }
}
