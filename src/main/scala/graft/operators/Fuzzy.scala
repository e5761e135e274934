package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): pairs of rows whose
  * strings are within edit distance 1, found WITHOUT a cross join via
  * deletion neighborhoods (the FastSS / SymSpell blocking): every
  * string emits itself plus each single-character deletion as
  * candidate keys. Any two strings at edit distance ≤ 1 share at least
  * one key — substitution at i ⇒ equal i-th deletions; insertion ⇒ the
  * shorter string IS a deletion of the longer — so the blocking is
  * EXACT (full recall, no length/position caveats), unlike
  * prefix/length banding.
  *
  * Scale shape: candidate generation is an equi-join on the variant
  * key (len+1 keys per row — linear blowup, same as shingling), exact
  * `levenshtein` verification touches only co-keyed pairs. For larger
  * distances, recurse the deletion neighborhood (k-deletion variants);
  * distance 1 covers the typo-dedup workhorse case.
  */
object Fuzzy {

  /** Self-join: (a_id, b_id, dist) for all pairs with
    * levenshtein ≤ 1, each exactly once (a_id < b_id). */
  def editNeighborPairs(df: DataFrame, idCol: String,
                        strCol: String): DataFrame = {
    val s = col("s")
    // guard empty strings: Spark's sequence(1, 0) yields DESCENDING
    // [1, 0], which would emit bogus variants
    val dels = when(length(s) === 0, array())
      .otherwise(transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), length(s)))))
    val v = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(array_distinct(concat(array(s), dels))).as("k"))
    v.as("a").join(v.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
