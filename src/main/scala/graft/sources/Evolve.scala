package graft.sources

import scala.collection.mutable.LinkedHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema evolution beyond what `mergeSchema` accepts: Spark's parquet
  * schema merge REFUSES conflicting primitive types, but a producer
  * widening a column (int → long, float → double) between snapshots is
  * a routine lake event — the old files don't get rewritten. This
  * reader aligns generations by column NAME, widens numeric physical
  * types to the least common representable type, fills columns a
  * generation lacks with NULL, and unions — each generation is read
  * with its OWN schema (no cross-file footer merge), so the plan is
  * per-generation scans + cheap casts, no shuffle.
  *
  * Widening lattice (loud error outside it — silent coercion between
  * unrelated types is how corruption spreads): integral widths
  * byte < short < int < long; float < double; {byte,short,int} ×
  * fractional → double (exact; long × fractional is REJECTED — double
  * loses bits above 2^53); TIMESTAMP_NTZ ∪ TIMESTAMP → TIMESTAMP (session-TZ
  * normalization, same rule as the events loader). Nested structs are
  * out of scope (document-level evolution, not field surgery).
  */
object Evolve {

  private val integralRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
  private val fractionalRank: Map[DataType, Int] = Map(
    FloatType -> 0, DoubleType -> 1)

  /** Least common widened type, or throw for un-widenable pairs. */
  private[graft] def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (a, b) match {
      case _ if integralRank.contains(a) && integralRank.contains(b) =>
        if (integralRank(a) >= integralRank(b)) a else b
      case _ if fractionalRank.contains(a) && fractionalRank.contains(b) =>
        if (fractionalRank(a) >= fractionalRank(b)) a else b
      // integral × fractional widens to double ONLY where double is
      // exact for every representable input: byte/short/int all fit in
      // double's 53-bit mantissa, as does every float value. LongType is
      // excluded — |long| > 2^53 would silently lose low bits, which is
      // precisely the corruption class this module's contract rejects;
      // a long→double change needs an explicit migration.
      case _ if (integralRank.contains(a) && fractionalRank.contains(b)) ||
        (fractionalRank.contains(a) && integralRank.contains(b)) =>
        if (a == LongType || b == LongType)
          throw new IllegalArgumentException(
            s"cannot widen ${a.simpleString} vs ${b.simpleString}: " +
              "double is inexact for |long| > 2^53 — this pair needs an " +
              "explicit migration, not a silent lossy cast")
        else DoubleType
      case (TimestampNTZType, TimestampType) => TimestampType
      case (TimestampType, TimestampNTZType) => TimestampType
      case _ => throw new IllegalArgumentException(
        s"cannot widen ${a.simpleString} vs ${b.simpleString}: not on " +
          "the numeric/timestamp widening lattice — a type change this " +
          "incompatible needs an explicit migration, not a silent cast")
    }

  /** Union the generations by column name with widening casts and NULL
    * fill. Column order = first appearance across `gens` (oldest
    * first, matching how the lake accreted them).
    */
  def unionByNameWidened(gens: Seq[DataFrame]): DataFrame = {
    require(gens.nonEmpty, "unionByNameWidened: no generations given")
    val target = LinkedHashMap.empty[String, DataType]
    gens.foreach(_.schema.fields.foreach { f =>
      target.update(f.name,
        target.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType))
    })
    val cols = target.toSeq
    gens.map { df =>
      val have = df.schema.fieldNames.toSet
      df.select(cols.map { case (n, t) =>
        (if (have(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
