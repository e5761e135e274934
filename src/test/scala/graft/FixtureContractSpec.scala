package graft

import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
import org.apache.spark.sql.types._

/** Fixture-schema contract: the engine must ADAPT to the driver-generated
  * parquet, not hard-code one physical encoding. A driver-side fixture
  * regeneration once changed events.ts from INT64 nanos to native
  * TIMESTAMP(MICROS) and a single unconditional conversion killed 35
  * queries — this spec fails loudly, naming the drifted column, before
  * any query does.
  */
class FixtureContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Columns the engine's queries actually reference — a driver-side
    * rename/drop fails HERE, naming table and column, instead of as a
    * wall of red queries.
    */
  private val requiredCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "user_id", "event_type", "ts", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding"))

  test("every fixture table loads through Tables.t with its required columns") {
    Tables.all.foreach { name =>
      val df =
        try Tables.t(spark, sfDir, name)
        catch {
          case e: Exception =>
            fail(s"fixture table '$name' failed to load/adapt: ${e.getMessage}")
        }
      val have = df.schema.fieldNames.toSet
      val missing = requiredCols.getOrElse(name, Set.empty) -- have
      assert(missing.isEmpty,
        s"fixture table '$name' drifted: missing column(s) " +
          s"${missing.toSeq.sorted.mkString(", ")} (present: " +
          s"${have.toSeq.sorted.mkString(", ")})")
    }
  }

  test("events.ts adapts to TIMESTAMP whatever the fixture encodes") {
    val df = Tables.t(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TIMESTAMP, got " +
        s"${df.schema("ts").dataType.simpleString} — fixture drifted and " +
        "Tables.normalizeEventTs does not cover the new encoding")
    assert(df.filter(col("ts").isNotNull).count() > 0,
      "events.ts normalized to all-NULL — conversion is wrong for the " +
        "fixture's physical type")
  }

  test("normalizeEventTs covers legacy INT64-nanos and TIMESTAMP_NTZ inputs") {
    import spark.implicits._
    // 2021-06-01 00:00:00 UTC = 1622505600 s
    val nanos = Seq(1622505600L * 1000000000L).toDF("ts")
    val gotNanos = Tables.normalizeEventTs(nanos)
    assert(gotNanos.schema("ts").dataType == TimestampType)
    val micros = gotNanos
      .select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .as[Long].head()
    assert(micros == 1622505600L * 1000000L)

    val ntz = spark.range(1)
      .select(timestamp_micros(lit(1622505600L * 1000000L))
        .cast(TimestampNTZType).as("ts"))
    val gotNtz = Tables.normalizeEventTs(ntz)
    assert(gotNtz.schema("ts").dataType == TimestampType)

    val native = spark.range(1)
      .select(timestamp_micros(lit(1L)).as("ts"))
    assert(Tables.normalizeEventTs(native).schema("ts").dataType ==
      TimestampType)

    val bad = Seq("x").toDF("ts")
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeEventTs(bad)
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
