package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract for every driver table (SURVEY TESTDATA.md): the lake
  * is regenerated between rounds, and a silent physical-type drift (round
  * 5: events.ts TIMESTAMP(NANOS)→TIMESTAMP(MICROS)) must fail ONE named
  * spec here, not N anonymous queries downstream. Timestamp columns are
  * allowed either vintage at the parquet layer; `Tables.events` must
  * always normalize `ts` to session TimestampType. */
class TablesSpec extends AnyFunSuite {
  import TestSpark._
  private val sf = "/root/testdata/sf0.001"

  /** name -> acceptable dtypes (timestamps may arrive NTZ, TZ, or — for
    * events.ts under nanosAsLong — long). */
  private def ts: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    "events" -> Map("event_id" -> Set(LongType), "ts" -> (ts + LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType))
  )

  Tables.names.foreach { name =>
    test(s"table contract: $name") {
      val want = contract(name)
      val got = Tables.load(spark, sf, name).schema
      assert(got.fieldNames.toSet === want.keySet, s"$name column set drifted")
      got.fields.foreach { f =>
        assert(want(f.name).contains(f.dataType),
          s"$name.${f.name}: lake dtype ${f.dataType} not in accepted set ${want(f.name)}")
      }
    }
  }

  test("Tables.events normalizes ts to session TimestampType (any lake vintage)") {
    assert(Tables.events(spark, sf).schema("ts").dataType === TimestampType)
  }

  test("Tables.normalizeTs rejects an unsupported ts dtype loudly") {
    val bad = Tables.load(spark, sf, "events")
      .withColumn("ts", org.apache.spark.sql.functions.lit("nope"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("Bench.timed surfaces a failing query as an error, never a success") {
    val (_, err) = Bench.timed(() => throw new RuntimeException("boom"))
    assert(err.exists(_.contains("boom")))
    val (_, ok) = Bench.timed(() => ())
    assert(ok.isEmpty)
  }
}
