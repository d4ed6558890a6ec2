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

  test("rowCount falls back to a counted scan on layouts the footer path can't total") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_rc").toFile.getAbsolutePath
    // partitioned key=value layout: spark.read.parquet reads it fine,
    // but the flat footer listing sees only subdirectories — Some(0)
    // here would memoize 0 and collapse adaptive parameters (r13
    // advice); the contract is fall back to load(...).count()
    spark.range(7).selectExpr("id", "id % 2 AS k")
      .write.partitionBy("k").parquet(s"$root/parts.parquet")
    assert(Tables.rowCount(spark, root, "parts") === 7L)
    // empty directory (no top-level .parquet): same fallback, and the
    // count reflects whatever spark.read finds — here a failure, which
    // must not be masked by a memoized 0
    Files.createDirectory(new java.io.File(s"$root/none.parquet").toPath)
    intercept[Exception](Tables.rowCount(spark, root, "none"))
  }

  test("clearCache evicts rowCount memos for the cleared dir (lifecycle-consistent)") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_cc").toFile.getAbsolutePath
    spark.range(3).write.parquet(s"$root/t.parquet")
    assert(Tables.rowCount(spark, root, "t") === 3L)
    // rewrite the vintage in-process; a stale memo would keep serving 3
    spark.range(5).write.mode("overwrite").parquet(s"$root/t.parquet")
    Tables.clearCache(root)
    assert(Tables.rowCount(spark, root, "t") === 5L)
  }

  test("Bench.timed surfaces a failing query as an error, never a success") {
    val (_, err) = Bench.timed(() => throw new RuntimeException("boom"))
    assert(err.exists(_.contains("boom")))
    val (_, ok) = Bench.timed(() => ())
    assert(ok.isEmpty)
  }
}
