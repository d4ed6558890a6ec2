package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Ingest

/** The streaming ingestion surface: the watermarked windowed rollup must
  * agree with its batch twin when all input is processed. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streamIntoLake upserts survey partitions incrementally (foreachBatch)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("mukey", StringType),
      StructField("v", IntegerType), StructField("areasymbol", StringType)))
    val drop = Files.createTempDirectory("graft_drop").toString
    val lake = Files.createTempDirectory("graft_lake_s").toString
    // the file-stream source watches flat files in the drop dir
    def land(rows: Seq[Row], file: String): Unit = {
      val tmp = Files.createTempDirectory("graft_land").toString
      TestSpark.df(schema, rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$drop/$file.parquet"))
    }
    // first drop: two surveys
    land(Seq(Row("m1", 1, "NE109"), Row("m2", 1, "IA021")), "d1")
    Ingest.streamIntoLake(spark, drop, schema, lake, "mapunit")
    assert(graft.io.Lake.read(spark, lake, "mapunit").count() === 2)
    // second drop: IA021 re-landed with new content; NE109 untouched
    land(Seq(Row("m2", 99, "IA021")), "d2")
    Ingest.streamIntoLake(spark, drop, schema, lake, "mapunit")
    val got = rowsOf(graft.io.Lake.read(spark, lake, "mapunit").select("mukey", "v"))
    assert(got === Seq(Seq("m1", 1), Seq("m2", 99)))
  }

  test("streamDedup over a parquet drop: surviving key set == batch firstArrival keys") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val dropDir = Files.createTempDirectory("graft_dedup_drop")
    Files.copy(Paths.get(src), dropDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(src).schema
    // append mode: dropDuplicatesWithinWatermark emits each surviving
    // key once
    val q = Ingest.streamDedup(spark, dropDir.toString, schema)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val stream = rowsOf(spark.sql(
      "SELECT user_id, event_type, value_cents FROM dedup_out"))
    val batch = rowsOf(Ingest.firstArrival(Tables.events(spark, "/root/testdata/sf0.001"))
      .select("user_id", "event_type", "value_cents"))
    assert(stream === batch) // one survivor per key, same key set
    assert(stream.nonEmpty)
  }

  test("streamHourlyRollup over a parquet drop == batch hourlyRollup") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val dropDir = Files.createTempDirectory("graft_stream_drop")
    Files.copy(Paths.get(src), dropDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(src).schema
    val sdf = Ingest.streamHourlyRollup(spark, dropDir.toString, schema)
    Ingest.runToMemory(sdf, "hourly_out")

    val stream = spark.sql(
      """SELECT win.start AS hour, event_type, n_events, sum_value
        |FROM hourly_out""".stripMargin)
    val batch = Ingest.hourlyRollup(Tables.events(spark, "/root/testdata/sf0.001"))

    assert(rowsOf(stream) === rowsOf(batch))
    assert(stream.count() > 0)
  }
}
