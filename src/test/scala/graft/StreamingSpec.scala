package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Ingest

/** The streaming ingestion surface: the watermarked windowed rollup must
  * agree with its batch twin when all input is processed. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

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
