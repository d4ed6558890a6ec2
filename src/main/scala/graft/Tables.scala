package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. The driver's parquet lake (TESTDATA.md) is one file
  * per table; in production this is a partitioned lake, so all reads go
  * through here. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it arrives as a long of
    * nanoseconds. Convert to a proper TimestampType column (microsecond
    * precision — sub-microsecond digits are dropped, so oracle queries
    * must only compare truncated/derived time values). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
