package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. The driver's parquet lake (TESTDATA.md) is one file
  * per table; in production this is a partitioned lake, so all reads go
  * through here. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** With SPARK_GRAFT_CACHE=1, base tables are cached once per session —
    * the multi-query batch-session pattern the reference itself uses
    * (gSSURGO_CreateSoilMaps loops CreateSoilMap over one database;
    * SURVEY §3 "cache candidate"). Off by default: single-query runs and
    * correctness dumps should measure the cold path. */
  @volatile private var cacheTables: Boolean =
    sys.env.get("SPARK_GRAFT_CACHE").contains("1")
  private val cached = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Turn on base-table caching for a multi-query session (Bench). */
  def enableCache(): Unit = cacheTables = true

  /** Unpersist and forget every table cached under `dir` (all dirs when
    * empty) — lets a warmup phase at one SF release its storage before
    * a timed phase at another. */
  def clearCache(dir: String = ""): Unit =
    cached.keys.toSeq.filter(k => dir.isEmpty || k._1 == dir).foreach { k =>
      cached.remove(k).foreach(_.unpersist(blocking = false))
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (cacheTables)
      cached.getOrElseUpdate((dir, name),
        spark.read.parquet(s"$dir/$name.parquet").cache())
    else spark.read.parquet(s"$dir/$name.parquet")

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
