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
    * a timed phase at another. Also evicts the matching [[rowCount]]
    * memos: a vintage dir rewritten in-process (or a long-lived driver
    * re-pointed at regenerated data) must not serve stale counts to
    * the adaptive-parameter call sites (r13 advice). */
  def clearCache(dir: String = ""): Unit = {
    cached.keys.toSeq.filter(k => dir.isEmpty || k._1 == dir).foreach { k =>
      cached.remove(k).foreach(_.unpersist(blocking = false))
    }
    counts.keys.toSeq.filter(k => dir.isEmpty || k._1 == dir)
      .foreach(counts.remove)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (cacheTables)
      cached.getOrElseUpdate((dir, name), {
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        // Cache-fill LAYOUT (r18): the test lake ships one row group per
        // table, so the scan - and therefore the cached RDD every query
        // maps over - is a single partition; every first map stage of
        // every query then runs ONE task regardless of cores (StageProbe:
        // p09 spent ~10 s in five serial 2.7-s scans of the cached
        // 600k-row lineitem). Widen the cache to a row-count-derived
        // partition count ONCE at fill (an 11 MB round-robin exchange,
        // paid one time per session). 20k rows/partition was swept
        // against 250 and 2000 at sf0.1: finer widths win nothing more
        // on the heavy lineitem scans but tax every small-table stage
        // with per-task overhead (e05 1.72 s at rows/250 vs 0.70 at
        // rows/20k). Scale story: a production lake's scan already
        // yields >= cores splits, so target <= scanParts and this is a
        // no-op - it repairs the small-file/single-row-group case only,
        // and the footer row count is O(KB) metadata.
        val rpp = sys.env.getOrElse("SPARK_GRAFT_CACHE_ROWS_PER_PART", "20000").toLong
        val target = footerRowCount(spark, s"$dir/$name.parquet")
          .map(r => math.min(spark.sparkContext.defaultParallelism.toLong,
            (r + rpp - 1) / rpp).toInt)
          .getOrElse(1)
        val scanParts = raw.queryExecution.toRdd.getNumPartitions
        (if (target > scanParts) raw.repartition(target) else raw).cache()
      })
    else spark.read.parquet(s"$dir/$name.parquet")

  private val counts =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Row count per (vintage dir, table) — the per-vintage corpus-
    * statistics artifact (the reference's `mdstattabs` row-count
    * analog). Adaptive parameters (band bit-widths, centroid counts,
    * layer steps) need only the integer n, and paying a full table
    * scan per QUERY to pick an integer is a 100 TB anti-pattern: the
    * r12 battery ran several full `documents`/`embeddings` passes for
    * exactly this. Resolution order: session memo → parquet FOOTER
    * metadata (row counts live in the footer, so the read is O(KB)
    * regardless of table size — the ingest-time stats table a real
    * lake would carry) → a counted scan only if the footer path fails.
    * Net: zero data-scan count jobs per battery run. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    counts.getOrElseUpdate((dir, name),
      footerRowCount(spark, s"$dir/$name.parquet")
        .getOrElse(load(spark, dir, name).count()))

  private def footerRowCount(spark: SparkSession, path: String): Option[Long] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      // A layout this flat listing can't fully account for — a
      // partitioned key=value tree (subdirectories), or a dir with no
      // top-level .parquet at all — must fall back to the counted
      // scan: returning Some(0) here would permanently memoize 0 and
      // silently collapse every adaptive parameter (centroid counts,
      // band bits, layer steps) to its minimum (r13 advice).
      val files =
        if (fs.getFileStatus(p).isDirectory) {
          val listed = fs.listStatus(p).toSeq
          if (listed.exists(_.isDirectory)) None
          else Some(listed.filter(f =>
            f.isFile && f.getPath.getName.endsWith(".parquet")))
            .filter(_.nonEmpty)
        } else Some(Seq(fs.getFileStatus(p)))
      files.map(_.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** events.parquet has shipped `ts` under two physical encodings across
    * testdata generations: TIMESTAMP(NANOS) (arrives as a long of
    * nanoseconds under spark.sql.legacy.parquet.nanosAsLong) and
    * TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ, or TIMESTAMP when NTZ
    * inference is off). Dispatch on the loaded dtype so either lake
    * vintage yields the same session-timezone TimestampType column at
    * microsecond precision. Sessions run with UTC timezone, so the
    * NTZ→TZ cast is instant-preserving. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))

  /** Normalize a `ts` column (batch OR streaming DataFrame) to session
    * TimestampType regardless of the lake vintage it was read from. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet dtype $other — expected long nanos or timestamp")
    }
  }
}
