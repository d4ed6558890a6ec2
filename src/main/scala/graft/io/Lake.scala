package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The parquet-lake shape for SSURGO at scale (SURVEY §1.5/§3 entry
  * point 3): landed per-survey text → one parquet table partitioned by
  * areasymbol. Partitioning by survey area is the unit of incremental
  * ingest (WSS drops arrive per-SSA) and gives partition pruning for
  * the area-scoped queries the reference runs per-survey. */
object Lake {

  def write(df: DataFrame, root: String, table: String,
      partitionBy: Seq[String] = Seq("areasymbol")): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(s"$root/$table")

  def read(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** Append one survey area's rows (idempotent per areasymbol via
    * dynamic partition overwrite — re-landing a survey replaces only its
    * partition, the MergeDatabases append semantic at lake scale). */
  def appendSurvey(df: DataFrame, root: String, table: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("areasymbol")
      .parquet(s"$root/$table")

  /** Bucketed catalog table: co-locates the SSURGO join keys so the
    * repeated mapunit⟕component⟕chorizon joins run with NO shuffle at
    * all (both sides pre-hashed into the same bucket layout). This is
    * the 100 TB answer to the reference re-joining the same hierarchy
    * for every soil-map query. Requires the session catalog (bucketing
    * metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
