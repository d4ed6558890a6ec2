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

  /** Schema-evolution-tolerant read across lake VINTAGES: each
    * directory (one writer generation) is reconciled to the canonical
    * schema — columns the vintage lacks arrive as typed NULLs, columns
    * whose physical type drifted (float→double widening, int→long,
    * the round-6 TIMESTAMP(NANOS)→MICROS regeneration) are cast — and
    * the generations union. Spark's own mergeSchema only handles
    * added columns with IDENTICAL types; a dtype drift throws at scan
    * time, which is exactly how 19 queries died in round 5. The cast
    * set is per-vintage and resolved at PLAN time from each
    * directory's footer schema, so the scan itself stays
    * pushdown/prune-friendly per generation. */
  def readEvolved(spark: SparkSession, dirs: Seq[String],
      canonical: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(dirs.nonEmpty, "readEvolved: no vintage directories given")
    dirs.map { d =>
      val df = spark.read.parquet(d)
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(canonical.fields.toSeq.map { f =>
        have.get(f.name) match {
          case None => lit(null).cast(f.dataType).as(f.name)
          case Some(dt) =>
            // only LOSSLESS physical drift reconciles (float→double,
            // int→long, the nanos→micros class); an incompatible drift
            // (string→long, …) must fail HERE naming the vintage — a
            // lenient cast would silently turn the column to NULLs and
            // corrupt every query downstream, the exact failure mode
            // this reader exists to prevent
            if (dt != f.dataType && !org.apache.spark.sql.catalyst.expressions
                  .Cast.canUpCast(dt, f.dataType))
              throw new IllegalStateException(
                s"readEvolved: vintage $d column ${f.name} has $dt, " +
                s"not losslessly castable to canonical ${f.dataType}")
            col(f.name).cast(f.dataType).as(f.name)
        }
      }: _*)
    }.reduce(_ unionByName _)
  }

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
