package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/S2 — the SSURGO pipe-delimited text reader
  * (SSURGO_Convert_to_Geodatabase.py:1135-1590: csv.reader with
  * delimiter='|', quotechar='"', blank→NULL, cp1252 decode). The
  * reference's fixed import order (:1228-1236) exists only for FGDB FK
  * enforcement and is irrelevant here. Schemas are always explicit —
  * inference would silently turn TEXT keys into longs (SURVEY §1.5).
  */
object PipeCsv {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("delimiter", "|")
      .option("quote", "\"")
      .option("escape", "\"")
      // the reference decodes cp1252; Spark's CSV reader only allows a
      // fixed charset list, so we use iso-8859-1 (identical except for
      // 0x80-0x9F, which SSURGO text files do not use in key columns)
      .option("encoding", "iso-8859-1")
      .option("nullValue", "")
      // reference raises the field limit to 512 kB
      // (SSURGO_Convert_to_Geodatabase.py:1247)
      .option("maxColumns", "512")
      .schema(schema)
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("delimiter", "|")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "")
      // symmetric with read: non-ASCII (e.g. accented series names)
      // must survive the write→read roundtrip byte-for-byte
      .option("encoding", "iso-8859-1")
      .csv(path)

  /** S10 — merged-database append with by-key dedup
    * (SSURGO_MergeDatabases.py:395-845; dedup dict
    * SSURGO_Convert_to_Geodatabase.py:1158-1185). */
  def mergeDedup(dfs: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    dfs.reduce(_.unionByName(_)).dropDuplicates(keyCols)
}
