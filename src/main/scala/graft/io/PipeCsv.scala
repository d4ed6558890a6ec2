package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, translate}
import org.apache.spark.sql.types.{StringType, StructType}

/** S1/S2 — the SSURGO pipe-delimited text reader
  * (SSURGO_Convert_to_Geodatabase.py:1135-1590: csv.reader with
  * delimiter='|', quotechar='"', blank→NULL, cp1252 decode). The
  * reference's fixed import order (:1228-1236) exists only for FGDB FK
  * enforcement and is irrelevant here. Schemas are always explicit —
  * inference would silently turn TEXT keys into longs (SURVEY §1.5).
  *
  * cp1252 exactness: Spark's CSV reader has a fixed charset allowlist
  * without cp1252, but iso-8859-1 decodes every byte 1:1 (0x80–0x9F →
  * the C1 controls U+0080–U+009F), so composing it with a `translate`
  * over the 27 code points where cp1252 differs IS a cp1252 decode —
  * curly quotes (0x91–0x94 in muname/narrative text), dashes, €, Œ…
  * all land on the same characters the reference's decode produces.
  * The 5 bytes cp1252 leaves undefined (81 8D 8F 90 9D) pass through
  * as C1 controls, matching Windows' best-fit behavior. The write path
  * applies the inverse translate before encoding, so the roundtrip is
  * byte-for-byte.
  */
object PipeCsv {

  // bytes 0x80–0x9F as decoded by iso-8859-1 (C1 controls), aligned
  // index-by-index with the characters cp1252 assigns them
  private val c1: String =
    Seq(0x80, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x8B,
      0x8C, 0x8E, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
      0x9A, 0x9B, 0x9C, 0x9E, 0x9F).map(_.toChar).mkString
  private val cp: String =
    "€‚ƒ„…†‡ˆ‰Š‹" +
      "ŒŽ‘’“”•–—˜™" +
      "š›œžŸ"

  /** iso-8859-1-decoded text → cp1252 semantics (codegen'd, no UDF). */
  def cp1252Decode(c: Column): Column = translate(c, c1, cp)

  /** Inverse: map cp1252-only characters back to the C1 points that
    * iso-8859-1 encodes as their cp1252 bytes. */
  def cp1252Encode(c: Column): Column = translate(c, cp, c1)

  private def mapStrings(df: DataFrame, f: Column => Column): DataFrame =
    df.select(df.schema.fields.map { fd =>
      if (fd.dataType == StringType) f(col(fd.name)).as(fd.name) else col(fd.name)
    }.toIndexedSeq: _*)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    mapStrings(
      spark.read
        .option("delimiter", "|")
        .option("quote", "\"")
        .option("escape", "\"")
        .option("encoding", "iso-8859-1")
        .option("nullValue", "")
        // reference raises the field limit to 512 kB
        // (SSURGO_Convert_to_Geodatabase.py:1247)
        .option("maxColumns", "512")
        .schema(schema)
        .csv(path),
      cp1252Decode)

  def write(df: DataFrame, path: String): Unit =
    mapStrings(df, cp1252Encode).write.mode("overwrite")
      .option("delimiter", "|")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "")
      // symmetric with read: non-ASCII (accented series names, curly
      // quotes) must survive the write→read roundtrip byte-for-byte
      .option("encoding", "iso-8859-1")
      .csv(path)

  /** S10 — merged-database append with by-key dedup
    * (SSURGO_MergeDatabases.py:395-845; dedup dict
    * SSURGO_Convert_to_Geodatabase.py:1158-1185). */
  def mergeDedup(dfs: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    dfs.reduce(_.unionByName(_)).dropDuplicates(keyCols)
}
