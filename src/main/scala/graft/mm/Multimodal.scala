package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-data mandate): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs as a partition-batched typed transform (the
  * Scala analog of mapInPandas — one JVM-side batch iterator per
  * partition, no per-row driver involvement).
  *
  * The actual media decode is a STUB — the image/audio codecs are not in
  * this container. `decodeStub` is a deterministic fake standing in for
  * the codec call; the Spark-side plumbing (binary column, schema,
  * partition batching, feature struct) is real and tested. */
object Multimodal {

  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, content_hash: String)

  /** STUB decode: real implementation would call an image codec here
    * (e.g. decode → (width, height, perceptual hash)). Deterministic
    * fake: dims derived from the byte length, hash = md5. */
  def decodeStub(bytes: Array[Byte]): (Long, Long, String) = {
    val n = bytes.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    (n % 640, n % 480, hex)
  }

  /** Partition-batched feature extraction over a binary column. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, hash) = decodeStub(bytes)
          MediaFeatures(id, bytes.length.toLong, w, h, hash)
        }
      }
  }
}
