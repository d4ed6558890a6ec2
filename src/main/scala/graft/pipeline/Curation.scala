package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The end-to-end training-data curation pipeline (builder north star):
  * score → language-verify → dedup-cluster → keep one survivor per
  * cluster above the quality bar. Composes the individually-verified
  * operators; every stage is a lazy DataFrame transform, so Catalyst
  * fuses the scoring expressions into one pass over the corpus and the
  * only shuffles are the dedup ones.
  *
  * Survivor rule: a document survives iff quality >= minQuality, its
  * predicted language matches the labeled language, and it is its
  * duplicate-cluster representative (the min doc id) — or belongs to no
  * cluster. */
object Curation {

  def curate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", minQuality: Double = 0.3,
      shingleN: Int = 2, jaccardThreshold: Double = 0.5): DataFrame = {
    val scored = docs.select(col(idCol), col(langCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.langId(col(textCol)).as("lang_pred"))
    val clusters = Dedup.dupClusters(
        Dedup.ngramJaccardPairs(docs, idCol, textCol, shingleN, jaccardThreshold))
      .withColumnRenamed("id", idCol)
    scored.join(clusters, Seq(idCol), "left")
      .filter(col("quality") >= minQuality &&
        col("lang_pred") === col(langCol) &&
        (col("cluster").isNull || col("cluster") === col(idCol)))
      .select(col(idCol), col(langCol), col("quality"))
  }
}
