package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares a word n-gram with an evaluation/benchmark
  * set — the standard "n-gram overlap" decontamination step run before
  * training (the eval side is benchmarks, i.e. tiny next to the
  * corpus).
  *
  * Physical shape: corpus shingles are generated per row with
  * codegen-clean expressions — explode(sequence) index rows +
  * element_at window slices (NOT the `wordShingles` transform/slice
  * HOFs, which are CodegenFallback and measured 4× slower; NOT the
  * window-lead `shingleRows`, which shuffles the whole corpus) — so
  * the corpus reaches the broadcast eval probe with NO shuffle at
  * all. Intra-doc duplicate shingles survive to the join and are
  * collapsed afterwards by count_distinct: the only exchange carries
  * the MATCHED (doc, shingle) rows — at corpus scale a tiny
  * fraction — partial-aggregated on doc id. */
object Decontam {

  /** (idCol, n_shared) for every corpus doc sharing ≥ 1 distinct word
    * n-gram with `eval`; n_shared = how many of the doc's distinct
    * shingles appear anywhere in the eval set. Clean docs are absent
    * (semi-join semantics — at 100 TB the output is the contamination
    * report, not a corpus-wide annotation). Shingle construction
    * matches [[Dedup.shingleRows]]/[[Dedup.wordShingles]]: docs
    * shorter than `n` tokens contribute their whole text as one
    * shingle. */
  def contaminated(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // (did, s) rows, duplicates within a doc allowed (collapsed after
    // the probe); every expression here is codegen'd
    def shingled(df: DataFrame) = df
      .select(col(idCol).as("did"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("did"), col("__t"), explode(
        when(size(col("__t")) >= n, sequence(lit(1), size(col("__t")) - (n - 1)))
          .otherwise(array(lit(1)))).as("__i"))
      .select(col("did"),
        when(size(col("__t")) >= n,
          concat_ws(" ", (0 until n).map(j => element_at(col("__t"), col("__i") + j)): _*))
          .otherwise(concat_ws(" ", col("__t"))).as("s"))
    val evalSh = shingled(eval).select(col("s")).distinct()
    shingled(corpus).join(broadcast(evalSh), "s")
      .groupBy(col("did").as(idCol))
      .agg(count_distinct(col("s")).as("n_shared"))
  }
}
