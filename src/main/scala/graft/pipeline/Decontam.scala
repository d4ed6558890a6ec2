package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares a word n-gram with an evaluation/benchmark
  * set — the standard "n-gram overlap" decontamination step run before
  * training (the eval side is benchmarks, i.e. tiny next to the
  * corpus).
  *
  * Physical shape: the corpus is shingled once (explode, no arrays
  * retained) and joined to the DISTINCT eval shingle set, which is
  * broadcast — at corpus scale this is a map-side hash semi-probe with
  * NO shuffle of the corpus shingles; the only aggregation is the
  * per-document overlap count, partial-aggregated on doc id. */
object Decontam {

  /** (idCol, n_shared) for every corpus doc sharing ≥ 1 distinct word
    * n-gram with `eval`; n_shared = how many of the doc's distinct
    * shingles appear anywhere in the eval set. Clean docs are absent
    * (semi-join semantics — at 100 TB the output is the contamination
    * report, not a corpus-wide annotation). */
  def contaminated(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n)
    val evalSh = Dedup.shingleRows(eval, idCol, textCol, n)
      .select(col("s")).distinct()
    corpusSh.join(broadcast(evalSh), "s")
      .groupBy(col("did").as(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
