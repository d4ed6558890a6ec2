package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency-sketch operators (the q9 contract). Cardinality (HLL) and
  * quantile (GK) sketches ride Spark's SQL aggregates directly (q6/q7/
  * q8); Count-Min needs a driver-side query step because SQL exposes
  * only the build aggregate (`count_min_sketch`), not point lookups —
  * the sketch blobs are fixed-size (width·depth longs, ~100 KB at
  * eps=0.001), so collecting them is the bounded dimension-collect
  * convention, exactly how a production reporter queries hot keys. */
object Sketches {

  private def readCms(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  /** Exact top-`topK` heavy hitters of `keyCol` (count desc, key asc —
    * deterministic under ties) with the Count-Min contract gated per
    * key: `within_bound` = est ≥ exact ∧ est ≤ exact + ⌈eps·N⌉ (the
    * one-sided CMS guarantee; N = total counted items), and
    * `merge_exact` = an 8-way shard-partial build merged driver-side
    * estimates EQUAL to the direct single-pass sketch. For CMS that is
    * equality, not a bound: the counter arrays are sums of per-item
    * increments, so same-(eps, confidence, seed) partials merge to
    * bit-identical counters regardless of the shard split — the
    * additivity that lets every executor sketch its partition and
    * combine. Deterministic: fixed data + fixed seed ⇒ fixed counters
    * ⇒ the booleans cannot flake.
    *
    * Plan shape: one partial-agg shuffle + a topK-row global top-k for
    * the truth side; one distributed sketch aggregate each for the
    * direct and the 8-shard builds. Driver work: 9 sketch blobs + topK
    * keys — bounded at any corpus scale.
    *
    * Returns (keyCol, n_exact, within_bound, merge_exact). */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, topK: Int = 20,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val s = df.sparkSession
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // the shard split (pmod) and the driver-side estimateCount(Long)
    // replay both assume an integral key — fail at the API with a
    // clear message instead of a ClassCastException mid-collect
    val keyType = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"cmsHeavyHitters: key column '$keyCol' must be integral, got $keyType")
    val e = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as(keyCol))
    val cmsAgg = s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, $seed)"
    val top = e.groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol).asc).limit(topK)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import s.implicits._
    // empty / all-null input: no heavy hitters, and no sketch blobs to
    // merge (count_min_sketch over zero rows aggregates to NULL —
    // readCms would NPE and shardSks.head would throw); the empty
    // typed frame keeps the output schema identical either way
    if (top.isEmpty)
      return Seq.empty[(Long, Long, Boolean, Boolean)]
        .toDF(keyCol, "n_exact", "within_bound", "merge_exact")
    val direct = e.agg(expr(cmsAgg)).head().getAs[Array[Byte]](0)
    val shardSks = e.withColumn("shard", pmod(col(keyCol), lit(8)))
      .groupBy(col("shard")).agg(expr(cmsAgg).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    val dsk = readCms(direct)
    val msk = readCms(shardSks.head)
    shardSks.tail.foreach(b => msk.mergeInPlace(readCms(b)))
    val slack = math.ceil(eps * dsk.totalCount()).toLong
    val rows = top.toSeq.map { case (k, nx) =>
      val ed = dsk.estimateCount(k)
      (k, nx, ed >= nx && ed <= nx + slack, msk.estimateCount(k) == ed)
    }
    rows.toDF(keyCol, "n_exact", "within_bound", "merge_exact")
  }
}
