package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-STAB join: for each probe value, every range containing it —
  * the keyless interval-lookup shape (IP→geo blocks, genomic interval
  * annotation, price-tier lookup) that EventOps.intervalJoin's per-key
  * residual cannot express (there is no equi-key: any probe may hit
  * any range).
  *
  * The naive form is an inequality theta-join — a cross product at
  * scale. The scale path here is the LSH blocked-candidates shape
  * applied to 1-D space: each range explodes to the fixed-width
  * BUCKETS it overlaps (≤ len/bucket + 1 rows — bounded when range
  * lengths are), a probe lives in exactly ONE bucket (v div bucket),
  * candidates meet on a plain equi-join, and exact containment
  * verifies bucket-mates. Because the probe has a single bucket, a
  * (range, probe) pair can meet at most once — no dedup pass. Pick
  * `bucket` near the typical range length: shorter buckets cut false
  * candidates, longer ones cut the range fan-out. */
object RangeStab {

  /** ranges must carry `startCol`/`endCol` (half-open [start, end),
    * BIGINT units); probes carry `vCol`. Returns every (probe row ×
    * containing range row) inner-joined, both sides' columns kept
    * (minus the internal bucket key). The join/containment references
    * are dataframe-scoped, so a column name shared between the two
    * inputs (even vCol == startCol) stays unambiguous — the output
    * then simply carries both same-named columns, Spark's usual join
    * contract. Neither input may already have a `__b` column (loud
    * require, it would be silently clobbered otherwise). */
  def stab(ranges: DataFrame, probes: DataFrame, startCol: String,
      endCol: String, vCol: String, bucket: Long): DataFrame = {
    require(bucket > 0, "RangeStab: bucket width must be positive")
    require(!ranges.columns.contains("__b") && !probes.columns.contains("__b"),
      "RangeStab: inputs must not carry a __b column (internal bucket key)")
    // half-open contract guard: an inverted range (end <= start) would
    // make the two-arg sequence() below auto-select step -1 and fan
    // out a huge DESCENDING bucket list (all killed by the containment
    // filter, but the explosion is silent) — empty ranges simply match
    // nothing, which is what [start, start) means
    val rb = ranges.filter(col(endCol) > col(startCol)).withColumn("__b",
      explode(expr(s"sequence($startCol div ${bucket}L, ($endCol - 1) div ${bucket}L)")))
    val pb = probes.withColumn("__b", expr(s"$vCol div ${bucket}L"))
    pb.join(rb, pb("__b") === rb("__b"))
      .filter(pb(vCol) >= rb(startCol) && pb(vCol) < rb(endCol))
      .drop(pb("__b")).drop(rb("__b"))
  }
}
