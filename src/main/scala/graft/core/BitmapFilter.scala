package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Broadcast bitmap (single-hash Bloom) semijoin prefiltering — the
  * runtime-filter pattern for large⨝large joins: build a compact bit
  * set over the build side's keys, broadcast it, and drop probe rows
  * whose key bit is absent BEFORE the join shuffle. False positives
  * (bit collisions) are possible and die in the exact join that
  * follows; false negatives are impossible — so the composition equals
  * the plain semijoin exactly, which is what the oracle computes.
  * Spark's own InjectRuntimeFilter does this opportunistically for
  * shuffle joins; this is the explicit, always-on form with an
  * engine-portable hash ([[Sampling.hash32]]), so the pruned set is
  * deterministic and testable.
  *
  * The bitmap is bits/64 (word, mask) rows — 2²⁰ bits = 16K rows ≈
  * 256 KiB — built with one partial-aggregating bit_or shuffle over
  * the build keys and broadcast; the probe side computes (word, bit)
  * per row and meets the bitmap in a broadcast hash join. At 100 TB
  * the win is the exchange it shrinks: only bit-passing probe rows
  * enter the big join's shuffle. */
object BitmapFilter {

  /** The build side's key bitmap: (word, mask) rows over a `bits`-bit
    * space (power of two ≥ 64); bit index = hash32(key) mod bits.
    * Null keys set no bit (they can never semijoin-match either). */
  def keyBitmap(build: DataFrame, keyCol: String, bits: Int): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"keyBitmap: bits=$bits must be a power of two >= 64")
    build.filter(col(keyCol).isNotNull)
      .select((Sampling.hash32(col(keyCol)) % bits).as("_b"))
      .select((col("_b") / 64).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_b % 64 AS INT))").as("_m"))
      .groupBy(col("word")).agg(bit_or(col("_m")).as("mask"))
  }

  /** probe ⋉ build (left-semi on probeKey = buildKey) with the bitmap
    * prefilter in front of the exact semijoin. Result is EXACTLY the
    * plain semijoin — the bitmap only prunes, never decides. */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, bits: Int = 1 << 20): DataFrame = {
    val bm = keyBitmap(build, buildKey, bits)
    val b = Sampling.hash32(col(probeKey)) % bits
    val pre = probe
      .withColumn("_w", (b / 64).cast("long"))
      .withColumn("_i", (b % 64).cast("int"))
      .join(broadcast(bm), col("_w") === col("word"))
      .filter(expr("(shiftright(mask, _i) & CAST(1 AS BIGINT)) = 1"))
      .drop("_w", "_i", "word", "mask")
    pre.join(build.select(col(buildKey)).distinct(),
      col(probeKey) === col(buildKey), "left_semi")
  }
}
