package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators Spark lacks as built-ins, expressed in the
  * shapes that scale: the as-of (backward) join and time-range rolling
  * aggregates. Both shuffle once on the partition key and never sort
  * or join beyond that key's partition — no global windows, no range
  * cross-joins.
  *
  * (The reference's tabular pipeline has no temporal operators; these
  * cover the builder's event/training-pipeline mandate alongside
  * graft.streaming.) */
object EventOps {

  /** Backward as-of join: each left row picks the payload of the most
    * recent right row with the same `key` and `ts` ≤ its own (at equal
    * `ts` the right row is visible — standard backward semantics). The
    * matched row's payload is returned even when it is null — `out` is
    * null only when NO right row precedes (the marker wraps the payload
    * in a struct, so a null payload never falls through to an older
    * row).
    *
    * Join-style null semantics: right rows with a null `key` or null
    * `ts` are dropped (they can match nothing deterministically); left
    * rows always survive, and get a null `out` when their `key`/`ts` is
    * null (a null key partitions with only left rows, and a null ts
    * sorts NULLS FIRST — before every right row).
    *
    * Physical shape: union the two sides tagged, one shuffle on `key`,
    * and a running `last(marker, ignoreNulls)` over the per-key order
    * — the classic union-scan formulation. A join-based as-of would
    * either range-cross-join or re-shuffle per bucket; this is one
    * exchange and one sort, both bounded by the key's partition.
    *
    * Total order inside a key is (`ts`, side, `tie`): right rows sort
    * before left rows at equal `ts`, and `tie` (kept at its own type —
    * any orderable column) must be unique within the right side at a
    * single `ts` (which right row "wins" a tie is otherwise
    * undefined). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      tie: String, payload: String, out: String = "asof"): DataFrame = {
    val pType = right.schema(payload).dataType
    val tieType = right.schema(tie).dataType
    val leftCols = left.columns.map(col).toSeq
    val lt = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(pType).as("__p"), lit(null).cast(tieType).as("__tie"),
      struct(leftCols: _*).as("__row"))
    val rt = right.filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), lit(0).as("__side"),
        col(payload).as("__p"), col(tie).as("__tie"),
        lit(null).cast(lt.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc_nulls_first, col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // marker is non-null for every right row (even a null payload), so
    // last(ignoreNulls) finds the most recent right ROW, not the most
    // recent non-null payload
    val marker = when(col("__side") === 0, struct(col("__p")))
    lt.unionByName(rt)
      .withColumn("__m", last(marker, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col("__m.__p").as(out))
  }

  /** Nearest-in-time as-of join with a tolerance: each left row picks
    * the right row (same `key`) whose timestamp is closest to its own
    * in EITHER direction, within `tol` ts units — pandas
    * merge_asof(direction='nearest') semantics, the alignment shape
    * for lagging-or-leading lookups (sensor sync, price marks).
    * Backward is ts-inclusive, forward strictly after (an equal-ts
    * right row is a backward match); distance ties prefer backward
    * (the pandas convention). `ts` must be a numeric epoch column so
    * the delta arithmetic is engine-exact. Null-key/ts rules follow
    * [[asOfJoin]].
    *
    * Physical shape: the SAME single union scan as asOfJoin — one
    * shuffle on `key`, ONE sort, and two frame aggregates over that
    * sort (running last and running first of the right-row marker) —
    * never a range join or a second exchange. Adds `out` (payload),
    * `<out>_dir` ('backward'/'forward'), `<out>_delta` (|Δts|, ≥ 0);
    * all three null when no right row is within tolerance. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String, ts: String,
      tie: String, payload: String, tol: Long,
      out: String = "nearest"): DataFrame = {
    val pType = right.schema(payload).dataType
    val tieType = right.schema(tie).dataType
    val leftCols = left.columns.map(col).toSeq
    val lt = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(pType).as("__p"), lit(null).cast(tieType).as("__tie"),
      struct(leftCols: _*).as("__row"))
    val rt = right.filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key), col(ts), lit(0).as("__side"),
        col(payload).as("__p"), col(tie).as("__tie"),
        lit(null).cast(lt.schema("__row").dataType).as("__row"))
    val ord = Seq(col(ts).asc_nulls_first, col("__side").asc,
      col("__tie").asc_nulls_first)
    val wb = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward pick as a RUNNING frame over the EXACT reversed order —
    // `first over (CURRENT ROW → UNBOUNDED FOLLOWING)` would plan as
    // Spark's UnboundedFollowingWindowFunctionFrame, which rescans the
    // partition tail per row: O(n²) on a hot key (the gapFill lesson;
    // EventOpsSpec pins the no-UnboundedFollowing shape). Reversing
    // every sort key (nulls flip sides with the direction) makes
    // last-over-running-frame value-identical, tie handling included.
    val wf = Window.partitionBy(col(key))
      .orderBy(col(ts).desc_nulls_last, col("__side").desc,
        col("__tie").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marker = when(col("__side") === 0,
      struct(col(ts).as("__rts"), col("__p")))
    val u = lt.unionByName(rt)
      .withColumn("__b", last(marker, ignoreNulls = true).over(wb))
      .withColumn("__f", last(marker, ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val db = col(ts) - col("__b.__rts")
    val df = col("__f.__rts") - col(ts)
    val bOk = col("__b").isNotNull && db <= tol
    val fOk = col("__f").isNotNull && df <= tol
    val useB = bOk && (!fOk || db <= df)
    val useF = fOk && !useB
    u.select(col("__row.*"),
      when(useB, col("__b.__p")).when(useF, col("__f.__p")).as(out),
      when(useB, lit("backward")).when(useF, lit("forward")).as(s"${out}_dir"),
      when(useB, db).when(useF, df).as(s"${out}_delta"))
  }

  /** Interval (range) join: all (left, right) pairs with equal `key`
    * and right timestamp in `(leftTs − lookback, leftTs]` — the
    * candidate-generation shape behind attribution windows and
    * feature-lookback joins. Plain equi-join on `key` with the range
    * as a join residual: one shuffle per side, no range cross-join.
    * Timestamp columns must be distinct names; the duplicate key
    * column is dropped from the right side. `leftTs`/`rightTs` and
    * `lookback` share one unit (use microseconds to stay exactly
    * equivalent to the streaming twin's INTERVAL arithmetic). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: Long): DataFrame =
    // explicit aliases + string-resolved condition: with df(col) refs a
    // shared-lineage self-join (the common shape — both sides filtered
    // from one events table) builds EqualTo(a, a) and leans on Spark's
    // warned trivially-true-predicate rewrite; alias resolution stays
    // correct after DeduplicateRelations re-aliases the right side
    left.alias("__l").join(right.alias("__r"), expr(
        s"""__l.$key = __r.$key AND
           |__r.$rightTs > __l.$leftTs - ${lookback}L AND
           |__r.$rightTs <= __l.$leftTs""".stripMargin))
      .drop(col(s"__r.$key"))

  /** Streaming twin of [[intervalJoin]]: stream-stream inner join with
    * watermarks on BOTH sides, so join state is bounded by
    * watermark + interval instead of growing forever — the property
    * that makes a stream-stream join viable at all. The time condition
    * uses TimestampType INTERVAL arithmetic; at microsecond precision
    * it is exactly the batch twin's `(leftTs − lookback, leftTs]` (the
    * equivalence StreamingSpec pins). Inner-join matches are emitted
    * as soon as both sides arrive; `delay` must cover the maximum
    * cross-stream arrival skew.
    *
    * `joinType` extends the same state machinery to the OUTER forms
    * ("left_outer"/"right_outer"/"full_outer"): a left row with no
    * match emits null-padded only once the watermark proves no
    * matching right row can still arrive — so unmatched rows near the
    * stream's head stay IN STATE until later input (or a no-data
    * micro-batch after the watermark advances) flushes them; batch
    * equivalence holds once the watermark has passed the last left
    * timestamp + interval (the st10 sentinel pattern). */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, interval: String,
      delay: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, delay).alias("__l")
    val r = right.withWatermark(rightTs, delay).alias("__r")
    // the key column survives as coalesce(left, right), alias-qualified
    // — never drop(r(key)): both sides usually derive from ONE source
    // stream, so the right's pre-join Column can share the left
    // attribute's exprId and drop(r(key)) silently removes the LEFT key
    // after DeduplicateRelations re-aliases — harmless for inner joins
    // (the keys are equal) but a left-outer's null-padded rows then
    // carry a NULL key (surfaced by the st10 gate's padded-row filter).
    // The coalesce covers the mirrored right/full-outer case the same
    // way: a null-padded unmatched RIGHT row keeps ITS key instead of
    // emitting a NULL key with the right key value dropped. For
    // inner/left_outer it reduces to the left key (a matched row's keys
    // are equal; a padded left row's right side is all-null).
    val keyOut = coalesce(col(s"__l.$key"), col(s"__r.$key")).as(key)
    val lCols = left.columns.map(c =>
      if (c == key) keyOut else col(s"__l.$c"))
    val rCols = right.columns.filterNot(_ == key).map(c => col(s"__r.$c"))
    l.join(r, expr(
        s"""__l.$key = __r.$key AND
           |__r.$rightTs > __l.$leftTs - INTERVAL $interval AND
           |__r.$rightTs <= __l.$leftTs""".stripMargin), joinType)
      .select((lCols ++ rCols).toSeq: _*)
  }

  /** Per-key rolling aggregates over a trailing time range: for every
    * row, `aggs` evaluated over the key's rows with order-value in
    * `[ord − rangeBack, ord]`. RANGE framing is value-based, so rows
    * sharing an order value see identical frames — deterministic even
    * under timestamp ties. One shuffle on `key`; the frame never
    * leaves the key's partition. */
  def rollingRange(df: DataFrame, key: String, ord: String, rangeBack: Long,
      aggs: Seq[(Column, String)]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ord))
      .rangeBetween(-rangeBack, Window.currentRow)
    aggs.foldLeft(df) { case (d, (a, name)) => d.withColumn(name, a.over(w)) }
  }

  /** Ordered multi-step funnel: per key, `t1` is the earliest step-1
    * event; `t_i` the earliest step-i event STRICTLY after `t_{i-1}` —
    * the classic earliest-completion conversion funnel (greedy-earliest
    * is optimal here: taking the earliest satisfying event at each
    * stage never prevents a completion a later choice would allow).
    * `stages_reached` counts the contiguous prefix completed; a key
    * with no step-1 event still emits (all-null, 0).
    *
    * Plan: one filtered min-aggregation per step (map-side partial, one
    * shuffle on key each) joined key-to-key — never a per-key event
    * sort or an event×event join; step i's candidate rows are
    * pre-filtered to the step's type before the join. Ties on ts
    * resolve identically in any engine (min). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    funnelWhere(events, keyCol, tsCol,
      steps.map(s => (col(typeCol) === s): Column))

  /** [[funnel]] with arbitrary per-step predicates (e.g. "a purchase
    * over $90") instead of type equality. */
  def funnelWhere(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    val keys = events.select(col(keyCol)).distinct()
    val out = steps.zipWithIndex.foldLeft(keys) { case (acc, (step, i)) =>
      val stepEvents = events.filter(step)
        .select(col(keyCol), col(tsCol).as("__ts"))
      val cand =
        if (i == 0) stepEvents
        else stepEvents.join(acc.select(col(keyCol), col(s"t$i")), Seq(keyCol))
          .filter(col("__ts") > col(s"t$i"))
      val mins = cand.groupBy(col(keyCol)).agg(min(col("__ts")).as(s"t${i + 1}"))
      acc.join(mins, Seq(keyCol), "left")
    }
    out.withColumn("stages_reached",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _))
  }

  /** Consecutive inter-event gaps per composite key: each event's
    * distance to the key's previous event in (ord, tie) order — the
    * raw material of cadence/gap analyses. First event per key emits
    * no gap. The gap MULTISET is tie-order-invariant (consecutive
    * differences of a sorted multiset don't depend on how equal
    * values are ordered), but the tie column keeps each row's lag
    * deterministic too. One shuffle; the window never spans keys. */
  def interEventGaps(events: DataFrame, keyCols: Seq[String], ordCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(tieCol))
    events
      .withColumn("gap", col(ordCol) - lag(col(ordCol), 1).over(w))
      .filter(col("gap").isNotNull)
  }

  /** Retention cohorts: keys grouped by their first-active period
    * (ts div `periodMs`), with the count and fraction still active
    * `k` periods later (k ≤ maxOffset) — the activation/retention
    * grid of product analytics. Retention is roundHalfUp at scale 4 on
    * both engine sides.
    *
    * Plan: activity dedups to (key, period) first (one
    * partial-aggregating shuffle carries at most one row per key per
    * period — never raw events), first-period and cohort sizes are two
    * more small aggs, and the grid is a (cohort, k) aggregation —
    * every shuffle is keyed and partial. */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      periodMs: Long = 86400000L, maxOffset: Int = 7): DataFrame = {
    require(periodMs > 0 && maxOffset >= 0, "positive period, non-negative offset")
    // null keys are excluded up front: groupBy would seat them in a
    // cohort but the activity equi-join drops them, silently
    // understating that cohort's retention (even at k = 0)
    val periods = events.filter(col(keyCol).isNotNull).select(col(keyCol),
      floor(col(tsCol) / periodMs).cast("long").as("period")).distinct()
    val first = periods.groupBy(col(keyCol)).agg(min(col("period")).as("cohort"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    periods.join(first, Seq(keyCol))
      .withColumn("k", col("period") - col("cohort"))
      .filter(col("k") <= maxOffset)
      // periods is distinct (key, period), so this count IS distinct keys
      .groupBy(col("cohort"), col("k")).agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("k"), col("n_active"), col("cohort_size"),
        graft.core.Exprs.roundHalfUp(
          col("n_active").cast("double") / col("cohort_size"), 4).as("retention"))
  }

  /** Gap fill + linear interpolation over per-key integer time series:
    * `df` holds observed (keyCol, tickCol, valCol) rows — tickCol an
    * integer period index, valCol an exact integer (long) value — and
    * the result completes each key to the dense tick spine over the
    * key's own [min, max] observed range, interpolating missing ticks
    * linearly between the surrounding observations. The resampling
    * step before windowed feature extraction: a gap would otherwise
    * silently shrink every downstream window.
    *
    * Plan: the spine is a two-level sequence/explode over per-key
    * min/max (linear in keys, never in raw rows; per-row array memory
    * bounded at O(√span) — see the inline note); the spine⟕observed
    * join and both
    * ignore-null windows all share the key partitioning, and each
    * window partition is one key's own series — state is bounded by a
    * single key's span at any corpus size. The interpolated value is
    * one IEEE double expression over exact integer operands (one
    * divide, one multiply, one add), bit-identical cross-engine; spine
    * edges are observed ticks by construction, so interior gaps always
    * have both neighbors — no extrapolation branch.
    *
    * Returns (keyCol, tickCol, value_filled: double, is_gap). */
  def gapFill(df: DataFrame, keyCol: String, tickCol: String,
      valCol: String): DataFrame = {
    // Spine: dense ticks over each key's own [min, max] — built in TWO
    // explode levels, not one. A single explode(sequence(mn, mx))
    // materializes a key's whole span as ONE in-memory array row
    // before exploding: a key observed at tick 0 and tick 1e9 would
    // build a multi-GB array (Spark hard-caps sequence at ~2^31
    // elements but OOMs well before). Block size b = ⌈√span⌉ bounds
    // BOTH arrays — the block list (≤ ⌈√span⌉ entries) and each
    // block's inner sequence (≤ ⌈√span⌉ ticks) — so even a 1e12-tick
    // span peaks at ~8 MB per row; output rows are identical to the
    // flat form (blocks partition [mn, mx] exactly).
    val span = col("mx") - col("mn")
    val b = greatest(lit(1L),
      ceil(sqrt((span + 1).cast("double"))).cast("long"))
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("mn"), max(col(tickCol)).as("mx"))
      .withColumn("b", b)
      .select(col(keyCol), col("mn"), col("mx"), col("b"),
        explode(sequence(lit(0L),
          floor(span / col("b")).cast("long"))).as("blk"))
      .select(col(keyCol),
        explode(sequence(col("mn") + col("blk") * col("b"),
          least(col("mx"),
            col("mn") + (col("blk") + 1L) * col("b") - 1L))).as(tickCol))
    // Both fill directions run as RUNNING frames (UNBOUNDED PRECEDING →
    // CURRENT ROW): the forward-fill over tick ASC, the BACKWARD fill
    // over tick DESC. The naive backward form — first_value over
    // (CURRENT ROW → UNBOUNDED FOLLOWING) — plans as Spark's
    // UnboundedFollowingWindowFunctionFrame, which RESCANS the
    // remainder of the partition for every row: O(span²) per key (a
    // 3e6-tick key measured ~16 min of CPU and rising before the test
    // was killed; a real long-span key would never finish). The DESC
    // running frame computes the identical values in O(span) at the
    // cost of one extra in-partition sort (same key partitioning — no
    // extra shuffle; EventOpsSpec pins the no-UnboundedFollowing shape).
    val before = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val afterDesc = Window.partitionBy(col(keyCol)).orderBy(col(tickCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val v = col(valCol)
    spine.join(df, Seq(keyCol, tickCol), "left")
      .withColumn("pv", last(v, ignoreNulls = true).over(before))
      .withColumn("pd", last(when(v.isNotNull, col(tickCol)),
        ignoreNulls = true).over(before))
      .withColumn("nv", last(v, ignoreNulls = true).over(afterDesc))
      .withColumn("nd", last(when(v.isNotNull, col(tickCol)),
        ignoreNulls = true).over(afterDesc))
      .select(col(keyCol), col(tickCol),
        when(v.isNotNull, v.cast("double"))
          .otherwise(col("pv").cast("double") +
            (col("nv") - col("pv")).cast("double") *
            ((col(tickCol) - col("pd")).cast("double") /
              (col("nd") - col("pd")).cast("double")))
          .as("value_filled"),
        v.isNull.as("is_gap"))
  }
}
