package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.events.EventOps

/** Fixture semantics for the temporal event operators. */
class EventOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val leftSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts_ms", LongType)))
  private val rightSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts_ms", LongType),
    StructField("event_id", LongType), StructField("p", LongType)))

  test("asOfJoin: backward pick, equal-ts visible, tie broken by tie column, null before any") {
    val clicks = df(leftSchema, Seq(
      Row(100L, 1L, 5L),    // before any view → null
      Row(101L, 1L, 15L),   // after view@10 → 100
      Row(102L, 1L, 20L),   // equal ts to view@20 → 200 (≤ semantics)
      Row(103L, 1L, 25L),   // two views at ts 22 → higher tie (8) wins → 300
      Row(104L, 2L, 50L)))  // other user, no views → null
    val views = df(rightSchema, Seq(
      Row(1L, 10L, 5L, 100L),
      Row(1L, 20L, 6L, 200L),
      Row(1L, 22L, 7L, 250L),
      Row(1L, 22L, 8L, 300L)))
    val got = EventOps.asOfJoin(clicks, views, "user_id", "ts_ms",
        tie = "event_id", payload = "p", out = "asof")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(got === Map(100L -> null, 101L -> 100L, 102L -> 200L,
      103L -> 300L, 104L -> null))
  }

  test("asOfJoin: a matched row's NULL payload is returned, not an older non-null one") {
    val clicks = df(leftSchema, Seq(Row(100L, 1L, 30L)))
    val views = df(rightSchema, Seq(
      Row(1L, 10L, 5L, 500L),
      Row(1L, 20L, 6L, null)))   // most recent view has a null payload
    val got = EventOps.asOfJoin(clicks, views, "user_id", "ts_ms",
      tie = "event_id", payload = "p", out = "asof").collect()
    assert(got.length === 1 && got.head.isNullAt(3)) // NOT 500
  }

  test("asOfJoin: null keys never match (join semantics), null-key left rows survive with null") {
    val clicks = df(leftSchema, Seq(Row(100L, null, 30L), Row(101L, 1L, 30L)))
    val views = df(rightSchema, Seq(
      Row(null, 10L, 5L, 500L),  // null-key right row: dropped
      Row(1L, 10L, 6L, 700L)))
    val got = EventOps.asOfJoin(clicks, views, "user_id", "ts_ms",
        tie = "event_id", payload = "p", out = "asof")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(got === Map(100L -> null, 101L -> 700L))
  }

  test("asOfNearest: direction pick, backward tie preference, equal-ts backward, tolerance nulls") {
    val clicks = df(leftSchema, Seq(
      Row(100L, 1L, 12L),  // view@10 (d2 back) vs view@20 (d8 fwd) → backward 100
      Row(101L, 1L, 18L),  // view@10 (d8) vs view@20 (d2) → forward 200
      Row(102L, 1L, 15L),  // equidistant d5/d5 → backward wins → 100
      Row(103L, 1L, 20L),  // equal ts to view@20 → backward d0 → 200
      Row(104L, 1L, 40L),  // nearest view@20 d20 > tol 10 → null
      Row(105L, 2L, 5L)))  // no views for user → null
    val views = df(rightSchema, Seq(
      Row(1L, 10L, 5L, 100L),
      Row(1L, 20L, 6L, 200L)))
    val got = EventOps.asOfNearest(clicks, views, "user_id", "ts_ms",
        tie = "event_id", payload = "p", tol = 10L, out = "nv")
      .collect().map { r =>
        r.getLong(0) -> (
          if (r.isNullAt(3)) null
          else (r.getLong(3), r.getString(4), r.getLong(5)))
      }.toMap
    assert(got === Map(
      100L -> (100L, "backward", 2L),
      101L -> (200L, "forward", 2L),
      102L -> (100L, "backward", 5L),
      103L -> (200L, "backward", 0L),
      104L -> null, 105L -> null))
  }

  test("asOfNearest == brute-force nearest on random event sets (incl. ts ties)") {
    val rnd = new scala.util.Random(11)
    // small ts domain forces ties; 7 users force multi-row partitions
    val leftRows = (1L to 120L).map(i =>
      (i, (i % 7) + 1, rnd.nextInt(60).toLong))
    val rightRows = (1L to 80L).map(i =>
      ((i % 7) + 1, rnd.nextInt(60).toLong, 1000L + i, i * 10))
    val left = df(leftSchema, leftRows.map { case (e, u, t) => Row(e, u, t) })
    val right = df(rightSchema, rightRows.map { case (u, t, e, p) => Row(u, t, e, p) })
    val tol = 7L
    val got = EventOps.asOfNearest(left, right, "user_id", "ts_ms",
        tie = "event_id", payload = "p", tol = tol, out = "nv")
      .collect().map { r =>
        r.getLong(0) -> (
          if (r.isNullAt(3)) null
          else (r.getLong(3), r.getString(4), r.getLong(5)))
      }.toMap
    val byUser = rightRows.groupBy(_._1)
    val want = leftRows.map { case (eid, u, lt) =>
      val rs = byUser.getOrElse(u, Seq.empty)
      // backward: ts <= lt, winner = max (ts, event_id); forward: ts > lt,
      // winner = min (ts, event_id) — the window-order tie rule
      val back = rs.filter(_._2 <= lt).sortBy(r => (r._2, r._3)).lastOption
      val fwd = rs.filter(_._2 > lt).sortBy(r => (r._2, r._3)).headOption
      val db = back.map(lt - _._2); val dfw = fwd.map(_._2 - lt)
      val bOk = db.exists(_ <= tol); val fOk = dfw.exists(_ <= tol)
      val useB = bOk && (!fOk || db.get <= dfw.get)
      eid -> (
        if (useB) (back.get._4, "backward", db.get)
        else if (fOk) (fwd.get._4, "forward", dfw.get)
        else null)
    }.toMap
    assert(got === want)
    // both directions and the null class must be present for the
    // comparison to be non-vacuous
    val dirs = got.values.collect { case (_, d: String, _) => d }.toSet
    assert(dirs === Set("backward", "forward") && got.values.exists(_ == null))
  }

  test("rollingRange: trailing range frame, value-based (ties share a frame)") {
    val s = StructType(Seq(StructField("k", LongType),
      StructField("t", LongType), StructField("v", LongType)))
    val d = df(s, Seq(
      Row(1L, 0L, 1L), Row(1L, 500L, 2L), Row(1L, 500L, 4L), Row(1L, 2000L, 8L),
      Row(2L, 0L, 16L)))
    val got = EventOps.rollingRange(d, "k", "t", 1000L,
        Seq(count(lit(1)) -> "n", sum(col("v")) -> "sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // ties at t=500 both see {0,500,500}; t=2000 sees only itself (range 1000)
    assert(got((1L, 500L, 2L)) === (3L, 7L))
    assert(got((1L, 500L, 4L)) === (3L, 7L))
    assert(got((1L, 2000L, 8L)) === (1L, 8L))
    assert(got((2L, 0L, 16L)) === (1L, 16L))
  }

  test("funnel: strictly-after stages, out-of-order blocks, equal ts does not advance") {
    val s = StructType(Seq(StructField("u", LongType),
      StructField("t", LongType), StructField("ty", StringType)))
    val d = df(s, Seq(
      // u1 completes: view@10 click@20 purchase@30 (earlier click@5 ignored)
      Row(1L, 5L, "click"), Row(1L, 10L, "view"), Row(1L, 20L, "click"), Row(1L, 30L, "purchase"),
      // u2: click precedes its only view → stage 2 never fires
      Row(2L, 10L, "click"), Row(2L, 20L, "view"),
      // u3: click at the SAME ts as view → strictly-after excludes it
      Row(3L, 10L, "view"), Row(3L, 10L, "click"),
      // u4: no step-1 event at all → all-null row
      Row(4L, 10L, "purchase")))
    val got = EventOps.funnel(d, "u", "t", "ty", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    assert(got(1L) === ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(got(2L) === ((Some(20L), None, None, 1L)))
    assert(got(3L) === ((Some(10L), None, None, 1L)))
    assert(got(4L) === ((None, None, None, 0L)))
  }

  test("funnel == greedy brute force on random event sets") {
    val s = StructType(Seq(StructField("u", LongType),
      StructField("t", LongType), StructField("ty", StringType)))
    val types = Seq("a", "b", "c")
    val rnd = new scala.util.Random(11)
    val rows = for (_ <- 1 to 300) yield
      Row(rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(3)))
    val got = EventOps.funnel(df(s, rows), "u", "t", "ty", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    // brute force: earliest 'a'; earliest 'b' strictly after; 'c' after that
    val byUser = rows.groupBy(_.getLong(0))
    for ((u, evs) <- byUser) {
      def minAfter(ty: String, after: Option[Long]): Option[Long] = {
        val ts = evs.filter(_.getString(2) == ty).map(_.getLong(1))
          .filter(t => after.forall(t > _))
        if (ts.isEmpty) None else Some(ts.min)
      }
      val t1 = minAfter("a", None)
      val t2 = if (t1.isEmpty) None else minAfter("b", t1)
      val t3 = if (t2.isEmpty) None else minAfter("c", t2)
      assert(got(u) === ((t1, t2, t3)), s"user $u")
    }
  }

  test("interEventGaps: per-key consecutive differences, first event emits none") {
    val s = StructType(Seq(StructField("u", LongType),
      StructField("t", LongType), StructField("id", LongType)))
    val d = df(s, Seq(
      Row(1L, 10L, 1L), Row(1L, 25L, 2L), Row(1L, 25L, 3L), Row(1L, 100L, 4L),
      Row(2L, 50L, 5L)))
    val got = EventOps.interEventGaps(d, Seq("u"), "t", "id")
      .select("u", "gap").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sorted
    // u1: 15, 0 (tie), 75; u2: single event → nothing
    assert(got === Seq((1L, 0L), (1L, 15L), (1L, 75L)))
  }

  test("retentionCohorts == brute force on random activity") {
    val s = StructType(Seq(StructField("u", LongType), StructField("t", LongType)))
    val rnd = new scala.util.Random(23)
    val rows = for (_ <- 1 to 400) yield
      Row(rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    val got = EventOps.retentionCohorts(df(s, rows), "u", "t",
        periodMs = 100L, maxOffset = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val periods = rows.map(r => (r.getLong(0), r.getLong(1) / 100)).distinct
    val cohort = periods.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).min }
    val expect = periods.map { case (u, p) => (cohort(u), p - cohort(u)) }
      .filter(_._2 <= 5).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
  }

  test("retentionCohorts: first-period cohorts, multi-event days dedup, offset cap") {
    val s = StructType(Seq(StructField("u", LongType), StructField("t", LongType)))
    val d = df(s, Seq(
      Row(1L, 0L), Row(1L, 5L), Row(1L, 100L),     // u1: day0 twice + day1
      Row(2L, 10L), Row(2L, 210L),                 // u2: day0 + day2
      Row(3L, 150L), Row(3L, 999L)))               // u3: day1 cohort, day9 past cap
    val got = EventOps.retentionCohorts(d, "u", "t", periodMs = 100L, maxOffset = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got((0L, 0L)) === ((2L, 2L, 1.0)))   // u1,u2 day-0 cohort
    assert(got((0L, 1L)) === ((1L, 2L, 0.5)))   // only u1 active day 1
    assert(got((0L, 2L)) === ((1L, 2L, 0.5)))   // only u2 active day 2
    assert(got((1L, 0L)) === ((1L, 1L, 1.0)))   // u3's own cohort
    assert(!got.contains((1L, 8L)))             // day9 activity past maxOffset
  }

  test("e11 session_window boundary: exactly-gap merges (inclusive), gap+1ms splits") {
    import org.apache.spark.sql.functions._
    val s = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    val gapUs = 30L * 60 * 1000 * 1000
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms fixtures
    val events = df(s, Seq(
      Row(1L, t(0L)),
      Row(1L, t(gapUs)),                    // EXACTLY gap later → still merges
      Row(1L, t(2 * gapUs + 1000)),         // gap + 1 ms later → new session
      Row(2L, t(0L))))
    val got = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("st"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 0L, 2L),                        // first two events merged
      (1L, (2 * gapUs + 1000) / 1000, 1L), // the over-gap event alone
      (2L, 0L, 1L)))
  }

  test("gapFill: dense spine per key, linear interpolation, edges observed") {
    val s = StructType(Seq(StructField("k", LongType),
      StructField("tick", LongType), StructField("v", LongType)))
    // span 4 keeps every fraction a power of two — the doubles are
    // EXACT, so the equality assertions can't straddle a rounding ulp
    val obs = df(s, Seq(
      Row(1L, 10L, 100L),   // three-gap run to 14: interpolate 200..400
      Row(1L, 14L, 500L),
      Row(1L, 15L, 600L),   // adjacent — no gap
      Row(2L, 7L, 50L)))    // single-point series: spine is one row
    val got = EventOps.gapFill(obs, "k", "tick", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, 10L, 100.0, false),
      (1L, 11L, 200.0, true),   // 100 + 400 * (1/4)
      (1L, 12L, 300.0, true),   // 100 + 400 * (2/4)
      (1L, 13L, 400.0, true),   // 100 + 400 * (3/4)
      (1L, 14L, 500.0, false),
      (1L, 15L, 600.0, false),
      (2L, 7L, 50.0, false)))
    // spine never extends past a key's own observed range
    assert(EventOps.gapFill(obs, "k", "tick", "v")
      .filter(col("k") === 2L).count() === 1L)
  }

  test("gapFill: pathological span stays bounded — two-level spine, no whole-span array row") {
    val s = StructType(Seq(StructField("k", LongType),
      StructField("tick", LongType), StructField("v", LongType)))
    // one key observed at tick 0 and tick 3e6: a flat
    // explode(sequence(mn, mx)) would build the whole 3,000,001-tick
    // span as ONE array row (~24 MB here, multi-GB for a 1e9 span)
    // before exploding; the chunked spine bounds per-row arrays at
    // ⌈√span⌉ ≈ 1733 elements and must emit the identical rows
    val span = 3000000L
    val obs = df(s, Seq(Row(1L, 0L, 0L), Row(1L, span, 6000000L)))
    val filled = EventOps.gapFill(obs, "k", "tick", "v")
    // structural: the spine is TWO nested Generates (block explode ×
    // bounded inner sequence), not one whole-span Generate (logical
    // plan — the AQE wrapper hides physical children until execution)
    val gens = filled.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.size === 2, s"expected 2 spine Generates, got:\n${gens.mkString("\n")}")
    // structural: no window frame may reach to UNBOUNDED FOLLOWING —
    // Spark's UnboundedFollowingWindowFunctionFrame rescans the rest of
    // the partition per row, O(span²) per key (this very fixture ran
    // ~16 min of CPU and climbing before the backward fill was flipped
    // to a DESC running frame)
    val badFrames = filled.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.windowExpressions.mkString.toLowerCase.contains("unboundedfollowing") => w }
    assert(badFrames.isEmpty,
      s"O(n^2) UnboundedFollowing window frame:\n${badFrames.mkString("\n")}")
    assert(filled.count() === span + 1)
    // interpolation is exact at v = 2*tick (integer-representable doubles)
    val probe = filled.filter(col("tick").isin(0L, 1L, 1500000L, 2999999L, span))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(probe === Set((0L, 0.0, false), (1L, 2.0, true),
      (1500000L, 3000000.0, true), (2999999L, 5999998.0, true),
      (span, 6000000.0, false)))
  }
}
