package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of [[graft.events.EventOps.funnel]] — the ordered
  * conversion funnel as per-user incremental state
  * (mapGroupsWithState), with a batch twin over the same pure fold.
  *
  * The engine is ARITY-GENERIC: a [[FunnelStream.Funnel]] is an
  * ordered list of stage predicates (any length), and the state is one
  * optional stage time per step — O(steps) per user, no event
  * retention; the streaming query's state store is bounded by the user
  * key cardinality.
  *
  * The fold is greedy in event-time order: each event may advance only
  * the FIRST incomplete stage, and only strictly after the previous
  * stage's time. Greedy-earliest equals the batch min-aggregation
  * chain (spec-pinned against EventOps.funnel and a brute-force
  * model), and it makes the state mergeable across micro-batches: a
  * stage time never changes once set, so feeding waves in event-time
  * order (the repo's streaming-drop convention, as st02/st04) yields
  * exactly the batch answer. Ties are safe in any scan order — an
  * equal-timestamp event can never advance a later stage (strictly-
  * after) and cannot displace an earlier stage's min.
  *
  * Null contract: FEvent's primitive fields require non-null
  * user_id/ts/value rows (the typed encoder fails LOUDLY on a null —
  * no silent drop); callers must filter nulls out first (st05 does).
  * A null-keyed event has no per-user state to live in; the relational
  * [[graft.events.EventOps.funnel]] (e05) is the null-tolerant engine
  * (a null user surfaces as a stages_reached=0 row there, matching the
  * shared oracle). */
object FunnelStream {

  case class FEvent(user_id: Long, ts_ms: Long, event_type: String,
      value_cents: Long)

  /** One optional stage time per step (encoded as a nullable-element
    * array — arity lives in the data, not the type). */
  case class FunnelState(times: Seq[Option[Long]])

  /** Arity-generic result row: per-stage times (None = not reached)
    * plus the count of consecutive stages reached from stage 1. */
  case class StageTimes(user_id: Long, times: Seq[Option[Long]],
      stages_reached: Long)

  /** A funnel definition — ordered stage predicates. Everything else
    * (state shape, fold, batch and streaming engines) derives from it,
    * so a user funnel is one constructor call, not a code fork. */
  final case class Funnel(steps: IndexedSeq[FEvent => Boolean]) {
    require(steps.nonEmpty, "a funnel needs at least one stage")

    val empty: FunnelState = FunnelState(Vector.fill(steps.size)(None))

    /** Pure fold shared by the stream state function and the batch
      * twin: advance stages greedily over ts-sorted events starting
      * from `init`. */
    def fold(evs: Seq[FEvent], init: FunnelState = empty): FunnelState = {
      val st = init.times.toArray
      evs.sortBy(_.ts_ms).foreach { e =>
        val i = st.indexWhere(_.isEmpty)
        if (i >= 0 && steps(i)(e) && (i == 0 || e.ts_ms > st(i - 1).get))
          st(i) = Some(e.ts_ms)
      }
      FunnelState(st.toIndexedSeq)
    }

    def toRow(uid: Long, s: FunnelState): StageTimes =
      StageTimes(uid, s.times, s.times.takeWhile(_.isDefined).size.toLong)

    /** Batch twin — the same typed fold engine over a static Dataset
      * (the st05 gated contract; equals EventOps.funnel). */
    def funnelBatch(events: Dataset[FEvent]): Dataset[StageTimes] = {
      val spark = events.sparkSession
      import spark.implicits._
      events.groupByKey(_.user_id)
        .mapGroups((uid, it) => toRow(uid, fold(it.toSeq)))
    }

    /** Streaming state function: per trigger, fold the user's new
      * events into the saved stage times and emit the updated row
      * (Update mode — the latest row per user is the funnel so far). */
    def funnelStream(events: Dataset[FEvent]): Dataset[StageTimes] = {
      val spark = events.sparkSession
      import spark.implicits._
      events.groupByKey(_.user_id)
        .mapGroupsWithState[FunnelState, StageTimes](GroupStateTimeout.NoTimeout) {
          (uid: Long, it: Iterator[FEvent],
              state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
            val s = fold(it.toSeq, state.getOption.getOrElse(empty))
            state.update(s)
            toRow(uid, s)
        }
    }
  }

  /** The e05 demo funnel (view → $120+ click → $120+ purchase). */
  val e05: Funnel = Funnel(IndexedSeq(
    e => e.event_type == "view",
    e => e.event_type == "click" && e.value_cents >= 12000L,
    e => e.event_type == "purchase" && e.value_cents >= 12000L))

  /** A second, differently-shaped definition (2 stages: view → $200+
    * purchase) — exercised by the st05 gate and the checkpoint spec to
    * prove the engine is step-set-generic, not an e05 demo. */
  val bigPurchase: Funnel = Funnel(IndexedSeq(
    e => e.event_type == "view",
    e => e.event_type == "purchase" && e.value_cents >= 20000L))
}
