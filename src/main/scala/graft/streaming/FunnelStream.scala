package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of [[graft.events.EventOps.funnel]] — the ordered
  * conversion funnel as per-user incremental state
  * (mapGroupsWithState), with a batch twin over the same pure fold.
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
  * State is THREE optional longs per user — O(1), no event retention;
  * the streaming query's state store is bounded by the user key
  * cardinality.
  *
  * Null contract: FEvent's primitive fields require non-null
  * user_id/ts/value rows (the typed encoder fails LOUDLY on a null —
  * no silent drop). A null-keyed event has no per-user state to live
  * in; the relational [[graft.events.EventOps.funnel]] (e05) is the
  * null-tolerant engine (a null user surfaces as a stages_reached=0
  * row there, matching the shared oracle). */
object FunnelStream {

  case class FEvent(user_id: Long, ts_ms: Long, event_type: String,
      value_cents: Long)
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FunnelRow(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long], stages_reached: Long)

  val empty: FunnelState = FunnelState(None, None, None)

  /** The e05 stage predicates (view → $120+ click → $120+ purchase).
    * A val — the fold consults it once per event. */
  val steps: IndexedSeq[FEvent => Boolean] = IndexedSeq(
    e => e.event_type == "view",
    e => e.event_type == "click" && e.value_cents >= 12000L,
    e => e.event_type == "purchase" && e.value_cents >= 12000L)

  /** Pure fold shared by the stream state function and the batch twin:
    * advance stages greedily over ts-sorted events starting from
    * `init`. */
  def fold(evs: Seq[FEvent], init: FunnelState = empty): FunnelState = {
    val st = Array(init.t1, init.t2, init.t3)
    evs.sortBy(_.ts_ms).foreach { e =>
      val i = st.indexWhere(_.isEmpty)
      if (i >= 0 && steps(i)(e) && (i == 0 || e.ts_ms > st(i - 1).get))
        st(i) = Some(e.ts_ms)
    }
    FunnelState(st(0), st(1), st(2))
  }

  def toRow(uid: Long, s: FunnelState): FunnelRow =
    FunnelRow(uid, s.t1, s.t2, s.t3,
      Seq(s.t1, s.t2, s.t3).takeWhile(_.isDefined).size.toLong)

  /** Batch twin — the same typed fold engine over a static Dataset
    * (the st05 gated contract; equals EventOps.funnel). */
  def funnelBatch(events: Dataset[FEvent]): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroups((uid, it) => toRow(uid, fold(it.toSeq)))
  }

  /** Streaming state function: per trigger, fold the user's new events
    * into the saved stage times and emit the updated row (Update
    * mode — the latest row per user is the funnel so far). */
  def funnelStream(events: Dataset[FEvent]): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FEvent], state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
          val s = fold(it.toSeq, state.getOption.getOrElse(empty))
          state.update(s)
          toRow(uid, s)
      }
  }
}
