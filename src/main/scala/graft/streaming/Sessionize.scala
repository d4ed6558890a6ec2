package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-user sessionization over the events stream — the
  * custom-state streaming surface (builder mandate;
  * KeyValueGroupedDataset.flatMapGroupsWithState). Batch-testable via
  * the same case-class pipeline. */
object Sessionize {

  case class Event(user_id: Long, ts_ms: Long, event_type: String)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, closed: Boolean)

  val gapMs: Long = 30 * 60 * 1000L

  /** Pure fold used by both the streaming state function and the batch
    * twin: split a user's time-ordered events into gap-bounded
    * sessions. */
  def fold(userId: Long, sorted: Seq[Long]): Seq[Session] = {
    if (sorted.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Session]
    var start = sorted.head; var last = sorted.head; var n = 1L
    for (t <- sorted.tail) {
      if (t - last > gapMs) {
        out += Session(userId, start, last, n, closed = true)
        start = t; n = 0
      }
      last = t; n += 1
    }
    out += Session(userId, start, last, n, closed = true)
    out.result()
  }

  /** Batch twin: sessionize a static events Dataset. */
  def sessionizeBatch(events: Dataset[Event]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      fold(uid, it.map(_.ts_ms).toSeq.sorted).iterator
    }
  }

  /** Streaming flatMapGroupsWithState: sessions close when the gap
    * elapses with no new events (processing-time timeout). */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.last, s.n, closed = true))
          } else {
            val ts = it.map(_.ts_ms).toSeq.sorted
            var st = state.getOption.getOrElse(
              SessionState(ts.head, ts.head, 0))
            val closed = Seq.newBuilder[Session]
            for (t <- ts) {
              if (t - st.last > gapMs) {
                closed += Session(uid, st.start, st.last, st.n, closed = true)
                st = SessionState(t, t, 1)
              } else st = SessionState(st.start, t, st.n + 1)
            }
            state.update(st)
            state.setTimeoutDuration(gapMs)
            closed.result().iterator
          }
      }
  }

  /** Adapter from the raw events table (ts in micros after
    * Tables.events conversion). */
  def fromEvents(spark: SparkSession, eventsDf: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    import spark.implicits._
    eventsDf.select(col("user_id"),
      expr("unix_micros(ts) div 1000").as("ts_ms"),
      col("event_type")).as[Event]
  }
}
