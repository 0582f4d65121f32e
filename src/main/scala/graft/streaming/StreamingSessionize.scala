package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the Structured Streaming upgrade
  * of the batch lag-window sessionizer ([[graft.operators.Sessionize]]):
  * per-user custom state via `flatMapGroupsWithState` with an EVENT-TIME
  * timeout, so a session closes exactly when the watermark passes its
  * last event + gap, regardless of batch boundaries.
  *
  * Scale story: state is O(1) per active user (one open session — start,
  * last timestamp, count, sum), keyed state is hash-partitioned by user
  * across executors, and the watermark bounds both state size and
  * out-of-order buffering. This is the shape that survives an unbounded
  * stream; the batch variant is the shape for backfills.
  */
object StreamingSessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Completed sessions (Append mode). `events` must carry a watermark on
    * `ts` before calling (the event-time timeout requires it). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          def toSession(s: OpenSession): Session =
            Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.total)

          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            // fold this batch's events (sorted: micro-batch order is
            // arbitrary) into the open session, closing on gap breaks
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  // a late event inside the watermark can predate the open
                  // session's start — fold BOTH endpoints so session_start
                  // matches the batch sessionizer's global sort
                  open = Some(OpenSession(math.min(s.startMs, t), math.max(s.lastMs, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += toSession(s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
