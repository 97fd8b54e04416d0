package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful streaming (SURVEY.md §2.8 stateful_custom):
  * per-user sessionization with explicit state + event-time timeout via
  * flatMapGroupsWithState — the public-API form of a custom state-store
  * operator. State is per-key and partition-local, so it scales with the
  * shuffle parallelism, exactly like Spark's built-in session windows.
  */
object StatefulOps {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, value_sum: Double)

  val GapMs: Long = 30L * 60 * 1000 // 30 min

  case class UserAgg(n: Long, sum: Double)
  case class UserTotal(user_id: Long, n_events: Long, value_sum: Double)

  /** transformWithState (Spark 4 arbitrary-state v2) processor: running
    * per-user event count + value sum held in a typed ValueState. The
    * v2 API adds composable typed state (value/list/map), TTL, and
    * timers over the RocksDB store — this is the upgrade path from
    * flatMapGroupsWithState for long-lived keyed state at scale. */
  class RunningUserAgg extends StatefulProcessor[Long, Ev, UserTotal] {
    @transient private var totals: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserAgg](
        "totals", Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[UserTotal] = {
      var agg = if (totals.exists()) totals.get() else UserAgg(0L, 0.0)
      rows.foreach(e => agg = UserAgg(agg.n + 1, agg.sum + e.value))
      totals.update(agg)
      Iterator.single(UserTotal(user, agg.n, agg.sum))
    }
  }

  /** Running totals per user via transformWithState; requires the
    * RocksDB state-store provider (set in the writeStream conf). */
  def runningTotals(events: Dataset[Ev]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningUserAgg,
        TimeMode.None(), OutputMode.Update())
  }

  /** Emits a session when the per-user gap reaches GapMs (and the
    * still-open session on event-time timeout once the watermark passes
    * last+gap). Callers must set withWatermark on `ts` upstream in
    * streaming mode. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startMs, s.lastMs, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs < GapMs =>
                  cur = Some(s.copy(lastMs = t, n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  out += SessionOut(user, s.startMs, s.lastMs, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + GapMs)
            }
            out.result().iterator
          }
      }
  }
}
