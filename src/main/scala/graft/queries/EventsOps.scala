package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY.md §2.8: streaming operators, batch-equivalent declarations.
  *
  * The reference's one-line spec is a Kafka→Delta streaming daemon
  * (README.md:2); its windowing/dedup semantics are declared here over the
  * bounded `events` table — the final state of a windowed computation over
  * a bounded stream equals the batch computation, so these carry DuckDB
  * oracles. The *incremental* forms (readStream + watermark + state store)
  * live in graft.streaming and are exercised by StreamingSpec with
  * Trigger.AvailableNow.
  *
  * Emitted window boundaries are epoch SECONDS (BIGINT): raw timestamps
  * don't hash stably across engines (SURVEY §2.0). Events `ts` is
  * µs-precision in the data, so Spark's ns→µs truncation (Tables) loses
  * nothing.
  */
object EventsOps {
  import graft.QueryFn

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    // Tumbling 1h event-time window. Spark windows are epoch-aligned, so
    // window.start == date_trunc('hour', ts). Streaming form: identical
    // groupBy(window(...)) after readStream + withWatermark.
    "q_stream_tumbling" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.sumMoney(col("value")).as("val_sum"))
        .select(unix_timestamp(col("window.start")).as("bucket_s"),
          col("event_type"), col("n"), col("val_sum"))
        .orderBy("bucket_s", "event_type")),

    // Sliding 1h/15m window: each event lands in exactly 4 overlapping
    // epoch-aligned windows; the oracle reproduces the bucket explosion
    // with integer epoch arithmetic (floor-to-slide minus k·slide).
    "q_stream_sliding" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("bucket_s"),
          col("event_type"), col("n"))
        .orderBy("bucket_s", "event_type")),

    // Session windows, 30-minute gap. Spark sessions are half-open
    // [start, last+gap): an event exactly gap-later starts a NEW session —
    // the oracle's sessionization uses `diff >= gap` to match.
    "q_stream_session" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), Det.sumMoney(col("value")).as("val_sum"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("sess_start"),
          col("n"), col("val_sum"))
        .orderBy("user_id", "sess_start")),

    // Stateful exact dedup: deterministic keep-first via row_number (the
    // batch analog of dropDuplicates over a keyed stream; streaming form
    // = dropDuplicatesWithinWatermark, StreamingSpec).
    "q_stream_dedup" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event"))
        .orderBy("user_id", "event_type")
    }),

    // SCD2 history build (the CDC→dimension-table shape a Kafka→Delta
    // pipeline feeds): collapse each user's event stream to its
    // event_type CHANGE points, each valid [valid_from, valid_to) with
    // the open row's valid_to null. One shuffle on user_id; both windows
    // (the change-detect lag and the close-out lead) reuse the same
    // partitioning+sort, so Spark plans a single Window exchange.
    // Boundaries are epoch seconds (§2.0 timestamp rule).
    "q_scd2_history" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = t(s, d, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("valid_from_s"), col("event_id"))
      val w2 = Window.partitionBy("user_id").orderBy("valid_from_s", "event_id")
      changes
        .withColumn("valid_to_s", lead(col("valid_from_s"), 1).over(w2))
        .select(col("user_id"), col("event_type"),
          col("valid_from_s"), col("valid_to_s"),
          col("valid_to_s").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_s", "event_id")
    }),

    // Conversion-funnel sequence (signup → first click after it → first
    // purchase after that), per user, reported as per-stage user counts.
    // Three per-user conditional aggregations chained by time joins; every
    // join is on user_id against an already-aggregated (one row per user)
    // side, so at 100 TB this is one shuffle per stage on a high-card
    // well-distributed key — never a self-join of raw events. Stage times
    // compare at second granularity (§2.0).
    "q_funnel_seq" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"))
      def firstAfter(typ: String, prev: org.apache.spark.sql.DataFrame,
          prevCol: String, outCol: String) =
        ev.filter(col("event_type") === typ).as("e")
          .join(prev.as("p"), col("e.user_id") === col("p.user_id"))
          .filter(col("e.ts_s") > col(s"p.$prevCol"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min(col("e.ts_s")).as(outCol))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts_s")).as("t1"))
      val s2 = firstAfter("click", s1, "t1", "t2")
      val s3 = firstAfter("purchase", s2, "t2", "t3")
      val counts = Seq(("1_signup", s1), ("2_click", s2), ("3_purchase", s3))
        .map { case (n, df) => df.agg(lit(n).as("stage"),
          count(lit(1)).as("n_users")) }
      counts.reduce(_.unionByName(_)).orderBy("stage")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
                event_type, count(*) AS n,
                CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS val_sum
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_stream_sliding" ->
      """WITH x AS (
           SELECT event_type,
                  CAST(floor(epoch(ts) / 900) AS BIGINT) * 900
                    - 900 * unnest([0, 1, 2, 3]) AS bucket_s
           FROM events)
         SELECT bucket_s, event_type, count(*) AS n
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_stream_session" ->
      """WITH e AS (
           SELECT user_id, ts, value, event_id,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
           FROM events
         ), s AS (
           SELECT user_id, ts, value,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM e)
         SELECT user_id,
                CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS sess_start,
                count(*) AS n,
                CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS val_sum
         FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""",
    "q_stream_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event FROM (
           SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_scd2_history" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id,
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events
         ), c AS (
           SELECT user_id, event_type, ts_s AS valid_from_s, event_id
           FROM e WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, valid_from_s,
                lead(valid_from_s) OVER w AS valid_to_s,
                lead(valid_from_s) OVER w IS NULL AS is_current
         FROM c
         WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_s, event_id)
         ORDER BY user_id, valid_from_s, event_id""",
    "q_funnel_seq" ->
      """WITH ev AS (SELECT user_id, event_type,
                            CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
                     FROM events),
              s1 AS (SELECT user_id, min(ts_s) AS t1 FROM ev
                     WHERE event_type = 'signup' GROUP BY user_id),
              s2 AS (SELECT e.user_id, min(e.ts_s) AS t2 FROM ev e
                     JOIN s1 p ON e.user_id = p.user_id
                     WHERE e.event_type = 'click' AND e.ts_s > p.t1
                     GROUP BY e.user_id),
              s3 AS (SELECT e.user_id, min(e.ts_s) AS t3 FROM ev e
                     JOIN s2 p ON e.user_id = p.user_id
                     WHERE e.event_type = 'purchase' AND e.ts_s > p.t2
                     GROUP BY e.user_id)
         SELECT * FROM (
           SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
           UNION ALL SELECT '2_click', count(*) FROM s2
           UNION ALL SELECT '3_purchase', count(*) FROM s3)
         ORDER BY stage"""
  )
}
