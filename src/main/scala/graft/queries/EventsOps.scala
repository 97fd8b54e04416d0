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
         WHERE rn = 1 ORDER BY user_id, event_type"""
  )
}
