package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY.md §2.5: window functions — ranking family, top-k per group,
  * analytic (lag/lead/first/last), ROWS and RANGE frames.
  *
  * Reference implements none (SURVEY.md §0). Determinism: every window
  * ORDER BY includes a unique tiebreaker key; running doubles are rounded;
  * the RANGE-frame sum uses floor()→BIGINT so frame aggregation is exact
  * integer math (frame-tree summation order differs across engines).
  * Scale: windows shuffle once on their partition key; partition
  * cardinality (custkey, user_id) grows with data so no single-partition
  * hot spot.
  */
object WindowOps {
  import graft.QueryFn

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    "q_win_rank" -> ((s, d) => {
      // wTotal is a total order (unique o_orderkey tiebreak) for
      // row_number/ntile; wTies ranks with real ties for rank/dense_rank.
      val wTotal = Window.partitionBy("o_orderpriority")
        .orderBy("o_custkey", "o_orderkey")
      val wTies = Window.partitionBy("o_orderpriority").orderBy("o_custkey")
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_custkey"), col("o_orderkey"),
          row_number().over(wTotal).as("rn"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          ntile(4).over(wTotal).as("quartile"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    "q_win_topk_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    "q_win_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          Det.r2(col("value")).as("v"),
          Det.r2(coalesce(lag(col("value"), 1).over(w), lit(-1.0)))
            .as("prev_v"),
          coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_id"),
          Det.r2(coalesce(col("value") - lag(col("value"), 1).over(w),
            lit(0.0))).as("delta"),
          first(col("event_id")).over(wAll).as("first_id"))
        .orderBy("user_id", "event_id")
    }),

    // Running sum, ROWS frame: sequential accumulation in deterministic
    // (orderdate, orderkey) order on both engines, then rounded.
    "q_win_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(Det.cents(col("o_totalprice"), 2)).over(w).cast("double")
            / lit(100.0)).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Time-interval RANGE frame: trailing 1-hour sum per user. Only the
    // SQL surface accepts interval frame bounds. ts is truncated to
    // seconds on BOTH sides first (SURVEY §2.0: events.ts is ns parquet;
    // truncation is monotone so µs- and ns-sourced floors agree), and
    // the summed doubles go through exact integer cents.
    "q_win_frame_interval" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """SELECT user_id, event_id,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                    PARTITION BY user_id
                    ORDER BY date_trunc('second', ts)
                    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW
                  ) AS DOUBLE) / 100 AS hour_sum
           FROM events
           ORDER BY user_id, event_id""")
    }),

    // Sliding RANGE frame on a numeric sort key; exact BIGINT sum inside
    // the frame (floor first: DuckDB CAST rounds, Spark truncates).
    "q_win_frame_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rangeBetween(-1000L, 0L)
      t(s, d, "orders")
        .withColumn("price_i", floor(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("price_i")).over(w).as("frame_sum"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_orderpriority, o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_custkey, o_orderkey) AS rn,
                rank() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_custkey) AS rnk,
                dense_rank() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_custkey) AS drnk,
                ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_custkey, o_orderkey) AS quartile
         FROM orders ORDER BY o_orderpriority, o_orderkey""",
    "q_win_topk_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_win_analytic" ->
      """SELECT user_id, event_id, floor(value * 100 + 0.5) / 100 AS v,
                floor(COALESCE(lag(value, 1) OVER w, -1.0) * 100 + 0.5) / 100 AS prev_v,
                COALESCE(lead(event_id, 1) OVER w, -1) AS next_id,
                floor(COALESCE(value - lag(value, 1) OVER w, 0.0) * 100 + 0.5) / 100 AS delta,
                first_value(event_id) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_id
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "q_win_frame_rows" ->
      """SELECT o_custkey, o_orderkey,
                CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
                  AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_win_frame_interval" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                  PARTITION BY user_id
                  ORDER BY date_trunc('second', ts)
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
                ) AS DOUBLE) / 100 AS hour_sum
         FROM events
         ORDER BY user_id, event_id""",
    "q_win_frame_range" ->
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderkey
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS frame_sum
         FROM orders ORDER BY o_custkey, o_orderkey"""
  )
}
