package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.4: aggregation surface — hash agg, distinct, approximate
  * (HLL), rollup/cube/grouping sets, HAVING, array agg.
  *
  * Reference implements none (empty stub, SURVEY.md §0); shapes are the
  * category + driver contract. All grouped aggregations rely on Spark's
  * two-phase HashAggregate (map-side partial + final after shuffle) — the
  * plan that scales to 100 TB without code changes. Subtotal rows from
  * rollup/cube are COALESCEd to 'ALL' so the output carries no NULL sort
  * keys (engine NULL-ordering defaults differ; SURVEY §2.0).
  */
object Aggregates {
  import graft.QueryFn

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    // TPC-H Q1 shape: the canonical partial-agg benchmark. 6 aggregates +
    // count(distinct) over 2 group keys.
    "q_agg_hash" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.r2(sum(col("l_quantity"))).as("sum_qty"),
          Det.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          Det.sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Det.sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          Det.r2(avg(col("l_quantity"))).as("avg_qty"),
          Det.avgMoney(col("l_extendedprice")).as("avg_price"),
          Det.avgMoney(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, d) =>
      t(s, d, "customer").select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")),

    // HLL++ sketch — the 100 TB answer to count(distinct). Approximate ⇒
    // no hash-oracle; accuracy asserted in AggregateSpec against exact.
    "q_agg_approx_hll" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // ROLLUP/CUBE/GROUPING SETS all go through the SQL entry point
    // (SURVEY §3.3): the Dataset rollup/cube API trips Spark's
    // ambiguous-self-join detector on post-agg grouping-column refs, and
    // the SQL text stays trivially diffable against its oracle twin.
    // The physical plan (Expand + two-phase HashAggregate) is identical.
    // ROLLUP/CUBE/GROUPING SETS all pre-aggregate to the finest grouping
    // first: Expand multiplies its INPUT by the number of grouping sets,
    // and Catalyst expands the raw join output — at 100 TB that is 3-4x
    // the fact table pushed through the expand. Aggregating to the
    // (dim1, dim2) grain first (tiny) and re-aggregating the partials
    // under the grouping sets is algebraically identical (counts sum,
    // integer cents sum) and shrinks the expanded relation from |fact|xN
    // to |distinct groups|xN.
    "q_agg_rollup" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """WITH pre AS (
             SELECT n_name, c_mktsegment, count(*) AS n,
                    SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS cents
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name, c_mktsegment)
           SELECT COALESCE(n_name, 'ALL') AS nation,
                  COALESCE(c_mktsegment, 'ALL') AS segment,
                  sum(n) AS n_cust,
                  CAST(SUM(cents) AS DOUBLE) / 100 AS acctbal
           FROM pre
           GROUP BY ROLLUP (n_name, c_mktsegment)
           ORDER BY nation, segment""")
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """WITH pre AS (
             SELECT c_mktsegment, o_orderpriority, count(*) AS n,
                    SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_mktsegment, o_orderpriority)
           SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
                  COALESCE(o_orderpriority, 'ALL') AS priority,
                  sum(n) AS n_orders,
                  CAST(SUM(cents) AS DOUBLE) / 100 AS total
           FROM pre
           GROUP BY CUBE (c_mktsegment, o_orderpriority)
           ORDER BY segment, priority""")
    }),

    // GROUPING SETS has no DataFrame API — SQL entry point (SURVEY §3.3).
    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql(
        """WITH pre AS (
             SELECT n_name, c_mktsegment, count(*) AS n,
                    SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS cents
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name, c_mktsegment)
           SELECT COALESCE(n_name, 'ALL') AS nation,
                  COALESCE(c_mktsegment, 'ALL') AS segment,
                  sum(n) AS n,
                  CAST(SUM(cents) AS DOUBLE) / 100 AS acctbal
           FROM pre
           GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
           ORDER BY nation, segment""")
    }),

    // HAVING = post-aggregation filter; threshold applied to the rounded
    // sum so both engines filter the identical value.
    "q_agg_having" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(Det.r2(sum(col("l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n"))
        .filter(col("sum_qty") > 800.0)
        .orderBy("l_partkey")),

    // Array agg with a total in-group order; emitted as a joined string so
    // the oracle hash sees a scalar (cross-engine list typing is fragile).
    "q_agg_collect" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
            .as("segments"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")),

    // Filtered aggregates (FILTER clause): per-group conditional counts
    // and sums in one pass — no self-joins, no CASE pyramids in user
    // code, still a single HashAggregate.
    "q_agg_filtered" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_all"),
          count_if(col("o_totalprice") > 200000).as("n_big"),
          sum(when(col("o_orderstatus") === "F",
            Det.cents(col("o_totalprice"), 2)).otherwise(lit(0L)))
            .as("f_cents"),
          max(when(col("o_orderstatus") === "O", col("o_orderkey")))
            .as("max_open_key"))
        .orderBy("o_orderpriority"))
  )

  val oracles: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
                floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
                CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
                CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_disc_price,
                CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_charge,
                floor(avg(l_quantity) * 100 + 0.5) / 100 AS avg_qty,
                floor(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 / count(l_extendedprice) * 100 + 0.5) / 100 AS avg_price,
                floor(CAST(SUM(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 / count(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
                count(*) AS count_order,
                count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q_agg_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
                COALESCE(c_mktsegment, 'ALL') AS segment,
                count(*) AS n_cust, CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)
         ORDER BY nation, segment""",
    "q_agg_cube" ->
      """SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
                COALESCE(o_orderpriority, 'ALL') AS priority,
                count(*) AS n_orders, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY CUBE (c_mktsegment, o_orderpriority)
         ORDER BY segment, priority""",
    "q_agg_grouping_sets" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
                COALESCE(c_mktsegment, 'ALL') AS segment,
                count(*) AS n, CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
         ORDER BY nation, segment""",
    "q_agg_having" ->
      """SELECT l_partkey,
                floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY l_partkey
         HAVING floor(sum(l_quantity) * 100 + 0.5) / 100 > 800.0
         ORDER BY l_partkey""",
    "q_agg_collect" ->
      """SELECT c_nationkey,
                string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
                count(*) AS n
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_agg_filtered" ->
      """SELECT o_orderpriority,
                count(*) AS n_all,
                count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                CAST(sum(CASE WHEN o_orderstatus = 'F'
                              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS f_cents,
                max(CASE WHEN o_orderstatus = 'O' THEN o_orderkey END) AS max_open_key
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )
}
