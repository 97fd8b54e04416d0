package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY.md §2.1–§2.3: scans, predicates, projections, joins.
  *
  * The reference (vbogretsov/deltasink) implements none of these — the repo
  * is an empty stub (SURVEY.md §0, /root/reference = README.md + LICENSE +
  * .gitignore). Semantics derive from the Kafka→Delta category contract
  * (README.md:2) plus the driver's declared test surface.
  *
  * Every query ends in a total ORDER BY over a unique key and rounds any
  * double aggregate (SURVEY.md §2.0 determinism rules). Scale notes inline:
  * each operator is written so the same plan survives a 1000-executor /
  * 100 TB deployment (broadcast for dims, equi-key prefix on range joins,
  * no driver-side collects).
  */
object RelationalCore {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    // ---- §2.1 scans --------------------------------------------------
    // Column pruning: only 3 of 11 lineitem columns reach the scan
    // (verified via explain/ReadSchema in PlanSpec).
    "q_scan_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // Predicate pushdown: both conjuncts reach the Parquet reader as
    // PushedFilters (min/max row-group skipping at scale).
    "q_scan_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp")
          && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // Payload deserialization against a declared schema (the Kafka→Delta
    // deserialize stage, SURVEY.md §3.1 step 2); malformed rows null out
    // and are split off — dead-letter pattern.
    "q_read_json_lines" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .filter(col("k").isNotNull)
        .orderBy("event_id")),

    // ---- §2.2 filter / project --------------------------------------
    "q_filter_pred" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(
          (col("l_quantity").between(10, 20)
            && col("l_returnflag").isin("A", "R")
            && col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
          || (col("l_discount") > 0.09
            && col("l_linestatus") === "F"
            && col("l_returnflag").like("N%")))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_project_expr" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          Det.r2(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          Det.r2(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("charge"),
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 25, "mid")
            .otherwise("big").as("qty_bucket"),
          col("l_partkey"), col("l_suppkey"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    "q_case_when" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          when(col("l_returnflag") === "A", "returned")
            .when(col("l_returnflag") === "R", "refused")
            .otherwise("ok").as("flag_class"),
          col("l_extendedprice"))
        .groupBy("flag_class")
        .agg(count(lit(1)).as("n"),
          Det.sumMoney(col("l_extendedprice")).as("total_price"))
        .orderBy("flag_class")),

    // ---- §2.3 joins --------------------------------------------------
    "q_join_inner" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // 4-table star join; dims broadcast so the only shuffle is the
    // lineitem↔orders sort-merge (at 100 TB: the fact-fact join shuffles
    // on orderkey, dims stay broadcast).
    "q_join_multiway" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          Det.sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("n_name")
    }),

    "q_join_left" -> ((s, d) => {
      val oc = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
      val c = t(s, d, "customer")
      c.join(oc, c("c_custkey") === oc("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // Full outer with unmatched rows on BOTH sides: orders of
    // non-BUILDING customers (left-only) vs BUILDING customers without
    // orders (right-only). Null keys coalesced so ordering stays total.
    "q_join_full" -> ((s, d) => {
      val oc = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
      val cb = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name")
      oc.join(cb, oc("o_custkey") === cb("c_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("cnt"), lit(-1L)).as("n_orders"),
          coalesce(col("c_name"), lit("<none>")).as("name"))
        .orderBy("custkey")
    }),

    "q_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Pure non-equi (theta) join → BroadcastNestedLoopJoin on two tiny
    // dims; bounded by design (theta joins never run on fact tables here).
    "q_join_theta" -> ((s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      r.join(n, n("n_regionkey") < r("r_regionkey"))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")
    }),

    "q_join_cross" -> ((s, d) => {
      val r = t(s, d, "region")
      val seg = t(s, d, "customer").select(col("c_mktsegment")).distinct()
      r.crossJoin(seg)
        .select("r_regionkey", "r_name", "c_mktsegment")
        .orderBy("r_regionkey", "c_mktsegment")
    }),

    // Range join with a coarse equi-key prefix (custkey) so Catalyst
    // plans a hash/SMJ join on the key and evaluates the band predicate
    // as a join filter — never a cartesian product (SURVEY §2.3
    // q_join_range). Per-customer order fan-out is bounded, so this
    // scales linearly in customers.
    "q_join_range" -> ((s, d) => {
      val o1 = t(s, d, "orders").alias("o1")
      val o2 = t(s, d, "orders").alias("o2")
      o1.join(o2, expr(
          """o2.o_custkey = o1.o_custkey
             AND o2.o_orderkey <> o1.o_orderkey
             AND o2.o_orderdate > o1.o_orderdate
             AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY"""))
        .groupBy(col("o1.o_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_later"))
        .orderBy("o_orderkey")
    }),

    // As-of join (no native Spark operator): union-tag the two sides and
    // take last(purchase, ignoreNulls) over (user ORDER BY time) — a
    // single shuffle on user_id, linear state, no nested-loop. This is
    // the scalable pattern for 100 TB event streams (SURVEY §2.3
    // q_join_asof).
    "q_join_asof" -> ((s, d) => {
      // single scan of events (the union-of-two-filters shape reads the
      // 100 TB fact twice); kind is derived, tagging both stream roles
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
          col("event_id"), col("value"))
      val w = Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("purchase_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true)
            .over(w))
        .withColumn("purchase_value",
          last(when(col("kind") === 0, col("value")), ignoreNulls = true)
            .over(w))
        .filter(col("kind") === 1)
        .select(col("event_id").as("click_id"), col("user_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          Det.r2(coalesce(col("purchase_value"), lit(0.0)))
            .as("purchase_value"))
        .orderBy("click_id")
    }),

    // Salted skew join (SURVEY §2.3 q_join_skew): the explicit hot-key
    // mitigation — every left row gets a deterministic salt, the small
    // right side is replicated once per salt, and the join key becomes
    // (key, salt), spreading any hot key's rows across `buckets` tasks
    // instead of one straggler. Semantically identical to the plain
    // equi-join (each left row matches exactly the replica carrying its
    // salt), which is exactly what the oracle checks: the plain
    // lineitem⋈supplier SQL. At 100 TB this is the fact⋈dim shape where
    // |dim|×buckets ≪ the hot key's row mass. See operators/SkewJoin.
    "q_join_skew" -> ((s, d) =>
      graft.operators.SkewJoin
        .salted(t(s, d, "lineitem"), t(s, d, "supplier"),
          "l_suppkey", "s_suppkey", buckets = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_read_json_lines" ->
      """SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events
         WHERE CAST(props->>'k' AS INT) IS NOT NULL ORDER BY event_id""",
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
         WHERE (l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
                AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
            OR (l_discount > 0.09 AND l_linestatus = 'F' AND l_returnflag LIKE 'N%')
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
                floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue,
                floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
                CASE WHEN l_quantity < 10 THEN 'small'
                     WHEN l_quantity < 25 THEN 'mid' ELSE 'big' END AS qty_bucket,
                l_partkey, l_suppkey
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_case_when" ->
      """SELECT CASE WHEN l_returnflag = 'A' THEN 'returned'
                     WHEN l_returnflag = 'R' THEN 'refused'
                     ELSE 'ok' END AS flag_class,
                count(*) AS n,
                CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_price
         FROM lineitem GROUP BY 1 ORDER BY flag_class""",
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 300000 ORDER BY o_orderkey""",
    "q_join_multiway" ->
      """SELECT n_name, count(*) AS n_items,
                CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name ORDER BY n_name""",
    "q_join_left" ->
      """SELECT c_custkey, c_name, COALESCE(oc.cnt, 0) AS n_orders
         FROM customer LEFT JOIN
           (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) oc
           ON oc.o_custkey = c_custkey
         ORDER BY c_custkey""",
    "q_join_full" ->
      """SELECT COALESCE(cb.c_custkey, oc.o_custkey) AS custkey,
                COALESCE(oc.cnt, -1) AS n_orders,
                COALESCE(cb.c_name, '<none>') AS name
         FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) oc
         FULL JOIN (SELECT c_custkey, c_name FROM customer
                    WHERE c_mktsegment = 'BUILDING') cb
           ON oc.o_custkey = cb.c_custkey
         ORDER BY custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_theta" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
         FROM region JOIN nation ON n_regionkey < r_regionkey
         ORDER BY r_regionkey, n_nationkey""",
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, c_mktsegment
         FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
         ORDER BY r_regionkey, c_mktsegment""",
    "q_join_range" ->
      """SELECT o1.o_orderkey, count(*) AS n_later
         FROM orders o1 JOIN orders o2
           ON o2.o_custkey = o1.o_custkey
          AND o2.o_orderkey <> o1.o_orderkey
          AND o2.o_orderdate > o1.o_orderdate
          AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
         GROUP BY o1.o_orderkey ORDER BY 1""",
    "q_join_asof" ->
      """WITH u AS (
           SELECT user_id, ts, 0 AS kind, event_id, value FROM events
           WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, 1 AS kind, event_id, value FROM events
           WHERE event_type = 'click'
         ), w AS (
           SELECT *,
             last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid,
             last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pval
           FROM u)
         SELECT event_id AS click_id, user_id,
                COALESCE(pid, -1) AS purchase_id,
                floor(COALESCE(pval, 0.0) * 100 + 0.5) / 100 AS purchase_value
         FROM w WHERE kind = 1 ORDER BY click_id""",
    "q_join_skew" ->
      """SELECT l_orderkey, l_linenumber, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber"""
  )
}
