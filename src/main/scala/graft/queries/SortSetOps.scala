package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.6: multi-key sort, global top-k (TakeOrderedAndProject —
  * no full sort at scale), set operations.
  *
  * Reference implements none (SURVEY.md §0). Scale notes: q_sort_multi is
  * a range-partitioned total sort (Spark samples boundaries — the correct
  * distributed sort); q_topk_limit must plan TakeOrderedAndProject, i.e.
  * per-partition heaps + driver merge of k rows, never a global sort
  * (asserted in PlanSpec).
  */
object SortSetOps {
  import graft.QueryFn

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    "q_sort_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"), to_date(col("l_shipdate")).as("ship_day"),
          col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag").asc,
          col("ship_day").desc_nulls_last,
          col("l_orderkey").asc, col("l_linenumber").asc)),

    "q_topk_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "q_set_union" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.unionByName(su).groupBy("nk").agg(count(lit(1)).as("n")).orderBy("nk")
    }),

    "q_set_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "q_set_except" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk"))
  )

  val oracles: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT l_returnflag, CAST(l_shipdate AS DATE) AS ship_day,
                l_orderkey, l_linenumber
         FROM lineitem
         ORDER BY l_returnflag ASC, ship_day DESC NULLS LAST,
                  l_orderkey ASC, l_linenumber ASC""",
    "q_topk_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q_set_union" ->
      """SELECT nk, count(*) AS n FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION ALL
           SELECT s_nationkey AS nk FROM supplier) u
         GROUP BY nk ORDER BY nk""",
    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT
         SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "q_set_except" ->
      """SELECT n_nationkey AS nk FROM nation
         EXCEPT
         SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk"""
  )
}
