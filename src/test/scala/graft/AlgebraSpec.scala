package graft

import org.apache.spark.sql.functions._

/** Algebraic laws over the real fixture tables (SURVEY.md §5.3) — the
  * DataFrame-level invariants that must hold for any relational engine:
  * filter/join commutation, union cardinality, dedup idempotence,
  * top-k containment, set-op duality. */
class AlgebraSpec extends SparkSpecBase {

  private def orders = Tables(spark, sf, "orders")
  private def customer = Tables(spark, sf, "customer")

  test("filter pushes through join: σ(A ⋈ B) == σ(A) ⋈ B") {
    val o = orders; val c = customer
    val pred = col("o_totalprice") > 100000
    val lhs = o.join(c, o("o_custkey") === c("c_custkey")).filter(pred)
    val of = o.filter(pred)
    val rhs = of.join(c, of("o_custkey") === c("c_custkey"))
    assert(lhs.count() == rhs.count())
    assert(lhs.exceptAll(rhs).isEmpty && rhs.exceptAll(lhs).isEmpty)
  }

  test("union-all cardinality is additive; union dedups") {
    val a = orders.filter(col("o_orderkey") % 2 === 0)
    val b = orders.filter(col("o_orderkey") % 3 === 0)
    assert(a.unionByName(b).count() == a.count() + b.count())
    val dedup = a.unionByName(b).distinct().count()
    val overlap = a.intersect(b).count()
    assert(dedup == a.count() + b.count() - overlap)
  }

  test("distinct is idempotent") {
    val d1 = customer.select("c_mktsegment").distinct()
    assert(d1.count() == d1.distinct().count())
  }

  test("except/intersect partition the left side") {
    val a = orders.select("o_custkey").distinct()
    val b = customer.filter(col("c_acctbal") > 0).select(col("c_custkey").as("o_custkey"))
    assert(a.intersect(b).count() + a.except(b).count() == a.count())
  }

  test("per-group top-k rows are a subset of the group") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val topk = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(topk.exceptAll(orders).isEmpty)
    // and no group exceeds k
    val maxPerGroup = topk.groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerGroup <= 3)
  }

  test("semi ⊎ anti partition the left side of a join") {
    val c = customer; val o = orders
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
    assert(semi.count() + anti.count() == c.count())
  }

  test("exact dedup keeps one representative per normalized text") {
    val docs = Tables(spark, sf, "documents")
    val dedup = q("q_llm_exact_dedup")
    assert(dedup.count() ==
      docs.select(md5(trim(lower(col("text"))))).distinct().count())
  }
}
