package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsOps

/** Semantic unit tests for the round-5 operators (SURVEY §2.8-§2.10
  * additions). The DuckDB oracle checks cross-engine parity; these pin
  * the SEMANTICS on data where the expected answer is computed by hand. */
class AnalyticsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("line dedup removes exactly the corpus-duplicated 5-token chunks") {
    val ld = AnalyticsOps.queries("q_llm_line_dedup")(spark, sf)
      .select("doc_id", "total_chunks", "kept_chunks")
      .as[(Long, Long, Long)].collect()
    assert(ld.nonEmpty)
    // kept <= total everywhere, and the corpus (which carries near-dup
    // docs by construction) must actually lose some chunks
    assert(ld.forall { case (_, t, k) => k <= t && t > 0 })
    assert(ld.map(r => r._2 - r._3).sum > 0, "no duplicated chunks found")
    // cross-check one doc against a literal recomputation
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val chunks = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(5).zipWithIndex
        .map { case (c, i) => (id, i, c.mkString(" ")) }
    }
    val counts = chunks.groupBy(_._3).view.mapValues(_.size).toMap
    val expect = chunks.groupBy(_._1).view.mapValues { cs =>
      (cs.size.toLong, cs.count(c => counts(c._3) == 1).toLong)
    }.toMap
    ld.foreach { case (id, t, k) =>
      assert((t, k) == expect(id), s"doc $id: got ($t,$k) want ${expect(id)}")
    }
  }

  test("pii mask redacts every email and digit run; counts match") {
    val r = AnalyticsOps.queries("q_llm_pii_mask")(spark, sf)
    val rows = r.select("n_emails", "n_nums", "masked")
      .as[(Int, Int, String)].collect()
    assert(rows.nonEmpty)
    // the synthesized email is always present; props always has digits
    assert(rows.forall(_._1 >= 1))
    assert(rows.forall(_._2 >= 1))
    // nothing maskable survives in the output
    assert(rows.forall { case (_, _, m) =>
      !m.exists(_.isDigit) && !m.contains("@example.com")
    })
    assert(rows.forall(_._3.contains("<EMAIL>")))
    assert(rows.forall(_._3.contains("<NUM>")))
  }

  test("retention cohort: offsets start at 0 and day-0 covers every user once") {
    val rc = AnalyticsOps.queries("q_retention_cohort")(spark, sf)
      .select("offset_d", "n_users").as[(Int, Long)].collect()
    assert(rc.forall(_._1 >= 0))
    val nUsers = Tables(spark, sf, "events")
      .select(countDistinct(col("user_id"))).as[Long].head()
    // every user is active on their own cohort day exactly once
    assert(rc.filter(_._1 == 0).map(_._2).sum == nUsers)
  }

  test("mode picks the most frequent type with lexicographic tie-break") {
    val m = AnalyticsOps.queries("q_agg_mode")(spark, sf)
      .select("user_id", "mode_type", "n_events")
      .as[(Long, String, Long)].collect()
    val byUser = Tables(spark, sf, "events")
      .groupBy("user_id", "event_type").count()
      .as[(Long, String, Long)].collect()
      .groupBy(_._1)
    assert(m.length == byUser.size) // one row per user
    m.foreach { case (u, typ, n) =>
      val groups = byUser(u).map(g => (g._2, g._3))
      val maxN = groups.map(_._2).max
      assert(n == maxN, s"user $u: count $n != max $maxN")
      assert(typ == groups.filter(_._2 == maxN).map(_._1).min,
        s"user $u: tie-break picked $typ")
    }
  }

  test("stratified sample returns exactly 5 docs per source, hash-deterministic") {
    val s1 = AnalyticsOps.queries("q_llm_strat_sample")(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val perSource = s1.groupBy(_._2).view.mapValues(_.size)
    val nSources = Tables(spark, sf, "documents")
      .select(countDistinct(col("source"))).as[Long].head()
    assert(perSource.size == nSources)
    assert(perSource.values.forall(_ == 5), s"uneven strata: $perSource")
    // deterministic: a rerun picks the identical set
    val s2 = AnalyticsOps.queries("q_llm_strat_sample")(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(s1 == s2)
  }

  test("gap fill produces a dense per-user hourly grid preserving totals") {
    val gf = AnalyticsOps.queries("q_gapfill_hourly")(spark, sf)
      .select("user_id", "hour_s", "n").as[(Long, Long, Long)].collect()
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"))
      .as[(Long, Long)].collect()
    val users = ev.map(_._1).distinct
    val hours = ev.map(t => t._2 / 3600 * 3600)
    val span = ((hours.max - hours.min) / 3600 + 1)
    // dense: every user covers the full corpus hour span exactly once
    assert(gf.length == users.length * span)
    assert(gf.groupBy(_._1).values.forall(_.length == span))
    // zeros are explicit, and the filled counts still sum to the events
    assert(gf.exists(_._3 == 0))
    assert(gf.map(_._3).sum == ev.length)
  }

  test("rfm quartiles are balanced, in range, and compose the segment code") {
    val rows = AnalyticsOps.queries("q_events_rfm")(spark, sf)
      .select("user_id", "r_q", "f_q", "m_q", "rfm")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, r, f, m, c) =>
      Seq(r, f, m).forall(q => q >= 1 && q <= 4) && c == r * 100 + f * 10 + m
    })
    // ntile(4) balance: quartile sizes differ by at most one
    Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4)).foreach { qs =>
      val sizes = qs.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"unbalanced quartiles: $sizes")
    }
  }

  test("pmi top-20 is support-filtered and scores known collocations positive") {
    val rows = AnalyticsOps.queries("q_llm_pmi_bigrams")(spark, sf)
      .select("bigram", "c_ab", "pmi").as[(String, Long, Double)].collect()
    assert(rows.length == 20)
    assert(rows.forall(_._2 >= 5))
    // top-ranked collocations must beat independence (pmi > 0)
    assert(rows.head._3 > 0, s"top pmi not positive: ${rows.head}")
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.reverse)
  }

  test("profile reports exact per-column stats in one pass") {
    val p = AnalyticsOps.queries("q_agg_profile")(spark, sf)
      .select("column_name", "n_rows", "n_nulls", "n_distinct")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val o = Tables(spark, sf, "orders")
    assert(p.keySet == Set("o_orderstatus", "o_totalprice", "o_orderdate"))
    assert(p.values.forall(_._2 == o.count()))
    assert(p("o_orderstatus")._4 ==
      o.select("o_orderstatus").distinct().count())
    assert(p.values.forall(_._3 == 0)) // fixture has no nulls
  }

  test("attribution conserves purchases and credits only non-purchase channels") {
    val at = AnalyticsOps.queries("q_events_attribution")(spark, sf)
      .select("channel", "n_purchases").as[(String, Long)].collect()
    val purchases = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(at.map(_._2).sum == purchases, "purchases lost or double-credited")
    assert(!at.map(_._1).contains("purchase"), "a purchase credited itself")
  }

  test("hard negatives never share the query's label and rank by similarity") {
    val hn = graft.queries.VectorOps.queries("q_llm_hard_negatives")(spark, sf)
      .select("qid", "rk", "nbr_label", "sim")
      .as[(Long, Int, String, Double)].collect()
    val qLabels = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("label")).as[(Long, String)].collect().toMap
    assert(hn.nonEmpty)
    assert(hn.forall { case (q, _, nl, _) => nl != qLabels(q) })
    hn.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("anomaly flags exactly the events above 3x the user's exact-cents mean") {
    val flagged = AnalyticsOps.queries("q_events_anomaly")(spark, sf)
      .select("event_id").as[Long].collect().toSet
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .as[(Long, Long, Double)].collect()
    val cents = ev.map { case (e, u, v) => (e, u, math.floor(v * 100 + 0.5).toLong) }
    val stats = cents.groupBy(_._2).view
      .mapValues(xs => (xs.map(_._3).sum, xs.size.toLong)).toMap
    val expect = cents.collect {
      case (e, u, c) if c * stats(u)._2 > 3 * stats(u)._1 => e
    }.toSet
    assert(flagged == expect)
    assert(flagged.nonEmpty, "no anomalies in the fixture data")
  }

  test("cooccur: top-40 window-2 pairs match a flat recount, exact ties") {
    val texts = Tables(spark, sf, "documents")
      .select(col("text")).as[String].collect()
    val pairs = texts.flatMap { tx =>
      val t = tx.split(" ")
      def at(k: Int) = (0 until t.length - k).map { i =>
        val (a, b) = (t(i), t(i + k))
        (if (a <= b) a else b, if (a <= b) b else a, k)
      }
      at(1) ++ at(2)
    }
    val expTop = pairs.groupBy(p => (p._1, p._2)).toSeq.map {
      case ((w1, w2), xs) => (w1, w2, xs.length.toLong,
        xs.count(_._3 == 1).toLong, xs.count(_._3 == 2).toLong)
    }.sortBy { case (w1, w2, n, _, _) => (-n, w1, w2) }.take(40)
    val rows = q("q_llm_cooccur")
      .select("w1", "w2", "n_pairs", "n_adj", "n_skip")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows == expTop)
    rows.foreach { case (w1, w2, n, a, sk) =>
      assert(n == a + sk, s"($w1,$w2) distance split")
      assert(w1 <= w2, "pairs are canonically ordered")
    }
  }
}
