package graft

import org.apache.spark.sql.functions._

/** Semantic unit tests for the round-9 mining/curation operators. The
  * DuckDB oracle checks cross-engine parity; these pin the SEMANTICS
  * against literal driver-side recomputations on the sf0.001 fixture. */
class MiningOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("corr: matches a driver-side exact-moment Pearson replay") {
    val got = q("q_agg_corr")
      .select("pair", "n", "corr", "covar")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("price_disc", "qty_disc", "qty_price"))
    val rows = Tables(spark, sf, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount")
      .as[(Double, Double, Double)].collect()
      .map { case (a, b, c) =>
        (math.floor(a * 100 + 0.5).toLong,
         math.floor(b * 100 + 0.5).toLong,
         math.floor(c * 100 + 0.5).toLong)
      }
    def replay(x: Seq[Long], y: Seq[Long]): (Double, Double) = {
      val n = x.length.toDouble
      val sx = x.map(BigInt(_)).sum.toDouble
      val sy = y.map(BigInt(_)).sum.toDouble
      val sxx = x.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val syy = y.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val sxy = x.zip(y).map { case (a, b) => BigInt(a) * BigInt(b) }.sum.toDouble
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      // cents² moments → raw-unit covariance is one ÷10^4
      val cov = (sxy - sx * sy / n) / (n - 1.0) / 10000.0
      (math.floor(corr * 10000 + 0.5) / 10000,
       math.floor(cov * 10000 + 0.5) / 10000)
    }
    val qs = rows.map(_._1).toSeq; val ps = rows.map(_._2).toSeq
    val ds = rows.map(_._3).toSeq
    val want = Map(
      "price_disc" -> replay(ps, ds),
      "qty_disc" -> replay(qs, ds),
      "qty_price" -> replay(qs, ps))
    want.foreach { case (k, (c, v)) =>
      val (_, n, gc, gv) = got(k)
      assert(n == rows.length.toLong)
      assert(gc == c, s"$k corr: got $gc want $c")
      assert(gv == v, s"$k covar: got $gv want $v")
      assert(gc >= -1.0 && gc <= 1.0)
    }
  }

  test("ngram novelty: matches an exact-string driver replay (no hash)") {
    val got = q("q_llm_ngram_novelty")
      .select("doc_id", "n_grams", "n_novel")
      .as[(Long, Long, Long)].collect().toSet
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val grams = docs.flatMap { case (id, txt) =>
      val t = txt.split(" ", -1)
      if (t.length < 3) Seq.empty
      else t.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(g => (id, g))
    }
    val first = grams.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1).min }
    val want = grams.groupBy(_._1).map { case (id, xs) =>
      (id, xs.length.toLong, xs.count(x => first(x._2) == id).toLong)
    }.toSet
    assert(got == want)
  }

  test("simhash dup pairs: complete and sound vs brute force over sigs") {
    val sigs = q("q_llm_simhash")
      .as[(Long, Long)].collect()
    val want = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs
      if d1 < d2 && java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2, java.lang.Long.bitCount(s1 ^ s2))).toSet
    val got = q("q_llm_simhash_dup")
      .as[(Long, Long, Int)].collect().toSet
    // pigeonhole: <=3 flipped bits over 4 disjoint 8-bit bands leave one
    // band intact, so banding loses nothing — exact equality must hold
    assert(got == want)
  }

  test("keyword topk: 3 ranked keywords per doc, terms from the doc") {
    val got = q("q_llm_keyword_topk")
      .select("doc_id", "rn", "term", "tfidf")
      .as[(Long, Int, String, Double)].collect()
    val byDoc = got.groupBy(_._1)
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(byDoc.size == docs.size)
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.length <= 3)
      // scores non-increasing with rank; term must occur in the doc
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true
      })
      val vocab = docs(id).split(" ", -1).toSet
      assert(sorted.forall(r => vocab.contains(r._3)))
    }
  }

  test("burst: matches a driver-side replay of the integer rate rule") {
    val got = q("q_events_burst")
      .select("user_id", "minute", "n", "trail")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"))
      .as[(Long, Long)].collect()
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val counts = xs.groupBy(x => math.floorDiv(x._2, 60L))
        .map { case (m, g) => m -> g.length.toLong }
      counts.toSeq.map { case (m, n) =>
        val trail = counts.filter { case (m2, _) => m2 >= m - 10 && m2 <= m - 1 }
          .values.sum
        (u, m, n, trail)
      }.filter { case (_, _, n, trail) => n >= 3 && n * 5 > trail }
    }.toSet
    assert(got == want)
  }

  test("dedup funnel: coarser keys never split groups") {
    val rows = q("q_llm_dedup_funnel")
      .select("stage_ord", "stage", "n_docs", "keep_ratio")
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((1, "all"), (2, "exact"), (3, "prefix64"), (4, "bag_of_words")))
    val total = rows(0)._3
    assert(total == 500)
    // exact dedup can only merge docs; prefix64 and BOW are coarser than
    // exact (equal text => equal prefix and equal BOW), so both <= exact
    assert(rows(1)._3 <= total)
    assert(rows(2)._3 <= rows(1)._3)
    assert(rows(3)._3 <= rows(1)._3)
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    assert(rows(0)._4 == 1.0)
  }

  test("prefix dedup groups: consistent with the funnel's prefix count") {
    val groups = q("q_llm_prefix_dedup")
      .select("canonical", "n").as[(Long, Long)].collect()
    assert(groups.forall(_._2 >= 2))
    val funnel = q("q_llm_dedup_funnel")
      .select("stage", "n_docs").as[(String, Long)].collect().toMap
    // total - sum(extra members beyond canon) == distinct prefix count
    val merged = groups.map(_._2 - 1).sum
    assert(funnel("all") - merged == funnel("prefix64"))
  }

  test("length percentile outliers: tails only, labels correct") {
    val got = q("q_llm_len_pctile")
      .select("doc_id", "lang", "n_chars", "pr", "tail")
      .as[(Long, String, Long, Double, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, pr, tail) =>
      assert(pr <= 0.02 || pr >= 0.98)
      assert(if (pr <= 0.02) tail == "low" else tail == "high")
    }
    // per language: the min-length doc is always in the low tail
    // (percent_rank of the minimum is 0)
    val langs = Tables(spark, sf, "documents")
      .groupBy("lang").agg(min("n_chars").as("mn"))
      .as[(String, Long)].collect()
    val lows = got.filter(_._5 == "low").groupBy(_._2)
    langs.foreach { case (lang, mn) =>
      assert(lows(lang).exists(_._3 == mn), s"$lang min=$mn missing")
    }
  }

  test("dwell: matches a driver-side replay of next-event gaps") {
    val got = q("q_events_dwell")
      .select("event_type", "n_gaps", "avg_gap_s", "max_gap_s")
      .as[(String, Long, Double, Long)].collect().toSet
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("s"))
      .as[(Long, String, Long, Long)].collect()
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._4, x._3))
      ordered.toSeq.sliding(2).collect {
        case Seq(a, b) => (a._2, b._4 - a._4)
      }.toSeq
    }
    val want = gaps.groupBy(_._1).map { case (t, g) =>
      val n = g.length.toLong
      val avg = math.floor(g.map(_._2).sum.toDouble / n * 10000 + 0.5) / 10000
      (t, n, avg, g.map(_._2).max)
    }.toSet
    assert(got == want)
  }
  test("spearman: bounded, one row per flag, exact vs direct recomputation") {
    val got = q("q_agg_spearman")
      .select("l_returnflag", "n", "spearman")
      .as[(String, Long, Double)].collect()
    val flags = Tables(spark, sf, "lineitem")
      .select("l_returnflag").distinct().as[String].collect().toSet
    assert(got.map(_._1).toSet == flags)
    got.foreach { case (f, n, rho) =>
      assert(n > 0 && rho >= -1.0 && rho <= 1.0, s"$f: n=$n rho=$rho")
    }
    // cross-check one group against a direct in-JVM tie-averaged
    // Spearman on the raw values (the fixture's price is synthesized
    // independently of quantity, so rho itself is near 0 — the check
    // is exactness of the rank formulation, not a domain story)
    val f0 = got.head._1
    val xs = Tables(spark, sf, "lineitem")
      .filter(col("l_returnflag") === f0)
      .select("l_quantity", "l_extendedprice")
      .as[(Double, Double)].collect()
    def ranks(v: Seq[Double]): Map[Double, Double] = {
      val sorted = v.sorted
      v.distinct.map { x =>
        val lo = sorted.indexWhere(_ == x) + 1
        val hi = sorted.lastIndexWhere(_ == x) + 1
        x -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = ranks(xs.map(_._1).toSeq); val ry = ranks(xs.map(_._2).toSeq)
    val n = xs.length.toDouble
    val (sx, sy) = (xs.map(p => rx(p._1)).sum, xs.map(p => ry(p._2)).sum)
    val sxx = xs.map(p => rx(p._1) * rx(p._1)).sum
    val syy = xs.map(p => ry(p._2) * ry(p._2)).sum
    val sxy = xs.map(p => rx(p._1) * ry(p._2)).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val gotRho = got.find(_._1 == f0).get._3
    assert(math.abs(gotRho - want) < 1e-3, s"$f0: $gotRho vs direct $want")
  }

  test("bucket_index: codegen'd kernel == interpreted HOF count in a real plan") {
    // the spearman_approx hot path runs the generated code; this pins it
    // against the declarative linear-count formulation (which exercises
    // interpreted HOF eval) on the same rows — codegen/interpreted parity
    // through an actual WholeStageCodegen stage, not just unit eval
    import graft.functions.BucketIndex.bucketIndex
    val cuts = (1 to 127).map(_ * 7.5).toArray
    val df = Tables(spark, sf, "lineitem")
      .select(col("l_extendedprice").cast("double").as("v"))
      .withColumn("cuts", typedLit(cuts))
    val fast = df.select(col("v"), bucketIndex(spark, col("v"), col("cuts"))
      .as("b")).as[(Double, Int)].collect()
    val slow = df.select(col("v"),
      aggregate(col("cuts"), lit(0),
        (acc, c) => acc + when(col("v") > c, 1).otherwise(0)).as("b"))
      .as[(Double, Int)].collect()
    assert(fast.sorted.sameElements(slow.sorted))
  }

}
