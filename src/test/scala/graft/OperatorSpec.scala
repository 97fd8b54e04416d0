package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaPipeline

/** Cross-operator invariants + approximate-op tolerance + multimodal
  * plumbing (SURVEY.md §5.2/§5.5). Exact values are the oracle's job
  * (Verify + DuckDB); these assert semantic properties. */
class OperatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct within 10% of exact per event_type") {
    val approx = q("q_agg_approx_hll")
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.10, s"$k: approx $a exact $e")
    }
  }

  test("approx profile matches the exact profile within 10% on distincts") {
    val exact = q("q_agg_profile")
      .select("column_name", "n_distinct", "n_nulls", "min_s", "max_s")
      .as[(String, Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    val approx = q("q_agg_profile_approx")
      .select("column_name", "n_distinct", "n_nulls", "min_s", "max_s")
      .as[(String, Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (_, eDist, eNulls, eMin, eMax)) =>
      val (_, aDist, aNulls, aMin, aMax) = approx(k)
      // only the distinct count is sketched; everything else is exact
      assert(math.abs(aDist - eDist).toDouble / math.max(eDist, 1L) <= 0.10,
        s"$k: approx distinct $aDist exact $eDist")
      assert(aNulls == eNulls && aMin == eMin && aMax == eMax, k)
    }
  }

  test("as-of join: every matched purchase precedes its click") {
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
    val asof = q("q_join_asof").filter(col("purchase_id") =!= -1L)
    val withTs = asof
      .join(ev.select(col("event_id").as("click_id"), col("ts").as("cts")), "click_id")
      .join(ev.select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("event_type").as("ptype")), "purchase_id")
    assert(withTs.filter(col("pts") > col("cts")).count() == 0)
    assert(withTs.filter(col("ptype") =!= "purchase").count() == 0)
  }

  test("stream dedup output is idempotent (dedup of dedup = dedup)") {
    val once = q("q_stream_dedup")
    assert(once.count() ==
      once.dropDuplicates("user_id", "event_type").count())
  }

  test("set algebra: union counts = sum, intersect ⊆ both, except ∩ right = ∅") {
    val c = Tables(spark, sf, "customer").select(col("c_nationkey").as("nk"))
    val s2 = Tables(spark, sf, "supplier").select(col("s_nationkey").as("nk"))
    val unionN = q("q_set_union").agg(sum(col("n"))).as[Long].head()
    assert(unionN == c.count() + s2.count())
    val inter = q("q_set_intersect").as[Int].collect().toSet
    val cSet = c.distinct().as[Int].collect().toSet
    val sSet = s2.distinct().as[Int].collect().toSet
    assert(inter.subsetOf(cSet) && inter.subsetOf(sSet))
    val except = q("q_set_except").as[Int].collect().toSet
    assert(except.intersect(sSet).isEmpty)
  }

  test("window top-k rows are a subset of their group with correct rank") {
    val topk = q("q_win_topk_group")
    assert(topk.filter(col("rn") > 3).count() == 0)
    // rank 1 is the group max
    val r1 = topk.filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_totalprice").as("p1"))
    val mx = Tables(spark, sf, "orders").groupBy("o_custkey")
      .agg(max(col("o_totalprice")).as("pm"))
    assert(r1.join(mx, "o_custkey").filter(col("p1") =!= col("pm")).count() == 0)
  }

  test("multimodal pipeline: deterministic, complete, no driver collect") {
    val f1 = MediaPipeline.pipeline(spark, sf).collect()
    val f2 = MediaPipeline.pipeline(spark, sf).collect()
    assert(f1.sameElements(f2))
    assert(f1.length == Tables(spark, sf, "documents").count())
    // stub decode honored the mime split
    val frames = f1.map(r => (r.getAs[String]("mime"), r.getAs[Int]("n_frames")))
    assert(frames.filter(_._1 == "video/mp4").forall(_._2 >= 1))
    assert(frames.filter(_._1 != "video/mp4").forall(_._2 == 1))
  }

  test("multimodal resize fits maxDim preserving aspect; frame sampling strides") {
    val media = MediaPipeline.mediaTable(spark, sf)
    val resized = MediaPipeline.resize(media, 128).collect()
    assert(resized.length == media.count())
    assert(resized.forall(r => r.width <= 128 && r.height <= 128
      && r.width >= 1 && r.height >= 1))
    val frames = MediaPipeline.sampleFrames(media, 5).collect()
    val videos = media.filter(_.mime.startsWith("video")).collect()
    assert(frames.map(_.doc_id).toSet == videos.map(_.doc_id).toSet)
    // every sampled index is a stride multiple within the decoded range
    val byDoc = frames.groupBy(_.doc_id)
    videos.foreach { v =>
      val (_, _, n) = MediaPipeline.decodeStub(v.mime, v.media)
      val got = byDoc(v.doc_id).map(_.frame_idx).sorted.toSeq
      assert(got == (0 until n by 5).toSeq, s"doc ${v.doc_id}")
    }
  }

  test("salted skew join equals the plain join, inner and left-outer") {
    import graft.operators.SkewJoin
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val pt = Tables(spark, sf, "part").select("p_partkey", "p_name")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("p_name")).collect().map(_.toString).sorted.toSeq
    val plainInner = canon(li.join(pt, li("l_partkey") === pt("p_partkey")))
    val saltedInner = canon(SkewJoin.salted(li, pt, "l_partkey", "p_partkey", 8))
    assert(saltedInner == plainInner)
    val plainLeft = canon(li.join(pt, li("l_partkey") === pt("p_partkey"), "left"))
    val saltedLeft = canon(SkewJoin.salted(li, pt, "l_partkey", "p_partkey", 8, "left"))
    assert(saltedLeft == plainLeft)
    // the whole point: the shuffle key now includes the salt
    val p = SkewJoin.salted(li, pt, "l_partkey", "p_partkey", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p.take(2000))
  }

  test("approx_percentile within sketch accuracy of exact percentiles") {
    val approx = q("q_agg_approx_pct")
      .select("l_returnflag", "p50_qty", "p90_qty")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = q("q_agg_percentile")
      .select("l_returnflag", "p50_qty", "p90_qty")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=1000 → rank error <= n/1000; on ~[1,50] quantities allow
    // a small absolute band around the exact interpolated value
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - p50) <= 1.0, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) <= 1.0, s"$k p90: $a90 vs $p90")
    }
  }

  test("rollup subtotals are consistent with detail rows") {
    val r = q("q_agg_rollup")
    val grand = r.filter(col("nation") === "ALL" && col("segment") === "ALL")
      .select("n_cust").as[Long].head()
    val detail = r.filter(col("nation") =!= "ALL" && col("segment") =!= "ALL")
      .agg(sum(col("n_cust"))).as[Long].head()
    assert(grand == detail)
    assert(grand == Tables(spark, sf, "customer").count())
  }

  test("salted skew join is row-identical to the plain equi-join") {
    val plain = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
    val salted = q("q_join_skew")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("rp_reduce: deterministic and distance-correlated") {
    val a = q("q_llm_rp_reduce").collect()
    val b = q("q_llm_rp_reduce").collect()
    assert(a.sameElements(b)) // fixed md5 sign matrix — no run-to-run drift
    assert(a.length == Tables(spark, sf, "embeddings").count())
  }
  test("approx ppl buckets within 15% of the exact quartile split") {
    val exact = q("q_llm_ppl_bucket")
      .select("bucket", "n_docs").as[(Int, Long)].collect().toMap
    val approx = q("q_llm_ppl_bucket_approx")
      .select("bucket", "n_docs").as[(Int, Long)].collect().toMap
    // every doc lands in exactly one sketch bucket
    assert(approx.values.sum == exact.values.sum)
    (1 to 4).foreach { b =>
      val e = exact(b); val a = approx.getOrElse(b, 0L)
      assert(math.abs(a - e).toDouble / e <= 0.15,
        s"bucket $b: approx $a exact $e")
    }
    // threshold bucketing preserves the mean-NLL ordering
    val avgs = q("q_llm_ppl_bucket_approx")
      .select("bucket", "avg_nll").as[(Int, Double)].collect()
      .sortBy(_._1).map(_._2)
    assert(avgs.sliding(2).forall {
      case Array(x, y) => x <= y; case _ => true
    }, avgs.mkString(","))
  }

  test("sketch-threshold RFM within tolerance of an exact-boundary assignment; ordering holds") {
    // Tie-aware gate: threshold buckets put EQUAL values in the same
    // quartile (the defensible semantics at scale), while the exact
    // twin's ntile splits ties arbitrarily to equalize counts — so the
    // expectation is an exact-ORDER-STATISTIC threshold assignment over
    // the same per-user relation, not ntile's populations (recency is
    // massively tied at the fixture SFs: most users are active on the
    // corpus' last day).
    val per = q("q_events_rfm")
      .select(col("recency_d").cast("double"), col("freq").cast("double"),
        col("monetary"))
      .as[(Double, Double, Double)].collect()
    val n = per.length.toLong
    def thr(vs: Array[Double]): (Double, Double, Double) = {
      val s = vs.sorted
      def at(p: Double) = s(math.min(s.length - 1,
        math.max(0, math.ceil(p * s.length).toInt - 1)))
      (at(0.25), at(0.5), at(0.75))
    }
    def popUp(vs: Array[Double]): Map[Int, Long] = {
      val (a, b, c) = thr(vs)
      vs.map(v => 1 + (if (v > a) 1 else 0) + (if (v > b) 1 else 0)
          + (if (v > c) 1 else 0))
        .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    }
    def popDown(vs: Array[Double]): Map[Int, Long] = {
      val (a, b, c) = thr(vs)
      vs.map(v => 1 + (if (v < c) 1 else 0) + (if (v < b) 1 else 0)
          + (if (v < a) 1 else 0))
        .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    }
    val expect = Map(
      "recency" -> popUp(per.map(_._1)),
      "frequency" -> popDown(per.map(_._2)),
      "monetary" -> popDown(per.map(_._3)))
    val got = q("q_events_rfm_approx")
      .select("dim", "q", "n_users").as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (dim, em) =>
      val gm = got(dim)
      assert(gm.values.sum == n, s"$dim: populations must conserve users")
      (1 to 4).foreach { b =>
        val e = em.getOrElse(b, 0L); val a = gm.getOrElse(b, 0L)
        // ±2 users or 20%: absorbs the sketch picking a neighboring
        // order statistic at a boundary (one rank = one user here)
        assert(math.abs(a - e) <= math.max(2L, (0.2 * e).toLong),
          s"$dim bucket $b: approx $a, exact-boundary $e")
      }
    }
    // mean-metric ordering over non-empty buckets: quartile 1 is BEST —
    // lowest recency, highest frequency/monetary
    q("q_events_rfm_approx")
      .select("dim", "q", "mean_metric").as[(String, Int, Double)].collect()
      .groupBy(_._1).foreach { case (dim, rs) =>
        val seq = rs.sortBy(_._2).map(_._3)
        val ok =
          if (dim == "recency")
            seq.sliding(2).forall { case Array(x, y) => x <= y; case _ => true }
          else
            seq.sliding(2).forall { case Array(x, y) => x >= y; case _ => true }
        assert(ok, s"$dim means not ordered: ${seq.mkString(",")}")
      }
  }

  test("sketch-rank Spearman within tolerance of the exact twin per flag") {
    val exact = q("q_agg_spearman")
      .select("l_returnflag", "n", "spearman")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val approx = q("q_agg_spearman_approx")
      .select("l_returnflag", "n", "spearman")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (_, en, er)) =>
      val (_, an, ar) = approx(flag)
      assert(an == en, s"$flag: row count drifted ($an vs $en)")
      // 128-bucket midrank discretization: |Δρ| bounded well under 0.02
      // (quantity's ~50 values rank exactly; price's error is O(1/B²))
      assert(math.abs(ar - er) <= 0.02, s"$flag: approx ρ $ar exact ρ $er")
    }
  }

  test("sketch-cutoff length tails within tolerance of the exact percent_rank tails") {
    val exact = q("q_llm_len_pctile")
      .select("lang", "tail").as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val approx = q("q_llm_len_pctile_approx")
      .select("lang", "tail").as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(approx.nonEmpty)
    // every (lang, tail) population within boundary-tie slack of exact:
    // percent_rank includes pr<=0.02 of n-1 denominators, the sketch
    // includes value<=cutoff — ±2 docs or 50% at these tiny tails
    (exact.keySet ++ approx.keySet).foreach { k =>
      val e = exact.getOrElse(k, 0L); val a = approx.getOrElse(k, 0L)
      assert(math.abs(a - e) <= math.max(2L, (0.5 * e).toLong),
        s"$k: approx $a exact $e")
    }
    // tails are disjoint and ordered within each language
    val rows = q("q_llm_len_pctile_approx")
      .select("lang", "n_chars", "tail").as[(String, Long, String)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val lo = rs.filter(_._3 == "low").map(_._2)
      val hi = rs.filter(_._3 == "high").map(_._2)
      if (lo.nonEmpty && hi.nonEmpty)
        assert(lo.max < hi.min, s"$lang: tails overlap")
    }
  }

  test("compress ratio: exact vs an in-JVM Deflater recomputation") {
    val got = q("q_llm_compress_ratio")
      .select("doc_id", "n_bytes", "z_bytes", "ratio")
      .as[(Long, Long, Long, Double)].collect()
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    def zlen(text: String): Long = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(text.getBytes("UTF-8")); d.finish()
        val b = new Array[Byte](16 * 1024)
        var t = 0L
        while (!d.finished()) t += d.deflate(b)
        t
      } finally d.end()
    }
    got.foreach { case (id, nb, zb, r) =>
      val bytes = docs(id).getBytes("UTF-8").length.toLong
      assert(nb == bytes, s"doc $id n_bytes")
      assert(zb == zlen(docs(id)), s"doc $id z_bytes")
      assert(r == math.floor(zb.toDouble / nb * 1e4 + 0.5) / 1e4, s"doc $id ratio")
    }
    // the signal separates redundancy: a 200x-repeated token compresses
    // an order of magnitude below the corpus's natural-text median
    import org.apache.spark.sql.functions.lit
    val rep = ("spam " * 200).trim
    val repRatio = zlen(rep).toDouble / rep.getBytes("UTF-8").length
    val med = got.map(_._4).sorted.apply(got.length / 2)
    assert(repRatio < med / 5, s"repeated $repRatio vs median $med")
  }

}
