package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Golden-artifact gate for the declared-approximate ops (the ones
  * the driver's DuckDB compare records as `no_oracle`): each run
  * recomputes the op's quality metric — sketch error or recall — at
  * sf0.01 (the correctness-gate SF) and compares it against the
  * committed `golden/approx_r14.json`, so approximate-op quality is a
  * diffable, regression-gated artifact instead of a blank in the
  * correctness file.
  *
  * Every op is seeded/deterministic, so on a fixed fixture the metrics
  * reproduce exactly; the ±0.02 band only absorbs driver fixture
  * regeneration (new random draws, same distribution). Regenerate with
  * GRAFT_REGEN_GOLDEN=1 after an intentional fixture or parameter
  * change — the diff then shows precisely how quality moved.
  */
class GoldenApproxSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"
  private val goldenPath = Paths.get("golden/approx_r14.json")
  private val band = 0.02

  /** Mean recall of an ANN query's (qid, nbr) rows vs the exact top-5
    * (same definition as VectorOpsSpec.meanRecall). */
  private def meanRecall(ann: String): Double = {
    def top(name: String) = SparkEntry.queries(name)(spark, sf01)
      .select("qid", "nbr")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = top("q_llm_cosine_topk")
    val got = top(ann)
    exact.map { case (k, ex) =>
      got.getOrElse(k, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
  }

  private def computeMetrics(): Map[String, Double] = {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000

    // HLL distinct-users per event_type: max relative error vs exact.
    val hllApprox = SparkEntry.queries("q_agg_approx_hll")(spark, sf01)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val hllExact = Tables(spark, sf01, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    val hllErr = hllExact.map { case (k, e) =>
      math.abs(hllApprox(k) - e).toDouble / e }.max

    // Approx percentiles: max absolute error vs exact p50/p90.
    val pctApprox = SparkEntry.queries("q_agg_approx_pct")(spark, sf01)
      .select("l_returnflag", "p50_qty", "p90_qty")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pctExact = SparkEntry.queries("q_agg_percentile")(spark, sf01)
      .select("l_returnflag", "p50_qty", "p90_qty")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pctErr = pctExact.map { case (k, (e50, e90)) =>
      val (a50, a90) = pctApprox(k)
      math.max(math.abs(a50 - e50), math.abs(a90 - e90)) }.max

    // Sketched profile: max relative error of n_distinct vs the exact
    // profile (nulls/min/max are exact by construction).
    val profApprox = SparkEntry.queries("q_agg_profile_approx")(spark, sf01)
      .select("column_name", "n_distinct").as[(String, Long)].collect().toMap
    val profExact = SparkEntry.queries("q_agg_profile")(spark, sf01)
      .select("column_name", "n_distinct").as[(String, Long)].collect().toMap
    val profErr = profExact.map { case (k, e) =>
      math.abs(profApprox(k) - e).toDouble / math.max(e, 1L) }.max

    // ANN: mean recall vs exact top-5; LSH also its candidate fraction.
    val ivfRecall = meanRecall("q_llm_ann_ivf")
    val lshRecall = meanRecall("q_llm_ann_lsh")
    val nVec = Tables(spark, sf01, "embeddings").count()
    val lshFrac = queries.VectorOps.annLshCandidates(spark, sf01).count()
      .toDouble / (10 * nVec)

    // Sketch-rank Spearman: max |Δρ| vs the exact twin across flags.
    val spExact = SparkEntry.queries("q_agg_spearman")(spark, sf01)
      .select("l_returnflag", "spearman").as[(String, Double)].collect().toMap
    val spApprox = SparkEntry.queries("q_agg_spearman_approx")(spark, sf01)
      .select("l_returnflag", "spearman").as[(String, Double)].collect().toMap
    assert(spApprox.keySet == spExact.keySet,
      s"spearman flag sets diverged: approx ${spApprox.keySet} vs exact ${spExact.keySet}")
    val spErr = spExact.map { case (k, e) => math.abs(spApprox(k) - e) }.max

    // SemDeDup cluster-blocked twin: kept-set agreement vs the exact
    // grid-join clustering (the decision a curation pipeline acts on),
    // plus the exact twin's pair count for context via recall of kept.
    val sdE = SparkEntry.queries("q_llm_semdedup")(spark, sf01)
      .select("vec_id", "is_kept").as[(Long, Int)].collect().toMap
    val sdA = SparkEntry.queries("q_llm_semdedup_approx")(spark, sf01)
      .select("vec_id", "is_kept").as[(Long, Int)].collect().toMap
    assert(sdA.keySet == sdE.keySet, "semdedup twins cover different ids")
    val sdAgree = sdE.count { case (k, v) => sdA(k) == v }.toDouble / sdE.size

    // HLL dedup funnel: max relative error of the three sketched
    // distinct counts vs the exact funnel's (stage 'all' is an exact
    // count in both).
    val fExact = SparkEntry.queries("q_llm_dedup_funnel")(spark, sf01)
      .select("stage", "n_docs").as[(String, Long)].collect().toMap
    val fApprox = SparkEntry.queries("q_llm_dedup_funnel_approx")(spark, sf01)
      .select("stage", "n_docs").as[(String, Long)].collect().toMap
    assert(fApprox.keySet == fExact.keySet,
      s"funnel stage sets diverged: ${fApprox.keySet} vs ${fExact.keySet}")
    assert(fApprox("all") == fExact("all"), "stage 'all' must stay exact")
    val funnelErr = fExact.collect { case (k, e) if k != "all" =>
      math.abs(fApprox(k) - e).toDouble / e }.max

    // Sketch-cutoff length tails: recall of the exact (doc_id, tail)
    // outlier set (the boundary-tie population difference is the
    // approximation; recall is its quality readout).
    val lenExact = SparkEntry.queries("q_llm_len_pctile")(spark, sf01)
      .select("doc_id", "tail").as[(Long, String)].collect().toSet
    val lenApprox = SparkEntry.queries("q_llm_len_pctile_approx")(spark, sf01)
      .select("doc_id", "tail").as[(Long, String)].collect().toSet
    val lenRecall = lenApprox.intersect(lenExact).size.toDouble / lenExact.size

    Map(
      "q_agg_approx_hll.max_rel_err" -> r4(hllErr),
      "q_agg_approx_pct.max_abs_err" -> r4(pctErr),
      "q_agg_profile_approx.max_rel_err" -> r4(profErr),
      "q_llm_ann_ivf.mean_recall_top5" -> r4(ivfRecall),
      "q_llm_ann_lsh.mean_recall_top5" -> r4(lshRecall),
      "q_llm_ann_lsh.candidate_fraction" -> r4(lshFrac),
      "q_agg_spearman_approx.max_abs_rho_err" -> r4(spErr),
      "q_llm_dedup_funnel_approx.max_rel_err" -> r4(funnelErr),
      "q_llm_semdedup_approx.kept_agreement" -> r4(sdAgree),
      "q_llm_len_pctile_approx.exact_tail_recall" -> r4(lenRecall))
  }

  test("approx-op quality matches the committed golden artifact") {
    val metrics = computeMetrics()

    // The absolute quality bars (independent of the golden file): the
    // sketch ops within tolerance, the ANN ops above their floors.
    assert(metrics("q_agg_approx_hll.max_rel_err") <= 0.10)
    assert(metrics("q_agg_approx_pct.max_abs_err") <= 1.0)
    assert(metrics("q_agg_profile_approx.max_rel_err") <= 0.10)
    assert(metrics("q_llm_ann_ivf.mean_recall_top5") >= 0.6)
    assert(metrics("q_llm_ann_lsh.candidate_fraction") <= 0.025)
    assert(metrics("q_agg_spearman_approx.max_abs_rho_err") <= 0.02)
    assert(metrics("q_llm_dedup_funnel_approx.max_rel_err") <= 0.10)
    assert(metrics("q_llm_semdedup_approx.kept_agreement") >= 0.8)
    assert(metrics("q_llm_len_pctile_approx.exact_tail_recall") >= 0.6)

    val json = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k": $v%.4f""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, json)
      info(s"golden regenerated at $goldenPath")
    } else {
      val committed = Files.readString(goldenPath)
      val kv = """"([^"]+)":\s*([-0-9.eE]+)""".r
      val golden = kv.findAllMatchIn(committed)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      assert(golden.keySet == metrics.keySet,
        s"golden keys ${golden.keySet} != computed ${metrics.keySet}; " +
          "regenerate with GRAFT_REGEN_GOLDEN=1")
      metrics.foreach { case (k, v) =>
        assert(math.abs(v - golden(k)) <= band,
          f"$k: computed $v%.4f vs golden ${golden(k)}%.4f (band ±$band); " +
            "if the fixture or parameters changed intentionally, " +
            "regenerate with GRAFT_REGEN_GOLDEN=1")
      }
    }
  }
}
