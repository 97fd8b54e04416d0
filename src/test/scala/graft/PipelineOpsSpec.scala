package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 curation + event-analytics
  * operators (exact values are the oracle's job — Verify + DuckDB). */
class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetition: top_share in (0,1], top_cnt <= n_bigrams, all docs scored") {
    val r = q("q_llm_repetition")
    assert(r.count() ==
      Tables(spark, sf, "documents")
        .filter(size(split(col("text"), " ")) >= 2).count())
    assert(r.filter(col("top_cnt") > col("n_bigrams")).count() == 0)
    assert(r.filter(col("top_share") <= 0 || col("top_share") > 1).count() == 0)
    // a doc of one repeated bigram scores 1.0: verified on a literal row
    val one = Seq((1L, "x x x x")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("bg"))
      .groupBy("doc_id", "bg").count()
    assert(one.count() == 1 && one.head().getLong(2) == 3)
  }

  test("temp mix: T=2 flattens the language skew, exact integer allocation") {
    val rows = q("q_llm_temp_mix")
      .select("lang", "n_docs", "share", "n_alloc")
      .as[(String, Long, Double, Long)].collect()
    val counts = Tables(spark, sf, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == counts.keySet, "one row per language")
    // exact recompute of the fixed-point weights and allocation
    val sqrtU = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val totU = sqrtU.values.sum
    rows.foreach { case (l, n, share, alloc) =>
      assert(n == counts(l))
      assert(alloc == 1000L * sqrtU(l) / totU, s"$l allocation")
      assert(math.abs(share -
        math.floor(sqrtU(l).toDouble / totU * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    assert(rows.map(_._4).sum <= 1000, "allocation overspends the budget")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares don't sum to 1")
    // flattening: the head/tail SHARE ratio must sit strictly inside the
    // head/tail COUNT ratio (that's what temperature sampling is for)
    val byN = rows.sortBy(_._2)
    val (tail, head) = (byN.head, byN.last)
    if (head._2 > tail._2) {
      val countRatio = head._2.toDouble / tail._2
      val shareRatio = head._3 / tail._3
      assert(shareRatio < countRatio && shareRatio >= 1.0,
        s"share ratio $shareRatio vs count ratio $countRatio")
    }
  }

  test("mix sample: deterministic, per-source rates honored within tolerance") {
    val a = q("q_llm_mix_sample").as[(Long, String)].collect().toSet
    val b = q("q_llm_mix_sample").as[(Long, String)].collect().toSet
    assert(a == b) // rerun-stable: pure hash predicate, no RNG
    val bySrc = a.groupBy(_._2).view.mapValues(_.size).toMap
    // src0-4 keep everything: exactly the source's full count
    val full = Tables(spark, sf, "documents")
      .filter(col("source") === "src0").count()
    assert(bySrc("src0").toLong == full)
    // lower-rate tiers keep strictly less than everything
    assert(bySrc.getOrElse("src19", 0) < full)
  }

  test("unigram logprob: every doc scored, scores non-positive, dup-invariant") {
    val r = q("q_llm_unigram_logprob").cache()
    try {
      assert(r.count() == Tables(spark, sf, "documents").count())
      assert(r.filter(col("avg_logprob") > 0).count() == 0)
      // exact-duplicate docs score identically (pure function of text)
      val dup = Tables(spark, sf, "documents")
        .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("doc_id"), col("text"))
        .join(r, "doc_id")
      assert(dup.groupBy("text")
        .agg(countDistinct(col("avg_logprob")).as("n"))
        .filter(col("n") =!= 1).count() == 0)
    } finally r.unpersist()
  }

  test("dsir weights: every doc scored, feature counts exact, en target scores higher") {
    val r = q("q_llm_dsir_weights").cache()
    try {
      val docs = Tables(spark, sf, "documents")
      assert(r.count() == docs.count())
      // n_feats = unigrams + bigrams = n + (n-1) for n >= 2, else n
      val exp = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n"))
        .select(col("doc_id"), when(col("n") >= 2, col("n") * 2 - 1)
          .otherwise(col("n")).cast("long").as("want"))
      assert(r.join(exp, "doc_id")
        .filter(col("n_feats") =!= col("want")).count() == 0)
      // the point of the weight: the lang='en' target slice must score
      // higher on average than the rest of the corpus
      val byTgt = r.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang") === "en")
        .agg(avg(col("avg_llr")).as("m"))
        .collect().map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
      assert(byTgt(true) > byTgt(false),
        s"en mean ${byTgt(true)} should exceed non-en ${byTgt(false)}")
    } finally r.unpersist()
  }

  test("cross dedup: novel batch docs only — disjoint from corpus hashes") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(trim(lower(col("text")))).as("h"))
    val corpusH = docs.filter(col("doc_id") % 4 =!= 0)
      .select("h").as[String].collect().toSet
    val novel = q("q_llm_cross_dedup").select("doc_id").as[Long].collect()
    assert(novel.forall(_ % 4 == 0))
    val novelH = docs.filter(col("doc_id").isin(novel: _*))
      .select("h").as[String].collect()
    assert(novelH.forall(!corpusH.contains(_)))
  }

  test("scd2: per-user intervals chain (valid_to = next valid_from), one open row") {
    val h = q("q_scd2_history").cache()
    try {
      // exactly one open (is_current) row per user
      val open = h.filter(col("is_current")).groupBy("user_id").count()
      assert(open.filter(col("count") =!= 1).count() == 0)
      // no interval ends before it starts
      assert(h.filter(col("valid_to_s") < col("valid_from_s")).count() == 0)
      // consecutive rows never carry the same event_type (change points only)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from_s", "valid_to_s")
      // ties within one epoch-second may interleave types; where seconds
      // differ the ordering is chronological and adjacent types must differ
      val sameAsPrev = h
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("prevFrom", lag(col("valid_from_s"), 1).over(w))
        .filter(col("prev") === col("event_type")
          && col("prevFrom") =!= col("valid_from_s"))
      assert(sameAsPrev.count() == 0)
    } finally h.unpersist()
  }

  test("curate: packed output respects window capacity and stage filters") {
    val r = q("q_llm_curate").cache()
    try {
      // every (source, seq_id) window fits the 2048-token budget
      assert(r.groupBy("source", "seq_id")
        .agg(sum(col("n_tokens")).as("fill"))
        .filter(col("fill") > 2048).count() == 0)
      // offsets are consistent: per window, max(offset)+its doc = fill
      assert(r.filter(col("offset") + col("n_tokens") > 2048).count() == 0)
      // curation only removes docs (gate+dedup+sample), never invents
      val ids = r.select("doc_id").as[Long].collect().toSet
      val all = Tables(spark, sf, "documents")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.subsetOf(all) && ids.size < all.size)
    } finally r.unpersist()
  }

  test("funnel: stage counts are monotone non-increasing") {
    val c = q("q_funnel_seq").as[(String, Long)].collect().toMap
    assert(c("1_signup") >= c("2_click"))
    assert(c("2_click") >= c("3_purchase"))
    assert(c("1_signup") > 0)
  }

  test("ppl bucket: exact ntile quartiles of the flat NLL recomputation") {
    val texts = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val cf = texts.flatMap(_._2.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = cf.values.sum
    val nll = cf.map { case (w, c) =>
      w -> math.floor(-math.log(c.toDouble / t) * 1e6 + 0.5).toLong }
    val docs = texts.map { case (id, tx) =>
      val ts = tx.split(" ")
      (id, math.floor(ts.map(nll).sum.toDouble / ts.length).toLong)
    }.sortBy { case (id, nu) => (nu, id) }
    // ntile(4): first (n mod 4) buckets get one extra row
    val n = docs.length; val base = n / 4; val rem = n % 4
    val exp = (1 to 4).scanLeft((0, 0)) { case ((_, off), b) =>
      (b, off + base + (if (b <= rem) 1 else 0))
    }.sliding(2).map { case Seq((_, lo), (b, hi)) =>
      val nus = docs.slice(lo, hi).map(_._2)
      def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      (b, (nus.length.toLong, r4(nus.sum.toDouble / nus.length / 1e6),
        r4(nus.min.toDouble / 1e6), r4(nus.max.toDouble / 1e6)))
    }.toMap
    val rows = q("q_llm_ppl_bucket")
      .select("bucket", "n_docs", "avg_nll", "min_nll", "max_nll")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_._2).sum == n)
    rows.foreach { case (b, nd, av, mn, mx) =>
      assert((nd, av, mn, mx) == exp(b), s"bucket $b")
      assert(mn <= av && av <= mx && mn >= 0.0)
    }
    // quartile ranges tile the NLL axis in order
    val s = rows.sortBy(_._1)
    s.sliding(2).foreach { case Array(a, b) => assert(b._4 >= a._5) }
  }
}
