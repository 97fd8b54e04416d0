package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-mining / corpus-curation operators (round 9, this session):
  * exact-moment correlation matrix, trigram novelty, banded SimHash
  * Hamming dedup, TF-IDF keyword extraction, event burst detection,
  * dedup-funnel reporting, prefix-fingerprint dedup, length-percentile
  * outliers, inter-event dwell stats. Reference implements none
  * (SURVEY.md §0 — /root/reference has zero source files); capabilities
  * derive from the driver north star (LLM training-data pipelines).
  *
  * Determinism discipline (SURVEY.md §2.0): every double that reaches the
  * output is computed from EXACT integer moments (BIGINT/DECIMAL sums)
  * through an expression tree written identically in the DuckDB oracle —
  * IEEE ops on identical inputs in identical order are bit-identical, so
  * the driver's hash compare holds.
  */
object MiningOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, QueryFn] = Map(
    // Pairwise Pearson correlation + sample covariance over lineitem's
    // three business measures, from EXACT integer moments: each value is
    // scaled to integer cents per row (bit-identical floor on both
    // engines), per-row products stay < 2^53 (exact in double), and the
    // sums run as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact and
    // partial-agg-order-independent, unlike a double sum whose last ulp
    // depends on reduction order. corr/cov are then derived in double
    // from the identical exact moments via identical expression trees.
    // Shape: ONE map-side-combined scan computes all 10 moments (no
    // per-pair passes); the 3-row readout is a map-only explode of the
    // single moment row. At 100 TB: same single pass; DECIMAL(38,0)
    // holds sums to 1e38 (price-cents² ≈ 1e14/row → 1e38 bounds ~1e24
    // rows — never the limit).
    "q_agg_corr" -> ((s, d) => {
      def cI(c: Column) = Det.cents(c, 2).cast("decimal(38,0)")
      def pI(a: Column, b: Column) =
        (Det.cents(a, 2) * Det.cents(b, 2)).cast("decimal(38,0)")
      val q = col("l_quantity"); val p = col("l_extendedprice")
      val dc = col("l_discount")
      val m = t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(cI(q)).as("sq"), sum(cI(p)).as("sp"), sum(cI(dc)).as("sd"),
        sum(pI(q, q)).as("sqq"), sum(pI(p, p)).as("spp"),
        sum(pI(dc, dc)).as("sdd"), sum(pI(q, p)).as("sqp"),
        sum(pI(q, dc)).as("sqd"), sum(pI(p, dc)).as("spd"))
      def D(c: Column) = c.cast("double")
      val nd = D(col("n"))
      def corrOf(sxy: Column, sx: Column, sy: Column,
                 sxx: Column, syy: Column) =
        (nd * D(sxy) - D(sx) * D(sy)) /
          sqrt((nd * D(sxx) - D(sx) * D(sx)) * (nd * D(syy) - D(sy) * D(sy)))
      // covariance of the cent-scaled ints is 10^4 × the raw covariance
      def covOf(sxy: Column, sx: Column, sy: Column) =
        (D(sxy) - D(sx) * D(sy) / nd) / (nd - lit(1.0)) / lit(10000.0)
      def row(name: String, sxy: Column, sx: Column, sy: Column,
              sxx: Column, syy: Column) =
        struct(lit(name).as("pair"), col("n").as("n"),
          Det.r(corrOf(sxy, sx, sy, sxx, syy), 4).as("corr"),
          Det.r(covOf(sxy, sx, sy), 4).as("covar"))
      m.select(explode(array(
          row("price_disc", col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")),
          row("qty_disc", col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")),
          row("qty_price", col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp"))
        )).as("r"))
        .select(col("r.pair").as("pair"), col("r.n").as("n"),
          col("r.corr").as("corr"), col("r.covar").as("covar"))
        .orderBy("pair")
    }),

    // Spearman rank correlation — the robust (monotone, outlier-immune)
    // partner to q_agg_corr's Pearson: per l_returnflag, ρ between
    // l_quantity and l_extendedprice as the Pearson of TIE-AVERAGED
    // ranks. Determinism without a single FP rank anywhere: the
    // tie-averaged rank is a half-integer, so DOUBLED ranks are exact
    // integers — 2·avgrank = 2·(#strictly-smaller) + cnt + 1, computed
    // per DISTINCT value from a running count (never a per-row window),
    // and the five moment sums run as DECIMAL(38,0) (Spark) / HUGEINT
    // (DuckDB) — exact, partial-agg-order-independent. ρ derives from
    // identical exact moments via identical expression trees; the
    // doubling cancels in the ratio. Shape: per ranked column one
    // bounded distinct-value agg + a window over the DISTINCT relation
    // (quantity: ~50 values; price: near-unique — exact Spearman on a
    // continuous column inherently ranks the full domain; at 100 TB the
    // rank map comes from a quantile sketch instead), then joins back
    // on the value key and one 3-row moment agg.
    "q_agg_spearman" -> ((s, d) => {
      // repartition after the single-row-group scan (guide §2.5), keyed
      // on (flag, y) — the NEAR-UNIQUE price side (r18): y's distinct
      // agg AND its rank join-back are the two heavy legs, and both
      // reuse this one exchange (§2.4). The quantity rank map is ~50
      // values per flag — a bounded domain at any corpus size — so it
      // rides a BROADCAST instead of shuffling the fact relation a
      // second time (§3.1); the price rank join stays a shuffled join
      // (hash build of the rank map, no sort-merge sort of the fact
      // side). Results are exact DECIMAL sums — partitioning cannot
      // move them.
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("flag"), col("y"))
      def rank2(vc: String, out: String): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy("flag").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        li.groupBy(col("flag"), col(vc).as("v"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("flag"), col("v"),
            (coalesce(sum(col("cnt")).over(w), lit(0L)) * 2
              + col("cnt") + 1).cast("long").as(out))
      }
      // rx/ry derive from li, so rename their keys before the join back
      // (fresh attribute ids — no self-join ambiguity)
      val rx = rank2("x", "rx2").toDF("xf", "xv", "rx2")
      val ry = rank2("y", "ry2").toDF("yf", "yv", "ry2")
      def dec(c: Column) = c.cast("decimal(38,0)")
      val m = li
        .join(broadcast(rx), col("flag") === col("xf") && col("x") === col("xv"))
        .join(ry.hint("shuffle_hash"),
          col("flag") === col("yf") && col("y") === col("yv"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("rx2"))).as("sx"), sum(dec(col("ry2"))).as("sy"),
          sum(dec(col("rx2") * col("rx2"))).as("sxx"),
          sum(dec(col("ry2") * col("ry2"))).as("syy"),
          sum(dec(col("rx2") * col("ry2"))).as("sxy"))
      def D(c: Column) = c.cast("double")
      val nd = D(col("n"))
      m.select(col("flag").as("l_returnflag"), col("n"),
          Det.r((nd * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
            sqrt((nd * D(col("sxx")) - D(col("sx")) * D(col("sx")))
              * (nd * D(col("syy")) - D(col("sy")) * D(col("sy")))), 4)
            .as("spearman"))
        .orderBy("l_returnflag")
    }),

    // The 100 TB twin of q_agg_spearman (the declared fix of its one
    // scale-killer): the exact rank of a near-unique continuous domain
    // needs a per-flag sort of the whole DISTINCT relation on one task;
    // here the rank map instead comes from B-1 approx_percentile cutoffs
    // per flag (one 3-row sketch agg, broadcast back), each row is
    // bucket-assigned map-side, and Spearman runs tie-corrected over the
    // bucket midranks — the discretized variable's EXACT Spearman, which
    // converges to the continuous one as B grows (quantity has ~50
    // distinct values < B, so its ranks stay exact). Shape: one bounded
    // groupBy (flag, bx, by) with map-side combine (≤ 3·B² rows out),
    // midranks from windows over ≤ B-row bucket marginals, broadcast
    // joins, exact DECIMAL weighted moments. No corpus-sized sort or
    // window anywhere. No oracle by design (sketch cutoffs are
    // approximate and merge-order-dependent); OperatorSpec tolerance-
    // gates ρ against the exact twin.
    "q_agg_spearman_approx" -> ((s, d) => {
      // same §2.5 repartition as the exact twin: the per-flag sketch
      // insert (600k rows × 2 percentile summaries at sf0.1) and the
      // bucket-assignment pass otherwise run single-core in the one-task
      // scan stage. The sketch MERGE order changes (32 partials instead
      // of 1), which can nudge cutoff placement — this query is declared
      // no-oracle exactly because sketch output is merge-order-dependent,
      // and OperatorSpec's tolerance gate vs the exact twin still holds
      // (re-run green this round).
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      val B = 128
      val ps = array((1 until B).map(i => lit(i.toDouble / B)): _*)
      // accuracy 2500 (not the 10000 default): with B=128 buckets the
      // midranks come from ACTUAL bucket counts, so cutoff placement
      // error only nudges bucket boundaries — 4x coarser summaries
      // measure cheaper at sf0.1 with no visible ρ drift.
      // Sketch over x/y CAST TO DOUBLE: QuantileSummaries works in
      // double internally either way (identical cutoff values), but a
      // decimal-typed input makes percentile_approx RETURN decimal
      // arrays, and the bucket pass below then re-cast the 127-element
      // cutoff array per ROW — ~150M decimal→double casts at sf0.1,
      // measured as the query's real cost (r18 stage isolation: bucket
      // pass 1.5 s vs 0.3 s sketch). Casting once here makes the
      // broadcast value already double[] (guide §1.1: find where the
      // time actually goes before touching the plan).
      val cuts = li.groupBy("flag").agg(
        percentile_approx(col("x").cast("double"), ps, lit(2500)).as("tx"),
        percentile_approx(col("y").cast("double"), ps, lit(2500)).as("ty"))
      // bucket = #cutoffs strictly below the value: the codegen'd
      // bucket_index kernel (O(log B) binary search inline in the fused
      // stage — see BucketIndex.scala for why both declarative
      // formulations lose by ~8x here). The joint histogram is ≤ 3·B²
      // rows and feeds THREE consumers (two marginal rank maps + the
      // moment agg) — eagerly materialize it once so the fact-table
      // sketch+bucket pass isn't re-evaluated per consumer. EAGER is
      // load-bearing here (r18 A/B: lazy persist regressed 1.1→1.8 s):
      // the two rank maps are BROADCAST builds whose jobs launch
      // concurrently, and a lazy cache lets both race through the
      // un-materialized histogram, each paying the full fact-table
      // pass.
      import graft.functions.BucketIndex.bucketIndex
      val bk = li.join(broadcast(cuts), "flag")
        .select(col("flag"),
          bucketIndex(s, col("x").cast("double"), col("tx")).as("bx"),
          bucketIndex(s, col("y").cast("double"), col("ty")).as("by"))
        .groupBy("flag", "bx", "by").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      // doubled tie-averaged midranks per bucket (same exact-integer
      // discipline as the exact twin), from ≤ B-row marginals
      def rank2(bc: String, out: String): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy("flag").orderBy(col(bc))
          .rowsBetween(Window.unboundedPreceding, -1)
        bk.groupBy(col("flag"), col(bc)).agg(sum(col("cnt")).as("c"))
          .select(col("flag"), col(bc),
            (coalesce(sum(col("c")).over(w), lit(0L)) * 2
              + col("c") + 1).cast("long").as(out))
      }
      val rx = rank2("bx", "rx2").toDF("xf", "xb", "rx2")
      val ry = rank2("by", "ry2").toDF("yf", "yb", "ry2")
      def dec(c: Column) = c.cast("decimal(38,0)")
      val m = bk
        .join(broadcast(rx), col("flag") === col("xf") && col("bx") === col("xb"))
        .join(broadcast(ry), col("flag") === col("yf") && col("by") === col("yb"))
        .groupBy("flag")
        .agg(sum(col("cnt")).as("n"),
          sum(dec(col("cnt")) * dec(col("rx2"))).as("sx"),
          sum(dec(col("cnt")) * dec(col("ry2"))).as("sy"),
          sum(dec(col("cnt")) * dec(col("rx2")) * dec(col("rx2"))).as("sxx"),
          sum(dec(col("cnt")) * dec(col("ry2")) * dec(col("ry2"))).as("syy"),
          sum(dec(col("cnt")) * dec(col("rx2")) * dec(col("ry2"))).as("sxy"))
      def D(c: Column) = c.cast("double")
      val nd = D(col("n"))
      m.select(col("flag").as("l_returnflag"), col("n"),
          Det.r((nd * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
            sqrt((nd * D(col("sxx")) - D(col("sx")) * D(col("sx")))
              * (nd * D(col("syy")) - D(col("sy")) * D(col("sy")))), 4)
            .as("spearman"))
        .orderBy("l_returnflag")
    }),

    // Per-document trigram novelty — the "how much of this doc is new
    // text" curation signal (docs whose grams all first appeared earlier
    // are recombinations/boilerplate; high-novelty docs carry new
    // content). First-occurrence is by min doc_id over the corpus, the
    // deterministic stand-in for ingest order. Grams travel as xxhash64
    // fingerprints (8 B, not ~25-char strings; same 2^-64 collision
    // assumption as q_llm_span_dedup, oracle-verified over exact
    // strings). Shape: map-only gram generation with per-doc distinct
    // applied INSIDE the array (array_distinct before explode — no
    // doc-level shuffle for the dedup), one min shuffle on the gram key,
    // one join back on the same key (exchange reuse), one per-doc agg.
    "q_llm_ngram_novelty" -> ((s, d) => {
      val tk = col("t")
      def el(i: Column, off: Int) = element_at(tk, i + off)
      // §2.5 repartition before gram generation (same one-row-group
      // rationale and shared-exchange shape as q_llm_span_dedup).
      val grams = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(when(size(tk) >= 3,
          array_distinct(transform(sequence(lit(1), size(tk) - 2),
            i => xxhash64(concat_ws(" ", el(i, 0), el(i, 1), el(i, 2))))))
          .otherwise(array().cast("array<bigint>"))).as("g"))
      val first = grams.groupBy("g").agg(min(col("doc_id")).as("fd"))
      grams.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          Det.r(col("n_novel").cast("double") / col("n_grams"), 4)
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs at Hamming distance <= 3 — the
    // constant-cost near-dup modality (one 32-bit signature per doc vs
    // MinHash's 32 hashes; catches small-edit duplicates). Banded
    // blocking makes it sub-quadratic: split the 32-bit sig into 4
    // disjoint 8-bit bands — by pigeonhole, <= 3 flipped bits leave at
    // least one band intact, so every qualifying pair shares a band
    // bucket and the join is an EQUALITY join on (band, value), never
    // all-pairs. The Hamming test (codegen'd bit_count of xor) runs as
    // a cheap integer filter inside the join before any pair row is
    // materialized; distinct collapses pairs found in several bands.
    // Sig computed once and persisted (lazy, r18) so both probes of the
    // self-join share one evaluation of the token-explode+hash kernel
    // without a separate eager materialization pass. At 100 TB: 16-bit
    // bands over a 64-bit sig shrink buckets 256×, plus the same
    // mega-bucket cap MinHash banding uses (TextOps.scala:33-36) —
    // a boilerplate sig shared by millions of docs is dropped, not
    // joined.
    "q_llm_simhash_dup" -> ((s, d) => {
      val sig = TextOps.simhashSig(s, d).persist()
      def bands(side: String) = sig.select(
          col("doc_id").as(s"${side}_id"), col("simhash").as(s"${side}_sig"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("b"), shiftright(col("simhash"), b * 8)
              .bitwiseAND(lit(255L)).as("bv"))): _*)).as("e"))
        .select(col(s"${side}_id"), col(s"${side}_sig"),
          col("e.b").as(s"${side}_b"), col("e.bv").as(s"${side}_bv"))
      val ham = bit_count(col("a_sig").bitwiseXOR(col("c_sig")))
      bands("a").join(bands("c"),
          col("a_b") === col("c_b") && col("a_bv") === col("c_bv") &&
            col("a_id") < col("c_id") && ham <= 3)
        .select(col("a_id").as("d1"), col("c_id").as("d2"),
          ham.cast("int").as("hamming"))
        .distinct()
        .orderBy("d1", "d2")
    }),

    // TF-IDF keyword extraction: top-3 terms per doc — the per-doc
    // keyword readout next to q_llm_tfidf's corpus-wide top-1 (tag
    // generation, index keying, topic seeding). doc-length and
    // document-frequency are WINDOWS over the single tf relation (sum
    // over doc_id, count over term), not self-joins: the tf diamond
    // would either recompute tokenization per branch or persist a
    // relation that leaks into later queries' storage memory (the
    // round-2 verdict leak) — windows keep the pipeline linear with
    // exactly three hash exchanges ((doc_id,term) agg → term → doc_id)
    // and nothing cached. The top-3 row_number runs with WindowGroupLimit
    // pushdown — each partition keeps 3 candidate rows per doc, never a
    // doc's full vocabulary. Ties broken (tfidf DESC, term ASC)
    // identically in the oracle.
    "q_llm_keyword_topk" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // §2.5 repartition by doc_id: parallelizes the one-task tokenize
      // front AND satisfies the (doc_id, term) grouping and the doc_id
      // windows downstream, so no extra exchange appears for them.
      val tf = docs
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tfidf = (col("cnt").cast("double") / col("dl")) *
        log(col("n_docs").cast("double") / col("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .withColumn("dl", sum(col("cnt")).over(Window.partitionBy("doc_id")))
        .crossJoin(broadcast(n))
        .withColumn("tfidf", tfidf)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"),
          Det.r(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rn")
    }),

    // Event burst detection: per (user, minute) activity vs the user's
    // trailing 10-minute rate — the rate-anomaly primitive behind abuse
    // flagging and scraper detection. All-integer decision rule: a
    // minute with n events bursts when n >= 3 AND n*5 > trailing-sum
    // (i.e. n > 2× the 10-minute average), so no float reaches the
    // predicate. Shape: one map-side-combined count shuffle on
    // (user, minute), then a RANGE window over the integer minute key —
    // range frames skip inactive minutes correctly where a ROWS frame
    // would not. Per-user partitions are bounded (a user's active
    // minutes), no skew risk at 100 TB.
    "q_events_burst" -> ((s, d) => {
      val sec = unix_timestamp(col("ts"))
      val counts = t(s, d, "events")
        .select(col("user_id"), floor(sec / lit(60)).cast("long").as("minute"))
        .groupBy("user_id", "minute").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy("minute")
        .rangeBetween(-10, -1)
      counts
        .withColumn("trail", coalesce(sum(col("n")).over(w), lit(0L)))
        .filter(col("n") >= 3 && col("n") * 5 > col("trail"))
        .orderBy("user_id", "minute")
    }),

    // Dedup-funnel report: corpus cardinality at each dedup modality —
    // the one-page "how much survives each stage" readout a curation run
    // publishes. Stages: all docs → exact text → 64-char prefix
    // fingerprint (crawl near-dup heuristic: same page, differing
    // footer) → bag-of-words (order-insensitive rewrite dedup). ONE
    // scan computes all four distinct-counts as sibling aggregates
    // (Spark expands multi-distinct into a single expand+agg, still one
    // pass over the corpus); the 4-row readout explodes the single
    // result row map-side. At 100 TB the exact distincts swap for HLL
    // sketches (q_agg_approx_hll is the declared approximate path).
    "q_llm_dedup_funnel" -> ((s, d) => {
      val bow = md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))))
      val m = t(s, d, "documents").agg(
        count(lit(1)).as("total"),
        count_distinct(md5(col("text"))).as("n_exact"),
        count_distinct(md5(substring(col("text"), 1, 64))).as("n_prefix"),
        count_distinct(bow).as("n_bow"))
      def row(ord: Int, name: String, c: Column) =
        struct(lit(ord).as("stage_ord"), lit(name).as("stage"),
          c.as("n_docs"))
      m.select(col("total"), explode(array(
          row(1, "all", col("total")),
          row(2, "exact", col("n_exact")),
          row(3, "prefix64", col("n_prefix")),
          row(4, "bag_of_words", col("n_bow")))).as("r"))
        .select(col("r.stage_ord").as("stage_ord"), col("r.stage").as("stage"),
          col("r.n_docs").as("n_docs"),
          Det.r(col("r.n_docs").cast("double") / col("total"), 4)
            .as("keep_ratio"))
        .orderBy("stage_ord")
    }),

    // The 100 TB split of q_llm_dedup_funnel (SURVEY §2.11's declared
    // HLL path, shipped as a twin like spearman_approx/len_pctile_
    // approx): the exact funnel's four corpus-wide COUNT(DISTINCT)s
    // each shuffle every fingerprint in the corpus; here they swap for
    // HLL++ sketches (approx_count_distinct, rsd 1%) built in ONE
    // map-side pass — four fixed-size sketches merge in O(sketch), so
    // the readout costs a single scan regardless of corpus size. Same
    // output shape as the exact funnel. No DuckDB twin by design (HLL
    // implementations differ across engines); tolerance-gated vs the
    // exact funnel in OperatorSpec and golden/approx_r14.json.
    "q_llm_dedup_funnel_approx" -> ((s, d) => {
      val bow = md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))))
      val m = t(s, d, "documents").agg(
        count(lit(1)).as("total"),
        approx_count_distinct(md5(col("text")), 0.01).as("n_exact"),
        approx_count_distinct(md5(substring(col("text"), 1, 64)), 0.01)
          .as("n_prefix"),
        approx_count_distinct(bow, 0.01).as("n_bow"))
      def row(ord: Int, name: String, c: Column) =
        struct(lit(ord).as("stage_ord"), lit(name).as("stage"),
          c.as("n_docs"))
      m.select(col("total"), explode(array(
          row(1, "all", col("total")),
          row(2, "exact", col("n_exact")),
          row(3, "prefix64", col("n_prefix")),
          row(4, "bag_of_words", col("n_bow")))).as("r"))
        .select(col("r.stage_ord").as("stage_ord"), col("r.stage").as("stage"),
          col("r.n_docs").as("n_docs"),
          Det.r(col("r.n_docs").cast("double") / col("total"), 4)
            .as("keep_ratio"))
        .orderBy("stage_ord")
    }),

    // Prefix-fingerprint dedup groups: docs sharing the same first-64-
    // char md5 (the cheap crawl heuristic the funnel counts), with the
    // canonical survivor (min doc_id) and group size. One
    // map-side-combined shuffle on the 16-byte key; group detail stays
    // bounded because only groups >= 2 are emitted. The md5 hex string
    // is identical across engines, so the key itself is output and
    // hash-compared.
    "q_llm_prefix_dedup" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(md5(substring(col("text"), 1, 64)).as("prefix_key"))
        .agg(min(col("doc_id")).as("canonical"), count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy("prefix_key")
    }),

    // Length-percentile outliers: docs in the per-language 2% length
    // tails — the "truncated fragment / concatenation blob" filter every
    // curation pipeline runs, per-language because length distributions
    // differ by script. percent_rank is (rank-1)/(rows-1): exact integer
    // inputs, identical formula both engines, ties (equal n_chars) get
    // equal ranks — deterministic without a tiebreak column. One window
    // shuffle on lang (bounded partition count ≈ languages; at 100 TB
    // the per-lang sort is the cost — swap to approx_percentile cutoffs
    // per language and a broadcast join, same output contract).
    "q_llm_len_pctile" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy("n_chars")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("pr", percent_rank().over(w))
        .filter(col("pr") <= 0.02 || col("pr") >= 0.98)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Det.r(col("pr"), 4).as("pr"),
          when(col("pr") <= 0.02, "low").otherwise("high").as("tail"))
        .orderBy("doc_id")
    }),

    // The 100 TB twin of q_llm_len_pctile (its declared approx-cutoff
    // path): the exact percent_rank sorts each language's FULL doc set
    // on one task; here the 2%/98% cutoffs come from one per-language
    // approx_percentile agg (bounded: one row per language), broadcast
    // back, and tail membership is decided map-side — no window, no
    // per-language sort, scan-shaped at any corpus size. No oracle by
    // design (sketch cutoffs approximate, tie handling at the boundary
    // differs from percent_rank's by construction); OperatorSpec gates
    // each (lang, tail) population within tolerance of the exact twin.
    "q_llm_len_pctile_approx" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val cuts = docs.groupBy("lang").agg(percentile_approx(
        col("n_chars"), array(lit(0.02), lit(0.98)), lit(10000)).as("c"))
      docs.join(broadcast(cuts), "lang")
        .filter(col("n_chars") <= col("c")(0) || col("n_chars") >= col("c")(1))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          when(col("n_chars") <= col("c")(0), "low").otherwise("high")
            .as("tail"))
        .orderBy("doc_id")
    }),

    // Inter-event dwell time by event type: for each event, seconds
    // until the same user's next event; aggregated per the FROM event's
    // type — the engagement readout ("how long do users linger after a
    // click vs a purchase"). Ordering is (epoch second, event_id), the
    // §2.0 engine-portable key; gaps are exact integer seconds, so sum
    // and max are exact and the average divides two exact integers.
    // One window shuffle on user_id, then a hash agg on the tiny
    // event_type key.
    "q_events_dwell" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("nxt", lead(col("sec"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("gap", col("nxt") - col("sec"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          Det.r(sum(col("gap")).cast("double") / count(lit(1)), 4)
            .as("avg_gap_s"),
          max(col("gap")).as("max_gap_s"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_agg_corr" -> {
      // identical exact-moment → double expression trees as the Spark side
      def corrOf(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
        s"floor((nd*$sxy - $sx*$sy) / sqrt((nd*$sxx - $sx*$sx) * (nd*$syy - $sy*$sy)) * 10000 + 0.5) / 10000"
      def covOf(sxy: String, sx: String, sy: String) =
        s"floor(($sxy - $sx*$sy/nd) / (nd - 1.0) / 10000.0 * 10000 + 0.5) / 10000"
      s"""WITH c AS (SELECT CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS cq,
                          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cp,
                          CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS cd
                   FROM lineitem),
            m AS (SELECT count(*)::BIGINT AS n, CAST(count(*) AS DOUBLE) AS nd,
                         CAST(sum(cq) AS DOUBLE) AS sq, CAST(sum(cp) AS DOUBLE) AS sp,
                         CAST(sum(cd) AS DOUBLE) AS sd,
                         CAST(sum(cq*cq) AS DOUBLE) AS sqq, CAST(sum(cp*cp) AS DOUBLE) AS spp,
                         CAST(sum(cd*cd) AS DOUBLE) AS sdd, CAST(sum(cq*cp) AS DOUBLE) AS sqp,
                         CAST(sum(cq*cd) AS DOUBLE) AS sqd, CAST(sum(cp*cd) AS DOUBLE) AS spd
                  FROM c)
         SELECT 'price_disc' AS pair, n, ${corrOf("spd", "sp", "sd", "spp", "sdd")} AS corr,
                ${covOf("spd", "sp", "sd")} AS covar FROM m
         UNION ALL
         SELECT 'qty_disc', n, ${corrOf("sqd", "sq", "sd", "sqq", "sdd")},
                ${covOf("sqd", "sq", "sd")} FROM m
         UNION ALL
         SELECT 'qty_price', n, ${corrOf("sqp", "sq", "sp", "sqq", "spp")},
                ${covOf("sqp", "sq", "sp")} FROM m
         ORDER BY pair"""
    },
    "q_agg_spearman" ->
      """WITH li AS (SELECT l_returnflag AS flag, l_quantity AS x,
                            l_extendedprice AS y
                     FROM lineitem),
              gx AS (SELECT flag, x AS v, count(*) AS cnt
                     FROM li GROUP BY 1, 2),
              rx AS (SELECT flag, v,
                            CAST(COALESCE(sum(cnt) OVER (
                                   PARTITION BY flag ORDER BY v
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) * 2
                                 + cnt + 1 AS BIGINT) AS rx2
                     FROM gx),
              gy AS (SELECT flag, y AS v, count(*) AS cnt
                     FROM li GROUP BY 1, 2),
              ry AS (SELECT flag, v,
                            CAST(COALESCE(sum(cnt) OVER (
                                   PARTITION BY flag ORDER BY v
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) * 2
                                 + cnt + 1 AS BIGINT) AS ry2
                     FROM gy),
              j AS (SELECT li.flag, rx.rx2, ry.ry2
                    FROM li JOIN rx ON li.flag = rx.flag AND li.x = rx.v
                            JOIN ry ON li.flag = ry.flag AND li.y = ry.v),
              m AS (SELECT flag, count(*) AS n,
                           sum(CAST(rx2 AS HUGEINT)) AS sx,
                           sum(CAST(ry2 AS HUGEINT)) AS sy,
                           sum(CAST(rx2 * rx2 AS HUGEINT)) AS sxx,
                           sum(CAST(ry2 * ry2 AS HUGEINT)) AS syy,
                           sum(CAST(rx2 * ry2 AS HUGEINT)) AS sxy
                    FROM j GROUP BY flag)
         SELECT flag AS l_returnflag, n,
                floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * 10000 + 0.5) / 10000 AS spearman
         FROM m ORDER BY l_returnflag""",
    // exact-string twin of the hashed-gram Spark pipeline
    "q_llm_ngram_novelty" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            g0 AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
                   FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
                   WHERE len(t) >= 3),
            g AS (SELECT DISTINCT doc_id, g FROM g0),
            f AS (SELECT g, min(doc_id) AS fd FROM g GROUP BY g)
         SELECT doc_id, count(*) AS n_grams,
                CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_novel,
                floor(CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
                  AS novelty
         FROM g JOIN f USING (g)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_simhash_dup" ->
      s"""WITH ${TextOps.simhashSigSql},
            bands AS (SELECT doc_id, simhash, b,
                             (simhash >> (b * 8)) & 255 AS bv
                      FROM sig, unnest([0, 1, 2, 3]) AS u(b))
         SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2,
                CAST(bit_count(xor(a.simhash, c.simhash)) AS INTEGER)
                  AS hamming
         FROM bands a JOIN bands c
           ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
         WHERE bit_count(xor(a.simhash, c.simhash)) <= 3
         ORDER BY d1, d2""",
    "q_llm_keyword_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl FROM tf GROUP BY 1),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     (CAST(tf.cnt AS DOUBLE) / dl.dl) * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
              FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS INTEGER) AS rn
                  FROM scored)
         SELECT doc_id, rn, term, floor(tfidf * 1000000 + 0.5) / 1000000 AS tfidf
         FROM r WHERE rn <= 3 ORDER BY doc_id, rn""",
    "q_events_burst" ->
      """WITH c AS (SELECT user_id,
                         CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute,
                         count(*) AS n
                  FROM events GROUP BY 1, 2),
            w AS (SELECT user_id, minute, n,
                         CAST(coalesce(sum(n) OVER (
                           PARTITION BY user_id ORDER BY minute
                           RANGE BETWEEN 10 PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS trail
                  FROM c)
         SELECT user_id, minute, n, trail FROM w
         WHERE n >= 3 AND n * 5 > trail
         ORDER BY user_id, minute""",
    "q_llm_dedup_funnel" ->
      """WITH m AS (SELECT count(*)::BIGINT AS total,
                         count(DISTINCT md5(text))::BIGINT AS n_exact,
                         count(DISTINCT md5(substr(text, 1, 64)))::BIGINT AS n_prefix,
                         count(DISTINCT md5(array_to_string(
                           list_sort(list_distinct(string_split(text, ' '))),
                           ' ')))::BIGINT AS n_bow
                  FROM documents),
            s AS (SELECT 1 AS stage_ord, 'all' AS stage, total AS n_docs, total FROM m
                  UNION ALL
                  SELECT 2, 'exact', n_exact, total FROM m
                  UNION ALL
                  SELECT 3, 'prefix64', n_prefix, total FROM m
                  UNION ALL
                  SELECT 4, 'bag_of_words', n_bow, total FROM m)
         SELECT stage_ord, stage, n_docs,
                floor(CAST(n_docs AS DOUBLE) / total * 10000 + 0.5) / 10000
                  AS keep_ratio
         FROM s ORDER BY stage_ord""",
    "q_llm_prefix_dedup" ->
      """SELECT md5(substr(text, 1, 64)) AS prefix_key,
              min(doc_id) AS canonical, count(*) AS n
         FROM documents
         GROUP BY 1 HAVING count(*) >= 2
         ORDER BY prefix_key""",
    "q_llm_len_pctile" ->
      """WITH p AS (SELECT doc_id, lang, n_chars,
                         percent_rank() OVER (PARTITION BY lang
                                              ORDER BY n_chars) AS pr
                  FROM documents)
         SELECT doc_id, lang, n_chars,
                floor(pr * 10000 + 0.5) / 10000 AS pr,
                CASE WHEN pr <= 0.02 THEN 'low' ELSE 'high' END AS tail
         FROM p WHERE pr <= 0.02 OR pr >= 0.98
         ORDER BY doc_id""",
    "q_events_dwell" ->
      """WITH s AS (SELECT user_id, event_type, event_id,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec
                  FROM events),
            g AS (SELECT event_type,
                         lead(sec, 1) OVER (PARTITION BY user_id
                                            ORDER BY sec, event_id)
                           - sec AS gap
                  FROM s)
         SELECT event_type, count(*) AS n_gaps,
                floor(CAST(sum(gap) AS DOUBLE) / count(*) * 10000 + 0.5)
                  / 10000 AS avg_gap_s,
                max(gap) AS max_gap_s
         FROM g WHERE gap IS NOT NULL
         GROUP BY event_type ORDER BY event_type"""
  )
}
