package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-5 surface growth (SURVEY §2.8/§2.9/§2.10 extensions): line-level
  * corpus dedup, PII masking, cohort retention, per-group mode, stratified
  * sampling, and integer-exact anomaly flagging. Reference implements
  * nothing (SURVEY.md §0); semantics follow the public training-data-
  * pipeline and event-analytics literature (C4/CCNet line dedup, cohort
  * retention matrices).
  *
  * Scale design notes inline; every operator is map-only or shuffles on
  * bounded, well-distributed keys — no all-pairs work, no driver state.
  */
object AnalyticsOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def h32(s: SparkSession, c: Column): Column =
    graft.functions.PortableHash32.portableHash32(s, c)

  /** Line-dedup window: 5 consecutive tokens per "line" (the corpus has
    * no newlines, so fixed token windows stand in for physical lines —
    * same operator shape as C4's duplicated-line removal). */
  private val W = 5

  /** Shared per-user RFM relation (Recency/Frequency/Monetary): one
    * bounded-key agg of raw events to one row per user, the corpus max
    * date riding a 1-row broadcast. Both the exact (ntile) and sketch
    * (percentile-threshold) quartile readouts score THIS relation. */
  private def rfmBase(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        Det.cents(col("value"), 2).as("cents"))
    val per = ev.groupBy("user_id")
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("freq"), sum(col("cents")).as("cents"))
    val maxd = ev.agg(max(col("day")).as("maxd"))
    per.crossJoin(broadcast(maxd))
      .select(col("user_id"),
        datediff(col("maxd"), col("last_day")).as("recency_d"),
        col("freq"), col("cents"))
  }

  val queries: Map[String, QueryFn] = Map(
    // Line-level corpus dedup (C4/CCNet shape): chunk every doc into
    // 5-token "lines", drop every line whose exact text occurs more than
    // once ACROSS THE CORPUS (boilerplate, headers, near-dup overlap),
    // and reassemble each doc from its surviving lines in order. Emits
    // per-doc kept/total counts plus an md5 of the cleaned text (compact
    // oracle-checkable proof of the reassembled string).
    // Shape: map-only chunking (no shuffle), ONE shuffle on the line key
    // (a full-partition count window — partitioning by line replaces the
    // groupBy+self-join twin, which would shuffle the same chunk rows
    // twice), then one per-doc agg. The line key is high-cardinality and
    // well distributed; at 100 TB this is two clean exchanges total.
    "q_llm_line_dedup" -> ((s, d) => {
      val nch = ceil(size(col("toks")).cast("double") / W).cast("int")
      val chunkArr = transform(sequence(lit(0), nch - 1),
        i => array_join(slice(col("toks"), i * W + 1, lit(W)), " "))
      val chunks = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
      chunks
        .withColumn("c", count(lit(1)).over(Window.partitionBy("chunk")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_chunks"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("kept_chunks"),
          md5(concat_ws(" ", transform(
            array_sort(collect_list(
              when(col("c") === 1, struct(col("pos"), col("chunk"))))),
            x => x.getField("chunk")))).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // PII masking (map-only redaction pass every public training corpus
    // runs): replace email addresses then digit runs with typed mask
    // tokens, counting each. The input line synthesizes an email from
    // user_id so the email path is exercised; props carries real digits.
    // Both regexes are RE2-and-Java-compatible (no lookaround/backrefs),
    // so Spark and the DuckDB oracle transform identically. Shape: pure
    // scan projection — zero shuffles at any scale.
    "q_llm_pii_mask" -> ((s, d) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
      val raw = concat(col("event_type"), lit(" user"),
        col("user_id").cast("string"), lit("@example.com "), col("props"))
      t(s, d, "events")
        .select(col("event_id"), raw.as("raw"))
        .withColumn("n_emails",
          size(regexp_extract_all(col("raw"), lit(emailPat), lit(0))))
        .withColumn("m1",
          regexp_replace(col("raw"), emailPat, "<EMAIL>"))
        .withColumn("n_nums",
          size(regexp_extract_all(col("m1"), lit("[0-9]+"), lit(0))))
        .select(col("event_id"), col("n_emails"), col("n_nums"),
          regexp_replace(col("m1"), "[0-9]+", "<NUM>").as("masked"))
        .orderBy("event_id")
    }),

    // Cohort retention matrix (the standard event-analytics readout):
    // cohort = each user's first active DATE; cell (cohort, offset) =
    // distinct users of that cohort active offset days later. Shape:
    // distinct on (user, day) → per-user min → join back on user_id
    // (both sides pre-aggregated, the cohort side one row per user —
    // broadcast-able) → final bounded-key agg. No raw-event self-join at
    // any scale.
    "q_retention_cohort" -> ((s, d) => {
      val ud = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val cohort = ud.groupBy("user_id").agg(min(col("day")).as("cohort_d"))
      ud.join(cohort, "user_id")
        .select(col("cohort_d"),
          datediff(col("day"), col("cohort_d")).as("offset_d"),
          col("user_id"))
        .groupBy("cohort_d", "offset_d")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_d", "offset_d")
    }),

    // Per-group MODE with a total tie-break (most frequent event_type per
    // user; ties broken to the lexicographically smallest type). Shape:
    // one hash agg on the bounded (user, type) key, then a tiny per-user
    // window — the window input is already one row per (user, type), so
    // the sort is over group counts, not raw events.
    "q_agg_mode" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type").asc)
      t(s, d, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"),
          col("n").as("n_events"))
        .orderBy("user_id")
    }),

    // Stratified sampling: EXACTLY 5 docs per source stratum, picked by
    // smallest portable hash (deterministic across engines, runs, and
    // cluster sizes — the fixed-count counterpart of q_llm_mix_sample's
    // rate-based pass). Shape: one window per stratum over the hash; at
    // 100 TB the per-stratum top-k runs as WindowGroupLimit (rank-limit
    // pushdown), never a full sort of the corpus.
    "q_llm_strat_sample" -> ((s, d) => {
      val h = h32(s, concat(lit("strat:"), col("doc_id").cast("string")))
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), h.as("h"))
        .withColumn("pick_rank", row_number().over(w))
        .filter(col("pick_rank") <= 5)
        .select(col("doc_id"), col("source"), col("pick_rank"))
        .orderBy("source", "pick_rank")
    }),

    // Time-series gap fill: regularize the per-user event stream onto a
    // dense hourly grid (missing hours explicit with zero counts) — what
    // any downstream forecasting/rate job consumes. Shape: per-user agg
    // of actuals (one bounded-key shuffle); the grid is generated by
    // exploding a compact per-user sequence against the broadcast global
    // [min,max] hour bounds (map-side, never a materialized cross join
    // input); the left join is co-partitioned on (user, hour). At 100 TB
    // grid size is users x hours — orders smaller than the event count.
    "q_gapfill_hourly" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long")
          .as("hour_s"),
        Det.cents(col("value"), 2).as("cents"))
      val actual = ev.groupBy("user_id", "hour_s")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_c"))
      val bounds = ev.agg(min(col("hour_s")).as("lo"), max(col("hour_s")).as("hi"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_s"))
      grid.join(actual, Seq("user_id", "hour_s"), "left")
        .select(col("user_id"), col("hour_s"),
          coalesce(col("n"), lit(0L)).as("n"),
          (coalesce(col("sum_c"), lit(0L)).cast("double") / 100).as("val_sum"))
        .orderBy("user_id", "hour_s")
    }),

    // Last-touch attribution (the standard conversion-credit readout):
    // each purchase is credited to the user's latest PRECEDING
    // non-purchase event type; purchases with no prior touch go to
    // 'direct'. Per channel: conversions + exact-cents revenue.
    // Ordering is the portable (epoch second, event_id) key (§2.0).
    // Shape: ONE window shuffle on user_id (last over a preceding-rows
    // frame with ignoreNulls — no self-join against the event history),
    // then a hash agg on the tiny channel key.
    "q_events_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), Det.cents(col("value"), 2).as("cents"))
        .withColumn("touch", last(
          when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          (sum(col("cents")).cast("double") / 100).as("revenue"))
        .orderBy("channel")
    }),

    // RFM segmentation (the classic customer-analytics readout): per
    // user, Recency (days since last activity vs the corpus max date),
    // Frequency (event count), Monetary (exact cents sum); each scored
    // into quartiles by ntile(4) over a TOTAL order (metric, then
    // user_id — a tie-broken order is what makes ntile deterministic
    // and portable). Shape: one bounded-key agg to a per-user relation,
    // then three tiny windows over that relation (one row per user,
    // never raw events); the corpus max date is a 1-row broadcast.
    "q_events_rfm" -> ((s, d) => {
      val base = rfmBase(s, d)
      def q(c: String, asc: Boolean) = ntile(4).over(
        Window.orderBy(
          (if (asc) col(c).asc else col(c).desc), col("user_id").asc))
      base
        .withColumn("r_q", q("recency_d", asc = true)) // recent = best
        .withColumn("f_q", q("freq", asc = false))
        .withColumn("m_q", q("cents", asc = false))
        .select(col("user_id"), col("recency_d"), col("freq"),
          (col("cents").cast("double") / 100).as("monetary"),
          col("r_q"), col("f_q"), col("m_q"),
          (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("rfm"))
        .orderBy("user_id")
    }),

    // The 100 TB twin of q_events_rfm (the one global-rank readout that
    // lacked a sketch form — VERDICT r15 missing #4): the three exact
    // ntile(4) windows, each a single-partition sort of EVERY user,
    // are replaced by one 1-row percentile sketch over the per-user
    // relation (three quartile-boundary arrays in one agg) broadcast
    // back for MAP-SIDE quartile assignment — no window anywhere, so
    // the plan scales with users. Quartile direction mirrors the exact
    // form (low recency = best; high freq/monetary = best). Readout is
    // per (dimension, quartile): population + mean metric — the
    // segmentation summary a scaled pipeline consumes. No oracle by
    // design (sketch boundaries are approximate and ties at a boundary
    // land differently than the tie-broken ntile); OperatorSpec gates
    // each quartile's population within tolerance of n/4 and asserts
    // the mean-metric ordering per dimension; PlanSpec pins no-Window.
    // Shape: one per-user agg shuffle, one 1-row sketch agg, a
    // map-only explode, ONE bounded (3x4-key) readout agg.
    "q_events_rfm_approx" -> ((s, d) => {
      val base = rfmBase(s, d)
      val th = base.agg(
        percentile_approx(col("recency_d"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("tr"),
        percentile_approx(col("freq"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("tf"),
        percentile_approx(col("cents"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("tm"))
      def up(v: Column, t: Column) = // ascending: above boundary -> worse
        (lit(1) + when(v > t(0), 1).otherwise(0)
          + when(v > t(1), 1).otherwise(0)
          + when(v > t(2), 1).otherwise(0)).cast("int")
      def down(v: Column, t: Column) = // descending: below boundary -> worse
        (lit(1) + when(v < t(2), 1).otherwise(0)
          + when(v < t(1), 1).otherwise(0)
          + when(v < t(0), 1).otherwise(0)).cast("int")
      base.crossJoin(broadcast(th))
        .select(explode(array(
          struct(lit("recency").as("dim"),
            up(col("recency_d"), col("tr")).as("q"),
            col("recency_d").cast("double").as("v")),
          struct(lit("frequency").as("dim"),
            down(col("freq"), col("tf")).as("q"),
            col("freq").cast("double").as("v")),
          struct(lit("monetary").as("dim"),
            down(col("cents"), col("tm")).as("q"),
            (col("cents").cast("double") / 100).as("v")))).as("e"))
        .groupBy(col("e.dim").as("dim"), col("e.q").as("q"))
        .agg(count(lit(1)).as("n_users"), avg(col("e.v")).as("mean_metric"))
        .orderBy("dim", "q")
    }),

    // Skip-gram co-occurrence extraction (window ±2) — the word2vec/SGNS
    // training-pair primitive: every UNORDERED token pair within two
    // positions of each other, counted corpus-wide, with the
    // distance-1 vs distance-2 split kept (SGNS weights pairs by
    // distance; the split is the input to that weighting).
    // q_llm_pmi_bigrams is the ORDERED adjacent-pair collocation
    // statistic ranked by PMI; this is the raw windowed pair extraction
    // ranked by support. Pure integer counts — nothing to fixed-point.
    // Shape: pair generation is map-only (an in-row transform over the
    // token array at each distance — never a positions self-join), then
    // ONE count shuffle on the pair key and a TakeOrderedAndProject
    // top-40. At 100 TB: window size bounds the blowup at 2× tokens,
    // and the pair-key agg is the same bounded-vocab shuffle as the
    // n-gram ops.
    "q_llm_cooccur" -> ((s, d) => {
      val tk = col("t")
      def pairsAt(k: Int): Column =
        when(size(tk) > k,
          transform(sequence(lit(1), size(tk) - k), i => struct(
            least(element_at(tk, i), element_at(tk, i + k)).as("w1"),
            greatest(element_at(tk, i), element_at(tk, i + k)).as("w2"),
            lit(k).as("dist"))))
          .otherwise(array().cast(
            "array<struct<w1:string,w2:string,dist:int>>"))
      // §2.5 fan-out before the windowed pair explode, GATED on scan
      // parallelism (ScanFront): the downstream shuffle keys on (w1,w2),
      // not doc_id — on a split table this exchange would be a pure
      // corpus-sized text shuffle, so it fires only when the scan is a
      // single task (the one-row-group fixture).
      ScanFront.fanOut(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          col("doc_id"))
        .select(split(col("text"), " ").as("t"))
        .select(explode(concat(pairsAt(1), pairsAt(2))).as("p"))
        .select(col("p.w1"), col("p.w2"), col("p.dist"))
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dist") === 1, 1L).otherwise(0L)).as("n_adj"),
          sum(when(col("dist") === 2, 1L).otherwise(0L)).as("n_skip"))
        .orderBy(col("n_pairs").desc, col("w1"), col("w2"))
        .limit(40)
    }),

    // PMI collocation mining (pointwise mutual information over corpus
    // bigrams — the classic collocation statistic): pmi(a,b) =
    // ln(c_ab·T_uni² / (T_bi·c_a·c_b)), support-filtered, top-20 by
    // score. Every count is an exact BIGINT; the log's rational argument
    // stays under 2^53 so num/den is exact in both engines, and the one
    // ln is micros-floored (the q_llm_unigram_logprob discipline).
    // Shape: one unigram agg + one bigram agg (both bounded keys), two
    // broadcast joins of per-term counts onto the bigram relation, and
    // a TakeOrderedAndProject top-20 — no corpus self-joins.
    "q_llm_pmi_bigrams" -> ((s, d) => {
      val toks = split(col("text"), " ")
      // §2.5 fan-out, GATED on scan parallelism (ScanFront): both the
      // unigram and bigram branches explode from this relation, so on
      // the one-task fixture scan the shared exchange runs the tokenize
      // once, 32-way, instead of twice single-core. Downstream keys are
      // w/bigram, not doc_id — on a split table the shared-tokenize
      // benefit would cost a corpus-sized text shuffle, so each branch
      // re-tokenizes from the parallel scan instead (map work ×2 beats
      // shuffling the corpus once).
      val base = ScanFront.fanOut(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          col("doc_id"))
        .select(col("doc_id"), toks.as("toks"))
      val uni = base.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val tu = uni.agg(sum(col("c")).as("t_uni"))
      val bigrams = base.filter(size(col("toks")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1"), col("b.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      val tb = bigrams.agg(sum(col("c_ab")).as("t_bi"))
      bigrams.filter(col("c_ab") >= 5)
        .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c_a"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c_b"))), "w2")
        .crossJoin(broadcast(tu)).crossJoin(broadcast(tb))
        .withColumn("pmi_u", floor(log(
          (col("c_ab") * col("t_uni") * col("t_uni")).cast("double") /
            (col("t_bi") * col("c_a") * col("c_b")).cast("double"))
          * 1e6 + 0.5).cast("long"))
        .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
          col("c_ab"),
          Det.r(col("pmi_u").cast("double") / 1e6, 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(20)
    }),

    // Table profiling (the engine-utility DESCRIBE/summarize pass a
    // data platform runs before anything else): per column — null
    // count, exact distinct count, lexicographic/numeric min and max,
    // all in ONE scan, unpivoted to one row per column; values surface
    // as strings under portable renderings (dates as ISO strings,
    // money as exact cents).
    //
    // Shape note (round-11 rewrite): the obvious single-agg form
    // (count_if + count_distinct + min/max in one .agg) plans min/max
    // over the STRING column into the same aggregate as the
    // count_distinct Expand — and a string aggregation buffer is not
    // UnsafeRow-mutable, so Catalyst demotes the whole chain to
    // SortAggregate: every expanded row (4x the table) gets fully
    // sorted by a mixed (double, string, timestamp, gid) key. That
    // sort is the scale killer (4.1 s at sf0.1; unbounded at 100 TB).
    // Rewritten as a manual two-level distinct: stack() one tagged row
    // per profiled column, hash-aggregate on (gid, value) — count
    // buffer only, so it stays HashAggregate with map-side combine —
    // then fold the ~|distinct| survivors with conditional aggregates
    // in a KEYLESS aggregate (no grouping ⇒ no sort requirement even
    // for the string min/max). Distinct counts are exact (group-then-
    // count), null counts ride the null group's cnt, and min/max over
    // distinct values equals min/max over all values.
    "q_agg_profile" -> ((s, d) => {
      val o = t(s, d, "orders")
      val expanded = o.select(expr(
        """stack(3,
             0, o_orderstatus, cast(null as double), cast(null as timestamp_ntz),
             1, cast(null as string), o_totalprice, cast(null as timestamp_ntz),
             2, cast(null as string), cast(null as double), o_orderdate
           ) as (gid, st, tp, od)"""))
      val lvl1 = expanded.groupBy("gid", "st", "tp", "od")
        .agg(count(lit(1)).as("cnt"))
      val row = lvl1.agg(
        sum(when(col("gid") === 0, col("cnt"))).as("n_rows"),
        coalesce(sum(when(col("gid") === 0 && col("st").isNull, col("cnt"))), lit(0L)).as("null_st"),
        count(when(col("gid") === 0, col("st"))).as("dist_st"),
        min(when(col("gid") === 0, col("st"))).as("min_st"),
        max(when(col("gid") === 0, col("st"))).as("max_st"),
        coalesce(sum(when(col("gid") === 1 && col("tp").isNull, col("cnt"))), lit(0L)).as("null_tp"),
        count(when(col("gid") === 1, col("tp"))).as("dist_tp"),
        min(when(col("gid") === 1, Det.cents(col("tp"), 2))).as("min_tp"),
        max(when(col("gid") === 1, Det.cents(col("tp"), 2))).as("max_tp"),
        coalesce(sum(when(col("gid") === 2 && col("od").isNull, col("cnt"))), lit(0L)).as("null_od"),
        count(when(col("gid") === 2, col("od"))).as("dist_od"),
        min(when(col("gid") === 2, to_date(col("od")))).as("min_od"),
        max(when(col("gid") === 2, to_date(col("od")))).as("max_od"))
      row.select(col("n_rows"), expr(
        """stack(3,
             'o_orderstatus', null_st, dist_st, min_st, max_st,
             'o_totalprice',  null_tp, dist_tp, cast(min_tp as string), cast(max_tp as string),
             'o_orderdate',   null_od, dist_od, cast(min_od as string), cast(max_od as string)
           ) as (column_name, n_nulls, n_distinct, min_s, max_s)"""))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy("column_name")
    }),

    // HLL twin of q_agg_profile — the 100 TB form of the profiling
    // pass. Exact per-column count_distinct is the one primitive in the
    // profile that gets expensive at scale: Catalyst plans N distinct
    // aggregates as an Expand (N copies of every input row) plus a
    // shuffle keyed by each column's full value domain. The HLL++
    // sketch version is a plain one-row aggregate — map-side combined,
    // no Expand, fixed-size state per column — at the standard ~2%
    // relative error. Same output shape as the exact profile.
    // Approximate ⇒ declared no-oracle; OperatorSpec asserts each
    // sketched count within 10% of the exact profile's.
    "q_agg_profile_approx" -> ((s, d) => {
      val o = t(s, d, "orders")
      val row = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("null_st"),
        approx_count_distinct(col("o_orderstatus")).as("dist_st"),
        min(col("o_orderstatus")).as("min_st"),
        max(col("o_orderstatus")).as("max_st"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_tp"),
        approx_count_distinct(col("o_totalprice")).as("dist_tp"),
        min(Det.cents(col("o_totalprice"), 2)).as("min_tp"),
        max(Det.cents(col("o_totalprice"), 2)).as("max_tp"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_od"),
        approx_count_distinct(col("o_orderdate")).as("dist_od"),
        min(to_date(col("o_orderdate"))).as("min_od"),
        max(to_date(col("o_orderdate"))).as("max_od"))
      row.select(col("n_rows"), expr(
        """stack(3,
             'o_orderstatus', null_st, dist_st, min_st, max_st,
             'o_totalprice',  null_tp, dist_tp, cast(min_tp as string), cast(max_tp as string),
             'o_orderdate',   null_od, dist_od, cast(min_od as string), cast(max_od as string)
           ) as (column_name, n_nulls, n_distinct, min_s, max_s)"""))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy("column_name")
    }),

    // Anomaly flagging with integer-exact math: events whose value
    // exceeds 3x their user's mean. The comparison is pure integer
    // arithmetic (cents * count > 3 * cents_sum) — no FP mean, so the
    // flag set is bit-identical on any engine and any partitioning (an
    // FP mean's last ulp can flip boundary rows between engines). Shape:
    // per-user agg (map-side combined) + join back on user_id; the
    // per-user stats relation is one row per user — broadcast-able.
    "q_events_anomaly" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          Det.cents(col("value"), 2).as("cents"))
      val stats = ev.groupBy("user_id")
        .agg(sum(col("cents")).as("sum_c"), count(lit(1)).as("cnt"))
      ev.join(broadcast(stats), "user_id")
        .filter(col("cents") * col("cnt") > lit(3L) * col("sum_c"))
        .select(col("event_id"), col("user_id"),
          Det.r2(col("value")).as("value_r"),
          Det.r2(col("cents").cast("double") * col("cnt") / col("sum_c"))
            .as("x_mean"))
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_llm_line_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             chunks AS (
               SELECT doc_id, u.i AS pos,
                      array_to_string(t[(u.i*$W+1):(u.i*$W+$W)], ' ') AS chunk
               FROM toks, unnest(range(0, CAST(ceil(len(t)/$W.0) AS BIGINT))) AS u(i)),
             counted AS (SELECT chunk, count(*) AS c FROM chunks GROUP BY 1)
         SELECT ch.doc_id, count(*) AS total_chunks,
                CAST(SUM(CASE WHEN ct.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
                md5(coalesce(string_agg(CASE WHEN ct.c = 1 THEN ch.chunk END,
                                        ' ' ORDER BY ch.pos), '')) AS clean_md5
         FROM chunks ch JOIN counted ct USING (chunk)
         GROUP BY ch.doc_id ORDER BY ch.doc_id""",
    "q_llm_pii_mask" ->
      """WITH raw AS (
           SELECT event_id,
                  event_type || ' user' || CAST(user_id AS VARCHAR)
                    || '@example.com ' || props AS raw
           FROM events),
         m AS (
           SELECT event_id, raw,
                  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INTEGER) AS n_emails,
                  regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g') AS m1
           FROM raw)
         SELECT event_id, n_emails,
                CAST(len(regexp_extract_all(m1, '[0-9]+')) AS INTEGER) AS n_nums,
                regexp_replace(m1, '[0-9]+', '<NUM>', 'g') AS masked
         FROM m ORDER BY event_id""",
    "q_retention_cohort" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
              c AS (SELECT user_id, min(day) AS cohort_d FROM ud GROUP BY 1)
         SELECT c.cohort_d,
                CAST(date_diff('day', c.cohort_d, ud.day) AS INTEGER) AS offset_d,
                count(DISTINCT ud.user_id) AS n_users
         FROM ud JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_agg_mode" ->
      """SELECT user_id, event_type AS mode_type, n AS n_events FROM (
           SELECT user_id, event_type, count(*) AS n,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY count(*) DESC, event_type ASC) AS rn
           FROM events GROUP BY user_id, event_type) t
         WHERE rn = 1 ORDER BY user_id""",
    "q_llm_strat_sample" ->
      """SELECT doc_id, source, pick_rank FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (
                    PARTITION BY source
                    ORDER BY ('0x'||substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                             doc_id) AS INTEGER) AS pick_rank
           FROM documents) t
         WHERE pick_rank <= 5 ORDER BY source, pick_rank""",
    "q_gapfill_hourly" ->
      """WITH ev AS (SELECT user_id,
                            CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS hour_s,
                            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                     FROM events),
              actual AS (SELECT user_id, hour_s, count(*) AS n,
                                CAST(sum(cents) AS BIGINT) AS sum_c
                         FROM ev GROUP BY 1, 2),
              grid AS (SELECT u.user_id, g.hour_s
                       FROM (SELECT DISTINCT user_id FROM ev) u,
                            (SELECT unnest(range((SELECT min(hour_s) FROM ev),
                                                 (SELECT max(hour_s) FROM ev) + 1,
                                                 3600)) AS hour_s) g)
         SELECT g.user_id, g.hour_s,
                coalesce(a.n, 0) AS n,
                CAST(coalesce(a.sum_c, 0) AS DOUBLE) / 100 AS val_sum
         FROM grid g LEFT JOIN actual a USING (user_id, hour_s)
         ORDER BY user_id, hour_s""",
    "q_events_attribution" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
                            CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                     FROM events),
              tch AS (SELECT *,
                        last_value(CASE WHEN event_type <> 'purchase'
                                        THEN event_type END IGNORE NULLS)
                          OVER (PARTITION BY user_id
                                ORDER BY sec, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS touch
                      FROM ev)
         SELECT coalesce(touch, 'direct') AS channel,
                count(*) AS n_purchases,
                CAST(sum(cents) AS DOUBLE) / 100 AS revenue
         FROM tch WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY channel""",
    "q_events_rfm" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
                            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                     FROM events),
              per AS (SELECT user_id, max(day) AS last_day, count(*) AS freq,
                             CAST(sum(cents) AS BIGINT) AS cents
                      FROM ev GROUP BY 1),
              mx AS (SELECT max(day) AS maxd FROM ev),
              base AS (SELECT user_id,
                              CAST(date_diff('day', last_day, maxd) AS INTEGER) AS recency_d,
                              freq, cents
                       FROM per CROSS JOIN mx)
         SELECT user_id, recency_d, freq,
                CAST(cents AS DOUBLE) / 100 AS monetary,
                r_q, f_q, m_q,
                r_q * 100 + f_q * 10 + m_q AS rfm
         FROM (SELECT *,
                 CAST(ntile(4) OVER (ORDER BY recency_d ASC, user_id ASC) AS INTEGER) AS r_q,
                 CAST(ntile(4) OVER (ORDER BY freq DESC, user_id ASC) AS INTEGER) AS f_q,
                 CAST(ntile(4) OVER (ORDER BY cents DESC, user_id ASC) AS INTEGER) AS m_q
               FROM base) t
         ORDER BY user_id""",
    "q_llm_cooccur" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
              p1 AS (SELECT least(t[i], t[i+1]) AS w1,
                            greatest(t[i], t[i+1]) AS w2, 1 AS dist
                     FROM tk, unnest(range(1, len(t))) AS u(i)
                     WHERE len(t) > 1),
              p2 AS (SELECT least(t[i], t[i+2]) AS w1,
                            greatest(t[i], t[i+2]) AS w2, 2 AS dist
                     FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
                     WHERE len(t) > 2),
              p AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         SELECT w1, w2, count(*) AS n_pairs,
                CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_adj,
                CAST(sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_skip
         FROM p GROUP BY 1, 2
         ORDER BY n_pairs DESC, w1, w2 LIMIT 40""",
    "q_llm_pmi_bigrams" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
              uni AS (SELECT w, count(*) AS c
                      FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
              tu AS (SELECT CAST(sum(c) AS BIGINT) AS t_uni FROM uni),
              bg AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                              i -> t[i] || ' ' || t[i+1])) AS b
                     FROM tk WHERE len(t) >= 2),
              bgc AS (SELECT b, count(*) AS c_ab FROM bg GROUP BY b),
              tb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS t_bi FROM bgc),
              sc AS (SELECT bgc.b AS bigram, bgc.c_ab,
                            CAST(floor(ln(CAST(bgc.c_ab * tu.t_uni * tu.t_uni AS DOUBLE)
                                          / CAST(tb.t_bi * ua.c * ub.c AS DOUBLE))
                                       * 1000000 + 0.5) AS BIGINT) AS pmi_u
                     FROM bgc
                     JOIN uni ua ON ua.w = string_split(bgc.b, ' ')[1]
                     JOIN uni ub ON ub.w = string_split(bgc.b, ' ')[2]
                     CROSS JOIN tu CROSS JOIN tb
                     WHERE bgc.c_ab >= 5)
         SELECT bigram, c_ab,
                floor(CAST(pmi_u AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000 AS pmi
         FROM sc ORDER BY pmi DESC, bigram LIMIT 20""",
    "q_agg_profile" ->
      """WITH a AS (SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_st,
                count(DISTINCT o_orderstatus) AS dist_st,
                min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st,
                CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_tp,
                count(DISTINCT o_totalprice) AS dist_tp,
                min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_tp,
                max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_tp,
                CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_od,
                count(DISTINCT o_orderdate) AS dist_od,
                min(CAST(o_orderdate AS DATE)) AS min_od,
                max(CAST(o_orderdate AS DATE)) AS max_od
              FROM orders)
         SELECT * FROM (
           SELECT 'o_orderstatus' AS column_name, n_rows, null_st AS n_nulls,
                  dist_st AS n_distinct, min_st AS min_s, max_st AS max_s FROM a
           UNION ALL
           SELECT 'o_totalprice', n_rows, null_tp, dist_tp,
                  CAST(min_tp AS VARCHAR), CAST(max_tp AS VARCHAR) FROM a
           UNION ALL
           SELECT 'o_orderdate', n_rows, null_od, dist_od,
                  CAST(min_od AS VARCHAR), CAST(max_od AS VARCHAR) FROM a)
         ORDER BY column_name""",
    "q_events_anomaly" ->
      """WITH ev AS (SELECT event_id, user_id, value,
                            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                     FROM events),
              st AS (SELECT user_id, CAST(sum(cents) AS BIGINT) AS sum_c,
                            count(*) AS cnt
                     FROM ev GROUP BY user_id)
         SELECT ev.event_id, ev.user_id,
                floor(ev.value * 100 + 0.5) / 100 AS value_r,
                floor(CAST(ev.cents AS DOUBLE) * st.cnt / st.sum_c * 100 + 0.5) / 100 AS x_mean
         FROM ev JOIN st USING (user_id)
         WHERE ev.cents * st.cnt > 3 * st.sum_c
         ORDER BY ev.event_id"""
  )
}
