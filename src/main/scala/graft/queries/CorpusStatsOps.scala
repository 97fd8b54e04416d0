package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-statistics operators for training-data analysis (round 9):
  * exact heavy hitters via a Misra-Gries candidate pass, the Zipf
  * rank-frequency readout, and duplicated-span detection (the exact
  * n-gram form of substring dedup). Reference implements none
  * (SURVEY.md §0 — /root/reference has zero source files); capabilities
  * derive from the driver north star (LLM-pipeline text analysis).
  *
  * Scale notes inline — every operator is map-only gram/token generation
  * plus one or two bounded-key shuffles; no all-pairs work, no
  * driver-side loops.
  */
object CorpusStatsOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Heavy-hitter threshold denominator: report terms with count > N/K. */
  private val K = 200

  /** Duplicated-span gram width (tokens). */
  private val SpanK = 10

  /** Vocabulary size for the OOV-coverage readout (top-V corpus terms). */
  private val V = 512

  /** Per-term Jensen-Shannon contribution for a term PRESENT in P:
    * p·ln(p/m) + q·ln(q/m) with m = (p+q)/2, nano-floored to a long
    * from exact integer inputs (the NMI/PMI fixed-point rule). Shared
    * by q_llm_js_drift and the streaming drift monitor (StreamingSpec)
    * so batch and serve paths are the same expression tree. */
  private[graft] def jsTermU(cSt: Column, nS: Column, cT: Column,
      n: Column): Column = {
    val p = cSt.cast("double") / nS
    val qd = cT.cast("double") / n
    val m = (p + qd) / lit(2)
    floor((p * log(p / m) + qd * log(qd / m)) * 1e9 + 0.5).cast("long")
  }

  /** Closed-form mass of the terms ABSENT from P: each contributes
    * exactly q·ln 2, so the total is ln2·(N − Σ_present c_t)/N — one
    * nano-floored long, never a materialized absent-term relation. */
  private[graft] def jsAbsentU(covC: Column, n: Column): Column =
    floor(lit(math.log(2.0)) * (n - covC).cast("double") / n * 1e9 + 0.5)
      .cast("long")

  val queries: Map[String, QueryFn] = Map(
    // Exact corpus heavy hitters (count > N/200) by the standard
    // two-pass scheme: pass 1 runs the Misra-Gries bounded summary
    // (functions/MisraGries.scala) as a typed Aggregator — map-side
    // state is ≤ K-1 counters per partition REGARDLESS of vocabulary
    // width, the property a plain groupBy lacks on an unbounded token
    // stream — whose output is a guaranteed candidate superset; pass 2
    // broadcasts the ≤ K-1 candidates, re-counts them exactly, and
    // applies the true threshold. Output is exact and deterministic
    // (any candidate superset yields identical final rows), so the
    // oracle is plain SQL. N rides a separate count-only scan (no
    // shuffle; at 100 TB it reads parquet row-group stats, not data).
    "q_llm_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val tok = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val summary = tok.as[String]
        .select(graft.functions.MisraGries.agg(K).toColumn.name("mg"))
      val cand = summary.toDF("mg")
        .select(explode(map_keys(col("mg"))).as("term"))
      val tot = tok.agg(count(lit(1)).as("tot"))
      tok.join(broadcast(cand), "term")
        .groupBy("term").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .filter(col("n") * K > col("tot"))
        .select(col("term"), col("n"))
        .orderBy("term")
    }),

    // Zipf rank-frequency curve: top-50 terms with rank, count, share
    // and cumulative share — the one-page corpus fingerprint (a healthy
    // natural-language corpus tracks share ∝ 1/rank; a flat or cliffed
    // curve flags boilerplate or synthetic text). One count shuffle on
    // the term key (map-side combined), top-50 via TakeOrdered (no
    // global sort of the vocabulary), and the rank/cumsum window runs
    // on the 50-row result only — the single-partition window is on
    // the REDUCED relation, never the corpus. Shares are exact-integer
    // ratios rounded via Det.r, so the oracle hash-matches.
    "q_llm_zipf" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
      val tot = tf.agg(sum(col("n")).as("tot"))
      val top = tf.orderBy(col("n").desc, col("term")).limit(50)
      val w = Window.orderBy(col("n").desc, col("term"))
      top.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rank"), col("term"), col("n"),
          Det.r(col("n").cast("double") / col("tot"), 6).as("share"),
          Det.r(col("cum").cast("double") / col("tot"), 6).as("cum_share"))
        .orderBy("rank")
    }),

    // Duplicated-span detection — the exact-substring dedup readout
    // (Lee et al. 2022 "Deduplicating Training Data Makes Language
    // Models Better" measures corpora exactly this way): per doc, how
    // many of its 10-token spans also appear in ANOTHER doc. Winnowing
    // (q_llm_winnow_dup) is the sampled/offset-robust variant; this is
    // the exact per-position form. Shape: map-only gram generation
    // (transform over the token array — no shingle self-join), one
    // distinct-doc count shuffle on the gram key, one join back on the
    // same key, one per-doc agg. Grams travel as xxhash64 fingerprints
    // (8 bytes, not ~60-char strings) — the same 2^-64 collision
    // assumption as jaccardPairs (TextOps.scala:55-58), oracle-verified
    // over exact strings. Docs with < 10 tokens have no spans and drop
    // out (mirrored in the oracle).
    "q_llm_span_dedup" -> ((s, d) => {
      val tk = col("t")
      // §2.5 repartition before gram generation: one-row-group fixture =
      // one scan task, and BOTH the per-gram doc-count branch and the
      // probe side of the join regenerate the grams from the scan —
      // each single-core without this. The repartition exchange is
      // identical in both branches, so it is shuffled once (ReuseExchange)
      // and the xxhash64 gram kernel runs once, 32-way.
      val grams = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(when(size(tk) >= SpanK,
          transform(sequence(lit(1), size(tk) - (SpanK - 1)),
            i => xxhash64(concat_ws(" ",
              (0 until SpanK).map(j => element_at(tk, i + j)): _*))))
          .otherwise(array().cast("array<bigint>"))).as("g"))
      val df = grams.groupBy("g")
        .agg(count_distinct(col("doc_id")).as("docs"))
      grams.join(df, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
          Det.r(col("n_dup").cast("double") / col("n_spans"), 4)
            .as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Per-source distribution drift — Jensen-Shannon divergence between
    // each source's unigram distribution P and the whole-corpus
    // distribution Q (the domain-shift diagnostic a mixture pipeline
    // reads before reweighting: a source far from the corpus center is
    // either a valuable new domain or off-distribution junk). JS rather
    // than KL because it is symmetric, bounded by ln 2, and defined when
    // a source misses corpus terms. Determinism: each present term's
    // p·ln(p/m) + q·ln(q/m) contribution is nano-floored from identical
    // integer inputs and summed as longs (the NMI/PMI fixed-point rule);
    // terms ABSENT from a source contribute exactly q·ln 2, so their
    // total collapses to the closed form ln2·(N − Σ_present c_t)/N —
    // one more nano-floored long, never a materialized (source × absent
    // term) relation. Shape: one (source, term) count shuffle + the
    // bounded-vocab corpus counts and 1-row total riding broadcasts;
    // per-source totals broadcast too (sources are metadata-sized).
    "q_llm_js_drift" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
      val stf = tok.groupBy("source", "term").agg(count(lit(1)).as("c_st"))
      val src = stf.groupBy("source").agg(sum(col("c_st")).as("n_s"))
      val ctf = tok.groupBy("term").agg(count(lit(1)).as("c_t"))
      val tot = ctf.agg(sum(col("c_t")).as("n"))
      val agg = stf.join(broadcast(src), "source")
        .join(broadcast(ctf), "term")
        .crossJoin(broadcast(tot))
        .groupBy("source")
        .agg(max(col("n_s")).as("n_tokens"),
          count(lit(1)).as("n_terms"),
          sum(col("c_t")).as("cov_c"),
          max(col("n")).as("nn"),
          sum(jsTermU(col("c_st"), col("n_s"), col("c_t"), col("n")))
            .as("pres_u"))
      agg.select(col("source"), col("n_tokens"), col("n_terms"),
          Det.r((col("pres_u") + jsAbsentU(col("cov_c"), col("nn")))
            .cast("double") / 1e9 / 2, 4).as("js_div"))
        .orderBy("source")
    }),

    // Vocabulary coverage / OOV-rate readout: share of each source's
    // token stream covered by the top-V corpus vocabulary (V = 512,
    // count-desc with term tie-break, so the boundary is deterministic).
    // The tokenizer-planning twin of q_llm_zipf: a source with a high
    // OOV rate against the candidate vocab will fragment into bytes at
    // training time, and its token budget is mispriced until the vocab
    // grows. Pure integer counts; only the final coverage share rounds.
    // Shape: one bounded term-count shuffle + TakeOrdered top-V → the
    // V-row vocab BROADCASTS against the token scan as a left join
    // (corpus never shuffles on the term key); one per-source agg.
    "q_llm_vocab_coverage" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
      val vocab = tok.groupBy("term").agg(count(lit(1)).as("vn"))
        .orderBy(col("vn").desc, col("term")).limit(V)
        .select(col("term"), lit(1).as("iv"))
      tok.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"),
          count_distinct(when(col("iv").isNull, col("term")))
            .as("oov_terms"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          col("oov_terms"),
          Det.r(lit(1.0) - col("n_oov").cast("double") / col("n_tokens"), 4)
            .as("coverage"))
        .orderBy("source")
    }),

    // Lexical diversity per source — distinct-1 / distinct-2 (Li et al.
    // 2016): the share of unigrams and bigrams that are unique within
    // the source. The synthetic-text / template-boilerplate detector at
    // corpus granularity (q_llm_repetition is the per-doc form): a
    // source whose distinct-2 collapses is stamped from templates even
    // when every individual doc looks fine. Exact integer counts; only
    // the two ratios round. Shape: map-only in-row bigram generation
    // (never a positions self-join) + two (source-keyed) count-distinct
    // aggs joined on the metadata-sized source key.
    "q_llm_distinct_ngrams" -> ((s, d) => {
      val tk = col("t")
      val docs = t(s, d, "documents")
        .select(col("source"), split(col("text"), " ").as("t"))
      val uni = docs.select(col("source"), explode(tk).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_uni"), count_distinct(col("g")).as("d_uni"))
      val bi = docs.select(col("source"), explode(when(size(tk) > 1,
          transform(sequence(lit(1), size(tk) - 1),
            i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
          .otherwise(array().cast("array<string>"))).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bi"), count_distinct(col("g")).as("d_bi"))
      uni.join(bi, Seq("source"), "left")
        .select(col("source"), col("n_uni"), col("d_uni"),
          Det.r(col("d_uni").cast("double") / col("n_uni"), 4)
            .as("distinct1"),
          coalesce(col("n_bi"), lit(0L)).as("n_bi"),
          coalesce(col("d_bi"), lit(0L)).as("d_bi"),
          Det.r(coalesce(col("d_bi"), lit(0L)).cast("double")
            / greatest(coalesce(col("n_bi"), lit(0L)), lit(1L)), 4)
            .as("distinct2"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_llm_heavy_hitters" ->
      s"""WITH tf AS (SELECT term, count(*) AS n
                      FROM (SELECT unnest(string_split(text, ' ')) AS term
                            FROM documents)
                      GROUP BY term),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tf)
         SELECT term, n FROM tf CROSS JOIN tot
         WHERE n * $K > tot ORDER BY term""",
    "q_llm_zipf" ->
      """WITH tf AS (SELECT term, count(*) AS n
                     FROM (SELECT unnest(string_split(text, ' ')) AS term
                           FROM documents)
                     GROUP BY term),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tf),
              top AS (SELECT term, n,
                             row_number() OVER (ORDER BY n DESC, term)
                               AS rank
                      FROM tf ORDER BY n DESC, term LIMIT 50)
         SELECT CAST(rank AS INTEGER) AS rank, term, n,
                floor(CAST(n AS DOUBLE) / tot * 1000000 + 0.5) / 1000000
                  AS share,
                floor(CAST(sum(n) OVER (ORDER BY rank) AS DOUBLE) / tot
                      * 1000000 + 0.5) / 1000000 AS cum_share
         FROM top CROSS JOIN tot ORDER BY rank""",
    "q_llm_span_dedup" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              g AS (SELECT doc_id, array_to_string(t[i:i+${SpanK - 1}], ' ')
                             AS g
                    FROM tk, unnest(range(1, len(t) - ${SpanK - 2}))
                      AS u(i)
                    WHERE len(t) >= $SpanK),
              df AS (SELECT g, count(DISTINCT doc_id) AS docs
                     FROM g GROUP BY g)
         SELECT doc_id, count(*) AS n_spans,
                CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup,
                floor(CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
                  AS dup_ratio
         FROM g JOIN df USING (g)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_js_drift" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
                      FROM documents),
              stf AS (SELECT source, term, count(*) AS c_st
                      FROM tok GROUP BY 1, 2),
              src AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
                      FROM stf GROUP BY 1),
              ctf AS (SELECT term, count(*) AS c_t FROM tok GROUP BY 1),
              tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ctf),
              u AS (SELECT source, n_s, c_t, n,
                           CAST(floor((
                             (CAST(c_st AS DOUBLE) / n_s)
                               * ln((CAST(c_st AS DOUBLE) / n_s)
                                    / ((CAST(c_st AS DOUBLE) / n_s
                                        + CAST(c_t AS DOUBLE) / n) / 2))
                             + (CAST(c_t AS DOUBLE) / n)
                               * ln((CAST(c_t AS DOUBLE) / n)
                                    / ((CAST(c_st AS DOUBLE) / n_s
                                        + CAST(c_t AS DOUBLE) / n) / 2))
                           ) * 1000000000 + 0.5) AS BIGINT) AS u
                    FROM stf JOIN src USING (source) JOIN ctf USING (term)
                    CROSS JOIN tot),
              a AS (SELECT source, max(n_s) AS n_tokens, count(*) AS n_terms,
                           CAST(sum(c_t) AS BIGINT) AS cov_c, max(n) AS nn,
                           CAST(sum(u) AS BIGINT) AS pres_u
                    FROM u GROUP BY source)
         SELECT source, n_tokens, n_terms,
                floor(CAST(pres_u + CAST(floor(ln(2)
                        * CAST(nn - cov_c AS DOUBLE) / nn
                        * 1000000000 + 0.5) AS BIGINT) AS DOUBLE)
                      / 1e9 / 2 * 10000 + 0.5) / 10000 AS js_div
         FROM a ORDER BY source""",
    "q_llm_vocab_coverage" ->
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
                       FROM documents),
              v AS (SELECT term FROM (SELECT term, count(*) AS n
                                      FROM tok GROUP BY 1
                                      ORDER BY n DESC, term LIMIT $V)),
              j AS (SELECT tok.source, tok.term, v.term AS vt
                    FROM tok LEFT JOIN v ON tok.term = v.term)
         SELECT source, count(*) AS n_tokens,
                CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                CAST(count(DISTINCT CASE WHEN vt IS NULL THEN term END)
                     AS BIGINT) AS oov_terms,
                floor((1.0 - CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END)
                             AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000
                  AS coverage
         FROM j GROUP BY source ORDER BY source""",
    "q_llm_distinct_ngrams" ->
      """WITH tk AS (SELECT source, string_split(text, ' ') AS t
                     FROM documents),
              uni AS (SELECT source, count(*) AS n_uni,
                             CAST(count(DISTINCT g) AS BIGINT) AS d_uni
                      FROM (SELECT source, unnest(t) AS g FROM tk)
                      GROUP BY source),
              bi AS (SELECT source, count(*) AS n_bi,
                            CAST(count(DISTINCT g) AS BIGINT) AS d_bi
                     FROM (SELECT source, t[i] || ' ' || t[i+1] AS g
                           FROM tk, unnest(range(1, len(t))) AS u(i)
                           WHERE len(t) > 1)
                     GROUP BY source)
         SELECT source, n_uni, d_uni,
                floor(CAST(d_uni AS DOUBLE) / n_uni * 10000 + 0.5) / 10000
                  AS distinct1,
                COALESCE(n_bi, 0) AS n_bi, COALESCE(d_bi, 0) AS d_bi,
                floor(CAST(COALESCE(d_bi, 0) AS DOUBLE)
                      / greatest(COALESCE(n_bi, 0), 1) * 10000 + 0.5) / 10000
                  AS distinct2
         FROM uni LEFT JOIN bi USING (source) ORDER BY source"""
  )
}
