package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-9 data-quality / pipeline operators: batch sessionization (the
  * gap-rule form of the streaming session window), a per-source
  * boilerplate catalog, character-class profiling (mojibake / markup /
  * numeric-dump detection), and embedding-space outlier mining (the
  * prune-the-tail companion to SemDeDup). Reference implements none
  * (SURVEY.md §0 — /root/reference has zero source files); capabilities
  * derive from the driver north star (LLM training-data pipeline).
  *
  * Every operator is map-only generation plus bounded-key shuffles; the
  * only join is against a broadcast-sized side (per-source totals,
  * per-label centroids). Scale notes inline.
  */
object QualityOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Session gap rule (seconds): a pause longer than this starts a new
    * session — the classic 30-minute web-analytics convention. */
  private val Gap = 1800

  /** Boilerplate chunk width (tokens) — the same pseudo-line convention
    * as q_llm_line_dedup (the corpus carries no newlines; fixed-width
    * token chunks stand in for lines). Deliberately wider than
    * line-dedup's W=5: boilerplate templates are sentence-scale. */
  private val BW = 8

  val queries: Map[String, QueryFn] = Map(
    // Batch sessionization by the 30-minute gap rule — the batch twin of
    // q_stream_session (session_window), needed whenever sessions are
    // rebuilt from history rather than accumulated incrementally. Shape:
    // ONE shuffle on user_id serves both windows (lag + running sum share
    // the (user_id, ts, event_id) sort) and the per-session agg
    // repartitions by (user_id, session_id) — linear, no self-join, the
    // standard islands-and-gaps formulation. Gaps are computed on
    // second-truncated epochs (§2.0 timestamp rule) so both engines
    // compare identical integers; event_id breaks same-timestamp ties.
    "q_events_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("es"))
      val gap = col("es") - lag(col("es"), 1).over(w)
      ev.withColumn("is_new",
          when(gap.isNull || gap > Gap, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("es")).as("start_s"),
          max(col("es")).as("end_s"),
          Det.sumMoney(col("value")).as("total_value"))
        .orderBy("user_id", "session_id")
    }),

    // Per-source boilerplate catalog: the top-10 repeated pseudo-lines of
    // each source with the share of the source's docs carrying them — the
    // artifact a cleaning pass is configured from (nav bars, cookie
    // banners, license headers). q_llm_line_dedup REMOVES repeated lines
    // per doc; this op REPORTS them per source, ranked. Shape: map-only
    // chunking, one (source, chunk) distinct-doc count shuffle, a top-10
    // window on the already-reduced catalog, and a broadcast join against
    // per-source doc totals. The window runs on rows that survived the
    // >= 2-docs filter (corpus-frequency-bounded), never the raw chunks.
    "q_llm_boilerplate" -> ((s, d) => {
      val nch = ceil(size(col("toks")).cast("double") / BW).cast("int")
      val chunkArr = transform(sequence(lit(0), nch - 1),
        i => array_join(slice(col("toks"), i * BW + 1, lit(BW)), " "))
      val docs = t(s, d, "documents")
      val chunks = docs
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("source"), explode(chunkArr).as("chunk"))
      val srcTot = docs.groupBy("source").agg(count(lit(1)).as("n_docs_src"))
      val w = Window.partitionBy("source")
        .orderBy(col("n_docs").desc, col("chunk").asc)
      chunks.groupBy("source", "chunk")
        .agg(count_distinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .join(broadcast(srcTot), Seq("source"))
        .select(col("source"), col("rk"), col("chunk"), col("n_docs"),
          Det.r(col("n_docs").cast("double") / col("n_docs_src"), 4)
            .as("doc_share"))
        .orderBy("source", "rk")
    }),

    // Character-class profile: per-doc counts and ratios of digit /
    // alpha / space / other characters — the cheap first-pass filter that
    // catches numeric dumps, markup soup, and mojibake before any
    // tokenization. Pure scan projection (three RE2-safe character-class
    // regexes), zero shuffles at any scale.
    "q_llm_char_classes" -> ((s, d) => {
      val txt = col("text")
      val n = length(txt).cast("long")
      val dig = length(regexp_replace(txt, "[^0-9]", "")).cast("long")
      val alp = length(regexp_replace(txt, "[^A-Za-z]", "")).cast("long")
      val spc = length(regexp_replace(txt, "[^ ]", "")).cast("long")
      t(s, d, "documents")
        .select(col("doc_id"), n.as("n_chars"), dig.as("n_digit"),
          alp.as("n_alpha"), spc.as("n_space"),
          (n - dig - alp - spc).as("n_other"),
          Det.r(alp.cast("double") / n, 4).as("alpha_ratio"),
          Det.r(dig.cast("double") / n, 4).as("digit_ratio"))
        .orderBy("doc_id")
    }),

    // Embedding-space outlier mining: for each label, the 10 vectors
    // least similar to their label centroid — the prune-the-tail readout
    // (mislabeled / off-distribution items) that complements SemDeDup's
    // prune-the-duplicates. The centroid is computed in EXACT integer
    // space: each coordinate is quantized to 1e-6 units per row
    // (bit-identical in both engines), summed as longs (exact,
    // order-independent — the float-avg centroid of the IVF trainer is
    // NOT oracle-able precisely because FP addition is order-dependent),
    // and cosine is scale-invariant, so the un-normalized integer sum
    // vector IS the centroid for similarity purposes. Shape: one
    // (label, pos) shuffle for the sums (10 labels × 64 dims = 640
    // rows), centroids broadcast back, codegen'd cosine in the scan
    // stage, WindowGroupLimit bottom-10 — at 100 TB the heavy side is
    // touched twice map-only, never joined to itself.
    "q_llm_embed_outliers" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val q = e.select(col("label"),
        posexplode(transform(col("v"),
          x => floor(x * 1e6 + lit(0.5)).cast("long"))).as(Seq("pos", "qv")))
      val cents = q.groupBy("label", "pos").agg(sum(col("qv")).as("sv"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
          x => x.getField("sv").cast("double")).as("cent"))
      val w = Window.partitionBy("label")
        .orderBy(col("sim").asc, col("vec_id").asc)
      e.join(broadcast(cents), Seq("label"))
        .select(col("label"), col("vec_id"),
          graft.functions.CosineSimilarity
            .cosineSim(s, col("v"), col("cent")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("label"), col("rk"), col("vec_id"),
          Det.r(col("sim"), 4).as("sim"))
        .orderBy("label", "rk")
    }),

    // Language-ID confusion matrix — the aggregate eval view of
    // q_llm_lang_id (which emits per-doc predictions): per (declared
    // lang, predicted lang) cell, count and share of the declared
    // language's docs. The same eval pattern as q_llm_cluster_purity /
    // q_llm_cluster_nmi for clustering: a routing pipeline checks this
    // table before trusting lang-gated mixtures — the off-diagonal
    // cells ARE the misrouted budget. Pure integer counts; only the
    // share rounds. Shape: map-side argmax at the scan (identical
    // tie-priority chain as q_llm_lang_id) → one bounded (lang, pred)
    // count shuffle (≤ 5×5 keys) + a broadcast per-lang total.
    "q_llm_lang_confusion" -> ((s, d) => {
      val toks = split(col("text"), " ")
      def hits(words: Seq[String]) =
        size(filter(toks, x => x.isin(words: _*)))
      val en = hits(Seq("the", "a", "is", "of", "and"))
      val fr = hits(Seq("le", "la", "et", "les"))
      val es = hits(Seq("el", "los", "una", "y"))
      val de = hits(Seq("der", "und", "das", "die"))
      val cells = t(s, d, "documents")
        .select(col("lang"),
          when(en >= fr && en >= es && en >= de && en > 0, "en")
            .when(fr >= es && fr >= de && fr > 0, "fr")
            .when(es >= de && es > 0, "es")
            .when(de > 0, "de")
            .otherwise("und").as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("lang").agg(sum(col("n")).as("n_lang"))
      cells.join(broadcast(totals), "lang")
        .select(col("lang"), col("pred"), col("n"),
          Det.r(col("n").cast("double") / col("n_lang"), 4).as("share"))
        .orderBy("lang", "pred")
    }),

    // Compression-ratio quality filter (the Gopher corpus-quality
    // signal): deflated bytes / raw bytes per doc. Templated or
    // repetitive text compresses far below the corpus norm; high-entropy
    // noise (mojibake, minified blobs, random ids) barely compresses —
    // both tails get gated before training. Raw-DEFLATE length via the
    // codegen'd `DeflateLen` kernel (thread-local zlib stream, no
    // per-row allocation); no DuckDB twin exists, so this is declared
    // no-oracle and gated by an EXACT in-JVM Deflater recomputation in
    // OperatorSpec (the sketch-op pattern, but with exact equality).
    // Shape: map-only scan — zero shuffles; at 100 TB this is the
    // canonical embarrassingly-parallel quality pass.
    "q_llm_compress_ratio" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          graft.functions.DeflateLen.deflateLen(s, col("text"))
            .as("z_bytes"))
        .select(col("doc_id"), col("n_bytes"), col("z_bytes"),
          Det.r(col("z_bytes").cast("double") / col("n_bytes"), 4)
            .as("ratio"))
        .orderBy("doc_id")),

    // LIX readability index (Björnsson 1968) — the length-structure
    // readability score curation pipelines use as a cheap complexity
    // gate: LIX = words/sentences + 100·(long words/words), long = ≥7
    // chars, sentences counted as terminal-punctuation marks (floored
    // at 1 so punctuation-free docs stay defined). <25 reads as
    // children's text, >60 as bureaucratic prose — both tails are
    // curation signals (too-simple boilerplate vs unreadable legalese).
    // All three counts are exact integers computed in-row; only the
    // final index rounds (identical double expression trees in both
    // engines). Shape: map-only scan — zero shuffles, composes with
    // any pushed-down gate at 100 TB.
    "q_llm_readability" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          greatest(regexp_count(col("text"), lit("[.!?]")), lit(1))
            .cast("long").as("n_sents"),
          size(filter(toks, t => length(t) >= 7)).cast("long")
            .as("n_long"))
        .select(col("doc_id"), col("n_words"), col("n_sents"),
          col("n_long"),
          Det.r(col("n_words").cast("double") / col("n_sents")
            + lit(100.0) * col("n_long") / col("n_words"), 4).as("lix"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_events_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
                            CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                              AS es
                     FROM events),
              m AS (SELECT *,
                           CASE WHEN lag(es) OVER uw IS NULL
                                  OR es - lag(es) OVER uw > $Gap
                                THEN 1 ELSE 0 END AS is_new
                    FROM e
                    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sess AS (SELECT *,
                              CAST(SUM(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                                AS session_id
                       FROM m)
         SELECT user_id, session_id, count(*) AS n_events,
                min(es) AS start_s, max(es) AS end_s,
                CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS DOUBLE) / 100 AS total_value
         FROM sess GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_llm_boilerplate" ->
      s"""WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS t
                      FROM documents),
              c AS (SELECT doc_id, source,
                           array_to_string(t[(u.i*$BW+1):(u.i*$BW+$BW)], ' ')
                             AS chunk
                    FROM tk, unnest(range(0,
                      CAST(ceil(len(t)/$BW.0) AS BIGINT))) AS u(i)),
              f AS (SELECT source, chunk,
                           count(DISTINCT doc_id) AS n_docs
                    FROM c GROUP BY 1, 2
                    HAVING count(DISTINCT doc_id) >= 2),
              st AS (SELECT source, count(*) AS n_docs_src
                     FROM documents GROUP BY 1),
              r AS (SELECT source, chunk, n_docs,
                           row_number() OVER (PARTITION BY source
                             ORDER BY n_docs DESC, chunk) AS rk
                    FROM f)
         SELECT source, CAST(rk AS INTEGER) AS rk, chunk, n_docs,
                floor(CAST(n_docs AS DOUBLE) / n_docs_src * 10000 + 0.5)
                  / 10000 AS doc_share
         FROM r JOIN st USING (source)
         WHERE rk <= 10 ORDER BY source, rk""",
    "q_llm_char_classes" ->
      """WITH m AS (
           SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                  CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                       AS BIGINT) AS n_digit,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS BIGINT) AS n_alpha,
                  CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                       AS BIGINT) AS n_space
           FROM documents)
         SELECT doc_id, n_chars, n_digit, n_alpha, n_space,
                n_chars - n_digit - n_alpha - n_space AS n_other,
                floor(CAST(n_alpha AS DOUBLE) / n_chars * 10000 + 0.5)
                  / 10000 AS alpha_ratio,
                floor(CAST(n_digit AS DOUBLE) / n_chars * 10000 + 0.5)
                  / 10000 AS digit_ratio
         FROM m ORDER BY doc_id""",
    "q_llm_embed_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
              q AS (SELECT label, u.i,
                           CAST(floor(v[u.i] * 1000000 + 0.5) AS BIGINT)
                             AS qv
                    FROM e, unnest(range(1, len(v) + 1)) AS u(i)),
              c AS (SELECT label, list(CAST(sv AS DOUBLE) ORDER BY i)
                             AS cent
                    FROM (SELECT label, i, SUM(qv) AS sv
                          FROM q GROUP BY 1, 2)
                    GROUP BY label),
              s AS (SELECT e.label, e.vec_id,
                           list_cosine_similarity(e.v, c.cent) AS sim
                    FROM e JOIN c USING (label)),
              r AS (SELECT *, row_number() OVER (PARTITION BY label
                      ORDER BY sim ASC, vec_id) AS rk
                    FROM s)
         SELECT label, CAST(rk AS INTEGER) AS rk, vec_id,
                floor(sim * 10000 + 0.5) / 10000 AS sim
         FROM r WHERE rk <= 10 ORDER BY label, rk""",
    "q_llm_lang_confusion" ->
      """WITH h AS (
           SELECT lang,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a','is','of','and'))) AS INT) AS en,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les'))) AS INT) AS fr,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('el','los','una','y'))) AS INT) AS es,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('der','und','das','die'))) AS INT) AS de
           FROM documents),
              p AS (SELECT lang,
                           CASE WHEN en >= fr AND en >= es AND en >= de AND en > 0 THEN 'en'
                                WHEN fr >= es AND fr >= de AND fr > 0 THEN 'fr'
                                WHEN es >= de AND es > 0 THEN 'es'
                                WHEN de > 0 THEN 'de'
                                ELSE 'und' END AS pred
                    FROM h),
              c AS (SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2),
              t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
                    FROM c GROUP BY 1)
         SELECT lang, pred, n,
                floor(CAST(n AS DOUBLE) / n_lang * 10000 + 0.5) / 10000
                  AS share
         FROM c JOIN t USING (lang) ORDER BY lang, pred""",
    "q_llm_readability" ->
      """WITH m AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_words,
                           CAST(greatest(len(regexp_extract_all(text,
                             '[.!?]')), 1) AS BIGINT) AS n_sents,
                           CAST(len(list_filter(string_split(text, ' '),
                             t -> length(t) >= 7)) AS BIGINT) AS n_long
                    FROM documents)
         SELECT doc_id, n_words, n_sents, n_long,
                floor((CAST(n_words AS DOUBLE) / n_sents
                       + 100.0 * n_long / n_words) * 10000 + 0.5) / 10000
                  AS lix
         FROM m ORDER BY doc_id"""
  )
}
