package graft.queries

import org.apache.spark.sql.SparkSession
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
      val grams = t(s, d, "documents")
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
         GROUP BY doc_id ORDER BY doc_id"""
  )
}
