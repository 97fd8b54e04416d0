package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SURVEY.md §2.9 + the training-data-pipeline operator set: exact dedup,
  * text statistics, token counting, quality scoring, language ID,
  * document fingerprinting, TF-IDF, n-gram Jaccard near-dup pairs,
  * MinHash+LSH, SimHash.
  *
  * Reference implements none (SURVEY.md §0); this is the north-star
  * surface a 100 TB LLM-data pipeline needs (BASELINE.json driver note).
  *
  * Scale design: everything is relational — explode/groupBy/join — so it
  * shuffles on (doc_id | term | band-bucket) and scales horizontally.
  * Near-dup discovery never goes all-pairs at scale: Jaccard pairs are
  * blocked by `source`; MinHash-LSH reduces candidate generation to
  * equality joins on band keys (the 100 TB path). Hash functions are
  * Spark's xxhash64 (seed-stable) — hash-bearing outputs that can't be
  * reproduced in DuckDB are declared no-oracle and golden-tested instead.
  */
object TextOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val STOP = Seq("the", "a", "of", "to", "is")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isin(words: _*)))

  val queries: Map[String, QueryFn] = Map(
    // Exact dedup on normalized text hash: one shuffle on the hash, then
    // keep-min representative. md5 exists in both engines → oracle-able.
    "q_llm_exact_dedup" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(md5(trim(lower(col("text")))).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
        .orderBy("h")),

    "q_llm_text_stats" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq"),
          length(col("text")).as("len_chars"),
          Det.r(length(regexp_replace(col("text"), " ", "")) / size(toks), 4)
            .as("avg_tok_len"))
        .orderBy("doc_id")
    }),

    // BPE-ish regex token counting (no tokenizer libs in-container; the
    // regex families stand in for the merge table).
    "q_llm_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
            .as("n_alpha"),
          size(regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)))
            .as("n_long"),
          size(regexp_extract_all(col("text"), lit("[aeiou][a-z]*"), lit(0)))
            .as("n_vowel_start"))
        .orderBy("doc_id")),

    "q_llm_quality" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val stopRatio = hits(toks, STOP).cast("double") / nTok
      val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
      t(s, d, "documents")
        .select(col("doc_id"),
          Det.r(stopRatio, 4).as("stop_ratio"),
          Det.r(uniqRatio, 4).as("uniq_ratio"),
          when(col("n_chars") === length(col("text")), 1).otherwise(0)
            .as("chars_ok"),
          Det.r(uniqRatio * 0.5 + (lit(1.0) - stopRatio) * 0.5, 4)
            .as("quality"))
        .orderBy("doc_id")
    }),

    // n-gram-lexicon language ID: per-language stopword hit counts,
    // arg-max with a fixed priority order for ties.
    "q_llm_lang_id" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val en = hits(toks, Seq("the", "a", "is", "of", "and"))
      val fr = hits(toks, Seq("le", "la", "et", "les"))
      val es = hits(toks, Seq("el", "los", "una", "y"))
      val de = hits(toks, Seq("der", "und", "das", "die"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          en.as("en_hits"),
          when(en >= fr && en >= es && en >= de && en > 0, "en")
            .when(fr >= es && fr >= de && fr > 0, "fr")
            .when(es >= de && es > 0, "es")
            .when(de > 0, "de")
            .otherwise("und").as("pred"))
        .withColumn("correct",
          when(col("pred") === col("lang"), 1).otherwise(0))
        .orderBy("doc_id")
    }),

    // Rolling polynomial fingerprint over the token stream — sequential
    // fold, deterministic, pure int64 math (portable to DuckDB's
    // list_reduce with a prepended seed).
    "q_llm_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          aggregate(split(col("text"), " "), lit(0L),
            (acc, tk) => pmod(
              acc * lit(131L) + length(tk).cast("long") * lit(31L)
                + ascii(tk).cast("long"),
              lit(1000000007L))).as("fp"))
        .orderBy("doc_id")),

    // Relational TF-IDF, top term per doc. MLlib HashingTF is not
    // hash-stable across versions (SURVEY §2.9) — term-level joins are,
    // and they scale: shuffles on term and doc_id only.
    "q_llm_tfidf" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          (col("cnt") / col("dl")) * log(col("n_docs") / col("df")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), Det.r(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id")
    }),

    // Exact n-gram (token-set) Jaccard near-dup pairs, blocked by
    // `source` — the blocking key bounds the quadratic term; at 100 TB
    // the block is a shard/bucket key, never the full corpus.
    "q_llm_jaccard_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("hs", array_sort(transform(col("toks"), tk => xxhash64(tk))))
      val a = docs.alias("a")
      val b = docs.alias("b")
      // |∩| via the codegen'd sorted-merge intersect over once-per-doc
      // xxhash64'd+sorted token arrays: primitive long compares, no
      // per-pair hash-set build or string hashing. Token-set sizes are
      // preserved by the hash (distinct strings → distinct longs; a
      // collision within one block pair is ~|a|·|b|/2^64 ≈ 1e-16), so
      // hashed-Jaccard ≡ string-Jaccard.
      val hinter = graft.functions.SortedIntersectSize
        .sortedIntersectSize(s, col("a.hs"), col("b.hs"))
      val sa = size(col("a.toks")); val sb = size(col("b.toks"))
      val jac = hinter.cast("double") / (sa + sb - hinter)
      // Conjunct order is load-bearing: join-condition codegen keeps the
      // written order (a post-join .filter would be pushed in FIRST by
      // Catalyst): the O(1) size band — jac >= 0.5 implies |a|/|b| ∈
      // [1/2, 2] — runs before the O(|a|+|b|) merge-intersect threshold
      // (jac >= 0.5 ⟺ 3·|∩| >= |a|+|b|).
      a.join(b, col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id")
          && sa <= sb * 2 && sb <= sa * 2
          && hinter * 3 >= sa + sb)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          Det.r(jac, 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // MinHash + LSH near-dup detection: 3-shingles → 32-wide MinHash
    // signature → 8 bands × 4 rows → band-bucket grouping → candidate
    // pairs → shingle-Jaccard verification. Seeded hash family is not
    // reproducible in DuckDB → no-oracle; property-tested in TextOpsSpec
    // (recall of all Jaccard>=0.9 pairs; run-to-run stability).
    //
    // Scale shape: ONE pass computes shingles → signature → hashed+sorted
    // shingle array per doc (codegen'd MinHashSig kernel — no shuffle of
    // an exploded shingle×seed relation), persisted so the band explode
    // and both verification probes read the same materialization instead
    // of re-shingling the corpus 4× (the staging idiom a production LSH
    // pipeline uses: signature table computed once, then reused).
    // Candidates come from ONE shuffle of (band,bkey,doc_id) rows via
    // groupBy-bucket + in-bucket pair expansion — half the shuffle volume
    // of a band-key self-join and no join at all.
    // `toks` is materialized in its own projection so split() is
    // evaluated once per row, not once per lambda reference.
    "q_llm_minhash_lsh" -> ((s, d) => {
      val tks = col("toks")
      val docSig = t(s, d, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), when(size(tks) >= 3,
            array_distinct(transform(sequence(lit(0), size(tks) - 3),
              i => concat_ws(" ", element_at(tks, i + 1),
                element_at(tks, i + 2), element_at(tks, i + 3)))))
          .otherwise(array(col("text"))).as("shs"))
        .select(col("doc_id"),
          graft.functions.MinHashSig.minhashSig(s, col("shs"), 32).as("sig"),
          size(col("shs")).as("sz"),
          array_sort(transform(col("shs"), sh => xxhash64(sh))).as("hss"))
        .persist()
      // 8 bands × 4 rows: band key = xxhash64 over the 4 member slots
      // (native long hashing, no string casts)
      val bands = array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until 4).map(r =>
            element_at(col("sig"), b * 4 + r + 1)): _*).as("bkey"))
      }: _*)
      // Bucket members collected per (band,bkey); in-bucket i<j pair
      // expansion via indexed transforms. Bucket sizes are bounded by the
      // band width in practice; a 100 TB deployment would additionally
      // drop degenerate mega-buckets (stop-shingle equivalent).
      val ids = array_sort(col("ids"))
      val pairs = transform(ids, (x, i) =>
        transform(slice(ids, i + 2, size(ids)), y =>
          struct(x.as("d1"), y.as("d2"))))
      val cand = docSig
        .select(col("doc_id"), explode(bands).as("bk"))
        .groupBy(col("bk.band"), col("bk.bkey"))
        .agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(flatten(pairs)).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .distinct()
      // shingle-Jaccard verification against the persisted hashed+sorted
      // shingle arrays (codegen'd merge-intersect — see q_llm_jaccard_pairs)
      val m = graft.functions.SortedIntersectSize
        .sortedIntersectSize(s, col("hss1"), col("hss2"))
      cand
        .join(docSig.select(col("doc_id").as("d1"), col("hss").as("hss1"),
          col("sz").as("sz1")), Seq("d1"))
        .join(docSig.select(col("doc_id").as("d2"), col("hss").as("hss2"),
          col("sz").as("sz2")), Seq("d2"))
        .withColumn("jac", m.cast("double") / (col("sz1") + col("sz2") - m))
        .filter(col("jac") >= 0.5)
        .select(col("d1"), col("d2"), Det.r(col("jac"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }),

    // Text normalization (the canonical pre-dedup cleaning stage):
    // lowercase → strip non-alphanumerics → collapse whitespace → trim.
    // Map-only; at 100 TB this is a pure scan-side projection.
    "q_llm_normalize" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", ""), " +", " ")).as("norm"))
        .withColumn("n_norm_chars", length(col("norm")))
        .orderBy("doc_id")),

    // Corpus-level n-gram counts: top-20 bigrams with a total tie-break
    // order. Bigrams generated per row (map-only), one shuffle on the
    // bigram key, TakeOrdered for the top-k — no global sort.
    "q_llm_ngrams" -> ((s, d) => {
      val bigrams = when(size(col("t")) >= 2,
        transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
        .otherwise(array().cast("array<string>"))
      t(s, d, "documents")
        .select(split(col("text"), " ").as("t"))
        .select(explode(bigrams).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bg").asc)
        .limit(20)
    }),

    // SimHash document signatures (32-bit): per-term xxhash64, weighted
    // bit-vote per position, sign → bit. Pure relational: explode → tf →
    // 32 conditional sums — one shuffle on doc_id. no-oracle (xxhash64).
    "q_llm_simhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
        .withColumn("h", xxhash64(col("term")))
      val bitVotes = (0 until 32).map { b =>
        sum(col("cnt") * (shiftright(col("h"), b).bitwiseAND(lit(1L))
          * lit(2L) - lit(1L))).as(s"s$b")
      }
      val votes = tf.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
      val sim = (0 until 32).map { b =>
        when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      votes.select(col("doc_id"), sim.as("simhash")).orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_llm_exact_dedup" ->
      """SELECT md5(trim(lower(text))) AS h, min(doc_id) AS keeper,
                count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY h""",
    "q_llm_text_stats" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
                length(text) AS len_chars,
                floor(length(replace(text, ' ', '')) / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS avg_tok_len
         FROM documents ORDER BY doc_id""",
    "q_llm_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
                CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INT) AS n_long,
                CAST(len(regexp_extract_all(text, '[aeiou][a-z]*')) AS INT) AS n_vowel_start
         FROM documents ORDER BY doc_id""",
    "q_llm_quality" ->
      """WITH q AS (
           SELECT doc_id, n_chars, text,
                  string_split(text, ' ') AS toks,
                  CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ('the','a','of','to','is'))) AS DOUBLE)
                    / len(string_split(text, ' ')) AS stop_ratio,
                  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')) AS uniq_ratio
           FROM documents)
         SELECT doc_id,
                floor(stop_ratio * 10000 + 0.5) / 10000 AS stop_ratio,
                floor(uniq_ratio * 10000 + 0.5) / 10000 AS uniq_ratio,
                CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END AS chars_ok,
                floor((uniq_ratio * 0.5 + (1.0 - stop_ratio) * 0.5) * 10000 + 0.5) / 10000 AS quality
         FROM q ORDER BY doc_id""",
    "q_llm_lang_id" ->
      """WITH h AS (
           SELECT doc_id, lang,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a','is','of','and'))) AS INT) AS en,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les'))) AS INT) AS fr,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('el','los','una','y'))) AS INT) AS es,
                  CAST(len(list_filter(string_split(text,' '), x -> x IN ('der','und','das','die'))) AS INT) AS de
           FROM documents)
         SELECT doc_id, lang, en AS en_hits,
                CASE WHEN en >= fr AND en >= es AND en >= de AND en > 0 THEN 'en'
                     WHEN fr >= es AND fr >= de AND fr > 0 THEN 'fr'
                     WHEN es >= de AND es > 0 THEN 'es'
                     WHEN de > 0 THEN 'de'
                     ELSE 'und' END AS pred,
                CASE WHEN (CASE WHEN en >= fr AND en >= es AND en >= de AND en > 0 THEN 'en'
                     WHEN fr >= es AND fr >= de AND fr > 0 THEN 'fr'
                     WHEN es >= de AND es > 0 THEN 'es'
                     WHEN de > 0 THEN 'de'
                     ELSE 'und' END) = lang THEN 1 ELSE 0 END AS correct
         FROM h ORDER BY doc_id""",
    "q_llm_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ' '),
                      t -> CAST(len(t) * 31 + ascii(t) AS BIGINT))),
                  (a, b) -> (a * 131 + b) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",
    "q_llm_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     (CAST(tf.cnt AS DOUBLE) / dl.dl) * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
              FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                               ORDER BY tfidf DESC, term) AS rn
                  FROM scored)
         SELECT doc_id, term, floor(tfidf * 1000000 + 0.5) / 1000000 AS tfidf
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    "q_llm_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm,
                length(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS n_norm_chars
         FROM documents ORDER BY doc_id""",
    "q_llm_ngrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
            bg AS (SELECT unnest(CASE WHEN len(t) >= 2
                     THEN list_transform(generate_series(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1])
                     ELSE []::VARCHAR[] END) AS bg FROM tok)
         SELECT bg, count(*) AS n FROM bg
         GROUP BY 1 ORDER BY n DESC, bg LIMIT 20""",
    "q_llm_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, source,
                           list_distinct(string_split(text, ' ')) AS toks
                    FROM documents)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                floor(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
                      * 10000 + 0.5) / 10000 AS jaccard
         FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
         ORDER BY d1, d2"""
  )
}
