package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Training-data curation operators beyond the round-3 surface (SURVEY §2.9
  * north star, BASELINE.json driver note): repetition-based quality
  * filtering, corpus-LM (unigram log-prob) scoring, deterministic mixture
  * sampling and train/val/test splitting, incremental cross-corpus dedup,
  * edit-distance near-dup pairs, and the composed curation DAG
  * (gate→dedup→sample→pack) as one plan. Reference implements none
  * (SURVEY.md §0).
  *
  * Scale design notes per operator inline; everything is relational
  * (map-only or one/two shuffles on bounded keys) — no all-pairs work,
  * no driver-side state.
  */
object PipelineOps {
  import graft.QueryFn

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Portable 32-bit hash (shared contract with TextOps): first 8 md5 hex
    * chars as an integer; DuckDB twin `('0x'||substr(md5(x),1,8))::BIGINT`. */
  private def h32(s: SparkSession, c: Column): Column =
    graft.functions.PortableHash32.portableHash32(s, c)

  /** Per-doc mean unigram NLL in integer micros — the exact LONG
    * floor-quotient relation both perplexity-bucket variants rank on
    * (term-count shuffle + broadcast vocab scoring + one doc agg). */
  private def pplDocNll(s: SparkSession, d: String) = {
    val tok = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val cf = tok.groupBy("term").agg(count(lit(1)).as("ctf"))
    val tot = cf.agg(sum(col("ctf")).as("t"))
    tok.join(broadcast(cf), "term")
      .crossJoin(broadcast(tot))
      .withColumn("nll_u",
        floor(-log(col("ctf").cast("double") / col("t")) * 1e6 + 0.5)
          .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("nll_u")).as("su"))
      // exact integer mean: both engines floor the identical quotient
      .select(col("doc_id"),
        floor(col("su").cast("double") / col("n_tok")).cast("long")
          .as("nll_u"))
  }

  /** The memoized per-doc NLL scoring stage: [[pplDocNll]] built once
    * per (JVM, fixture) and served from StageCache's parquet relation —
    * the decode/serve split (TextOps.pairGraph, kmeansStage). The
    * approx bucket readout consumes it; before r18 it paid the full
    * corpus scoring pass TWICE per run (the sketch-threshold broadcast
    * build and the bucket-assignment pass each evaluated the
    * un-materialized relation). q_llm_ppl_bucket itself still declares
    * the full scoring join (it IS the scoring stage — the
    * q_llm_kmeans split, and PlanSpec pins its broadcast-vocab shape).
    * GRAFT_STAGE_CACHE=off (the scaling canary) still pays the full
    * declared computation per consumer. */
  private def docNllStage(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    // stage key = the SHARED documents fingerprint (ADVICE r18: an
    // inlined copy of the formula could silently drift from the one
    // every other documents-derived stage is keyed by)
    graft.operators.StageCache.relation(s, "docnll", d)(
      TextOps.docsFingerprint(s, d))(pplDocNll(s, d))

  /** The quartile-bucket readout both perplexity-bucket variants emit. */
  private def pplBucketReadout(b: org.apache.spark.sql.DataFrame) =
    b.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("nll_u")).as("bsum"),
        min(col("nll_u")).as("bmin"), max(col("nll_u")).as("bmax"))
      .select(col("bucket"), col("n_docs"),
        Det.r(col("bsum").cast("double") / col("n_docs") / 1e6, 4)
          .as("avg_nll"),
        Det.r(col("bmin").cast("double") / 1e6, 4).as("min_nll"),
        Det.r(col("bmax").cast("double") / 1e6, 4).as("max_nll"))
      .orderBy("bucket")

  val queries: Map[String, QueryFn] = Map(
    // Repetition-based quality scoring (the Gopher/C4-style "fraction of
    // text inside the most repeated n-gram" rule): per doc, count bigram
    // occurrences and report the top bigram's share of all bigrams. Docs
    // whose share exceeds a curation threshold are boilerplate candidates.
    // Shape: per-row bigram generation (map-only transform over the token
    // array, no shingle self-join) → count shuffle on (doc_id, bigram) →
    // per-doc max/sum shuffle on doc_id. Both keys are bounded and
    // well-distributed; at 100 TB this is two clean hash aggregations.
    "q_llm_repetition" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val bigrams = transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => concat_ws(" ",
          element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("top_cnt"))
        .select(col("doc_id"), col("n_bigrams"), col("top_cnt"),
          Det.r(col("top_cnt").cast("double") / col("n_bigrams"), 4)
            .as("top_share"))
        .orderBy("doc_id")
    }),

    // Deterministic mixture sampling (data-mixing step of a training
    // pipeline): each source gets a sampling rate; a doc is kept iff its
    // portable hash lands under rate·1000 — reproducible across engines,
    // runs, and cluster sizes (no seeded RNG, no TABLESAMPLE). Map-only:
    // the predicate evaluates at the scan, nothing shuffles; at 100 TB
    // this is the cheapest possible downsampling pass, and the hash
    // predicate composes with partition pruning on `source`.
    "q_llm_mix_sample" -> ((s, d) => {
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
      val rateMil = when(srcNum < 5, lit(1000)) // keep all of src0-4
        .when(srcNum < 10, lit(500)) //         half of src5-9
        .when(srcNum < 15, lit(250)) //         quarter of src10-14
        .otherwise(lit(100)) //                 a tenth of the rest
      t(s, d, "documents")
        .filter(pmod(h32(s, concat(lit("mix:"), col("doc_id").cast("string"))),
          lit(1000)) < rateMil)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // Temperature-scaled mixture weights (UniMax / mT5-style language
    // rebalancing, T=2): weight each language ∝ count^(1/T) so the head
    // language's dominance flattens without drowning the tail — the
    // standard multilingual sampling schedule, emitted as shares plus an
    // exact integer allocation of a 1000-doc budget. Determinism: sqrt
    // of an exact long count is one correctly-rounded IEEE op
    // (micros-floored like every idf in this repo); the normalizer is
    // an exact long SUM of those fixed-point weights, so shares and
    // integer allocations are bit-identical cross-engine — a float
    // Σ count^(1/T) would be summation-order-dependent. Shape: one
    // bounded groupBy(lang) + a 1-row broadcast total; at 100 TB this
    // is a metadata-sized readout off one count pass.
    "q_llm_temp_mix" -> ((s, d) => {
      val cnts = t(s, d, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("sqrt_u",
          floor(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
      val tot = cnts.agg(sum(col("sqrt_u")).as("total_u"))
      cnts.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          Det.r(col("sqrt_u").cast("double") / col("total_u"), 6)
            .as("share"),
          expr("(1000 * sqrt_u) div total_u").as("n_alloc"))
        .orderBy("lang")
    }),

    // Corpus-LM quality scoring (the CCNet/KenLM perplexity-proxy filter,
    // reduced to its unigram form): score every doc by its mean token
    // log-probability under the corpus' own unigram distribution — low
    // scorers are gibberish/rare-token soup, high scorers boilerplate.
    // Shape: one token-frequency aggregation (shuffle on term), then the
    // scored pass joins tokens to the BROADCAST frequency table (the
    // vocabulary is sublinear in the corpus — at 100 TB it still fits a
    // broadcast after min-count pruning) and aggregates per doc_id.
    // Portability: per-token log-probs are fixed-point-scaled to integer
    // micros and summed exactly (FP summation order differs between
    // engines — same rule as Det.sumMoney).
    "q_llm_unigram_logprob" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val cf = tok.groupBy("term").agg(count(lit(1)).as("ctf"))
      val tot = cf.agg(sum(col("ctf")).as("t"))
      tok.join(broadcast(cf), "term")
        .crossJoin(broadcast(tot))
        .withColumn("lp_u",
          floor(log(col("ctf").cast("double") / col("t")) * 1e6 + 0.5)
            .cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("lp_u")).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          Det.r(col("s").cast("double") / 1e6 / col("n_tokens"), 4)
            .as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // Perplexity-quartile bucketing — the CCNet head/middle/tail split
    // made into a readout: rank every doc by its mean per-token negative
    // log-likelihood under the corpus unigram LM (the q_llm_unigram_logprob
    // score, negated) and report the four equal-count quartile buckets
    // with their NLL ranges — the table a pipeline inspects before
    // choosing which tail to drop. Determinism: per-token NLL is
    // micro-floored and summed as longs; the per-doc mean is the exact
    // LONG floor-quotient su/n (no FP division feeds the ordering); the
    // quartile assignment is ntile(4) over the TOTAL order (nll_u,
    // doc_id) — the tie-broken-order rule that makes ntile deterministic
    // (q_events_rfm). Shape: one term-count shuffle + broadcast vocab
    // scoring + one doc agg; the global ntile is rows=corpus through a
    // single-partition window — the declared exact-quartile semantics.
    // At 100 TB the split would come from broadcast thresholds off a
    // percentile sketch (q_agg_approx_pct) instead of a global rank;
    // same readout, sketch-accurate boundaries.
    "q_llm_ppl_bucket" -> ((s, d) =>
      pplBucketReadout(pplDocNll(s, d).withColumn("bucket",
        ntile(4).over(Window.orderBy(col("nll_u"), col("doc_id")))))),

    // The 100 TB twin of q_llm_ppl_bucket: the exact global ntile is
    // replaced by THREE broadcast thresholds off a percentile sketch
    // (approx_percentile over the per-doc NLL relation) — the split a
    // real corpus-scale pipeline uses, since a single-partition rank of
    // every document cannot scale. No oracle by design (the sketch's
    // thresholds are approximate and merge-order-dependent);
    // OperatorSpec gates each bucket's population within tolerance of
    // the exact quartile split and asserts the mean-NLL ordering.
    // Shape: the same doc-NLL relation, then ONE 1-row sketch agg
    // broadcast back — map-side bucket assignment, no window at all.
    "q_llm_ppl_bucket_approx" -> ((s, d) => {
      val doc = docNllStage(s, d)
      val th = doc.agg(percentile_approx(col("nll_u"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("t"))
      pplBucketReadout(doc.crossJoin(broadcast(th))
        .withColumn("bucket",
          (lit(1) + when(col("nll_u") > col("t")(0), 1).otherwise(0)
            + when(col("nll_u") > col("t")(1), 1).otherwise(0)
            + when(col("nll_u") > col("t")(2), 1).otherwise(0))
            .cast("int"))
        .drop("t"))
    }),

    // Bigram-LM quality scoring — the order-sensitive upgrade of
    // q_llm_unigram_logprob (the actual CCNet/KenLM filter shape): score
    // every doc by its mean log P(w_i | w_{i-1}) under the corpus' own
    // add-one-smoothed bigram model, P = (c(w_{i-1} w_i) + 1) /
    // (c(w_{i-1}) + V). Unigram scoring can't see scrambled word order;
    // bigram perplexity is what separates fluent text from token soup
    // with the same vocabulary. Shape: map-only bigram generation (no
    // self-join), one count shuffle on the bigram key, then the scoring
    // pass shuffle-joins occurrences to bigram counts (the bigram table
    // is NOT broadcastable at 100 TB — superlinear in vocab; the join
    // key is well-distributed) while context counts and V ride
    // broadcasts (vocab-sized after min-count pruning). Per-token
    // log-probs fixed-point-scaled to integer micros and summed exactly
    // (same portability rule as unigram/BM25/entropy). Docs with < 2
    // tokens have no bigram positions and drop out (mirrored in oracle).
    "q_llm_bigram_logprob" -> ((s, d) => {
      val tk = col("t")
      // §2.5 repartition before bigram generation: the one-row-group scan
      // otherwise runs the position explode single-core for every branch.
      val pos = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(when(size(tk) >= 2,
          transform(sequence(lit(1), size(tk) - 1),
            i => struct(element_at(tk, i).as("prev"),
              concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))
                .as("bg"))))
          .otherwise(array().cast("array<struct<prev:string,bg:string>>")))
          .as("p"))
        .select(col("doc_id"), col("p.prev").as("prev"), col("p.bg").as("bg"))
      // c2 keeps `prev` in the key (bg = "prev next" determines prev, so
      // the grouped cardinality is unchanged); c1 then FOLDS OUT of c2 —
      // context count = Σ over that context's bigrams — instead of
      // re-aggregating the corpus-sized position relation a second time
      // (guide §2.3 "aggregate before you shuffle": the c1 shuffle now
      // carries bigram-vocab rows, not every bigram position).
      val c2 = pos.groupBy("prev", "bg").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("prev").agg(sum(col("c2")).as("c1"))
      val v = t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .agg(count_distinct(col("term")).as("v"))
      pos.join(c2.select("bg", "c2"), "bg")
        .join(broadcast(c1), "prev")
        .crossJoin(broadcast(v))
        .withColumn("lp_u",
          floor(log((col("c2") + 1).cast("double") / (col("c1") + col("v")))
            * 1e6 + 0.5).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_u")).as("s"))
        .select(col("doc_id"), col("n_bigrams"),
          Det.r(col("s").cast("double") / 1e6 / col("n_bigrams"), 4)
            .as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // Incremental cross-corpus dedup (the per-ingest-batch form of exact
    // dedup): treat doc_id % 4 == 0 as the incoming batch and the rest as
    // the committed corpus; emit only batch docs whose normalized text
    // hash does NOT appear in the corpus — what an ingestion job appends.
    // Shape: one left-anti hash join on the md5 key. At 100 TB the corpus
    // side is the big one: the anti join shuffles both sides on the hash
    // (or, with the sink's bloom filter, prunes corpus partitions before
    // the shuffle); there is no per-batch rescan of history beyond the
    // hash column.
    "q_llm_cross_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(trim(lower(col("text")))).as("h"))
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      batch.join(corpus, Seq("h"), "left_anti")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // Edit-distance near-dup pairs — the character-level dedup modality
    // the token-set family can't express (OCR noise, small in-place
    // edits leave token sets nearly disjoint but edit distance tiny).
    // Blocked by source + a length band, distance computed on a bounded
    // 80-char prefix so the per-pair cost is constant; the levenshtein
    // conjunct sits LAST in the join condition (codegen keeps written
    // order — the O(1) band checks prune before the DP runs). Two
    // losless cuts keep the DP cheap: the prefix-length band
    // |len(p1)-len(p2)| <= 8 (length diff lower-bounds edit distance),
    // and Spark's THRESHOLD levenshtein — the banded DP only fills a
    // 2k+1-wide diagonal strip and early-exits (O(80·17), not O(80²)),
    // returning -1 past the threshold. Measured 10.2 s → banded at sf0.1.
    // At 100 TB the block key is a shard/bucket, same as jaccard_pairs.
    "q_llm_edit_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          substring(col("text"), 1, 80).as("p"),
          length(col("text")).as("len"))
      val a = docs.select(col("source"), col("doc_id").as("d1"),
        col("p").as("p1"), col("len").as("l1"))
      val b = docs.select(col("source"), col("doc_id").as("d2"),
        col("p").as("p2"), col("len").as("l2"))
      val banded = levenshtein(col("a.p1"), col("b.p2"), 8)
      a.alias("a").join(b.alias("b"),
          col("a.source") === col("b.source")
            && col("a.d1") < col("b.d2")
            && abs(col("a.l1") - col("b.l2")) <= 20
            && abs(length(col("a.p1")) - length(col("b.p2"))) <= 8
            && banded >= 0)
        .select(col("a.d1").as("d1"), col("b.d2").as("d2"),
          banded.as("dist"))
        .orderBy("d1", "d2")
    }),

    // Deterministic train/val/test split (98/1/1): the hash-range
    // assignment every training pipeline needs — reproducible across
    // runs, engines, and cluster sizes, no seeded RNG. Map-only.
    "q_llm_split" -> ((s, d) => {
      val bucket = pmod(h32(s,
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100))
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          when(bucket < 98, "train").when(bucket === 98, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // The capstone curation DAG as ONE declarative query — what a user
    // of the engine actually runs nightly: quality gate → exact dedup
    // (keep-min per normalized hash) → deterministic 75% sample →
    // greedy sequence packing into 2048-token windows per source shard.
    // Every stage is a declared operator elsewhere (q_llm_quality,
    // q_llm_exact_dedup, q_llm_mix_sample, q_llm_pack); composing them
    // stays a single Catalyst plan: two window shuffles (dedup hash,
    // pack shard) over map-only stages — no materialization barriers
    // between pipeline steps, which is the point of a declarative
    // engine at 100 TB (one pass, fused stages, nothing landed twice).
    "q_llm_curate" -> ((s, d) => {
      import s.implicits._
      val C = 2048
      val toks = split(col("text"), " ")
      val stopRatio = size(filter(toks, x =>
        x.isin(Seq("the", "a", "of", "to", "is"): _*))).cast("double") /
        size(toks)
      val uniqRatio = size(array_distinct(toks)).cast("double") / size(toks)
      val quality = uniqRatio * 0.5 + (lit(1.0) - stopRatio) * 0.5
      val dedupW = Window
        .partitionBy(md5(trim(lower(col("text"))))).orderBy("doc_id")
      t(s, d, "documents")
        .filter(quality >= 0.65)
        .withColumn("dr", row_number().over(dedupW))
        .filter(col("dr") === 1)
        .filter(pmod(h32(s, concat(lit("mix:"), col("doc_id").cast("string"))),
          lit(1000)) < 750)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_tokens"))
        .as[(Long, String, Int)]
        .groupByKey(_._2)
        .flatMapSortedGroups(col("doc_id")) { (src, it) =>
          var seq = 0; var fill = 0; var first = true
          it.map { case (id, _, n) =>
            if (first) { first = false; fill = n; (id, src, n, 0, 0) }
            else if (fill + n <= C) {
              val off = fill; fill += n; (id, src, n, seq, off)
            } else { seq += 1; fill = n; (id, src, n, seq, 0) }
          }
        }
        .toDF("doc_id", "source", "n_tokens", "seq_id", "offset")
        .orderBy("doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every raw doc
    // by the log-likelihood ratio of its hashed n-gram features under a
    // target distribution (here: the lang='en' slice) vs the raw corpus
    // distribution — log w(x) = Σ_f c_f(x)·(log p_t(f) − log p_r(f)).
    // Features are unigrams + bigrams hashed into B=256 buckets (the
    // paper's hashed-n-gram trick: a FIXED-size feature table regardless
    // of vocab), both distributions Laplace-smoothed. Shape: map-only
    // featurize at the scan → one (doc, bucket) count agg whose exchange
    // is REUSED by both consumers (the bucket table — raw + target
    // counts in one conditional-sum pass — and the scoring join), with
    // corpus totals a 256-row fold of the bucket table → scoring joins
    // the BROADCAST B-row delta table and aggregates per doc. At 100 TB
    // the bucket table is still 256 rows — the whole point of hashed
    // DSIR — so the featurization scan runs once and everything after
    // it is bounded-key or broadcast work.
    // Portability: per-bucket log-probs fixed-point-scaled to integer
    // micros before the per-doc sum (same rule as unigram/bigram/BM25).
    "q_llm_dsir_weights" -> ((s, d) => {
      val B = 256
      val tk = col("t")
      // fan-out BEFORE featurizing, GATED on scan parallelism
      // (ScanFront): the fixture corpus is one parquet row group = one
      // scan task, which would md5 every feature on a single core (same
      // fix as q_llm_winnow_dup). The next shuffle keys on (doc_id, b),
      // which hash(doc_id) clustering does NOT satisfy, so on a split
      // table this exchange would shuffle the full text column for
      // nothing — it fires only when the scan is a single task.
      val feats = ScanFront.fanOut(
          t(s, d, "documents")
            .select(col("doc_id"), col("lang"), col("text")),
          col("doc_id"))
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("lang"), explode(concat(
          transform(tk, w => concat(lit("u:"), w)),
          when(size(tk) >= 2, transform(sequence(lit(1), size(tk) - 1),
            i => concat(lit("b:"), element_at(tk, i), lit(" "),
              element_at(tk, i + 1))))
            .otherwise(array().cast("array<string>")))).as("f"))
        .select(col("doc_id"), col("lang"),
          pmod(h32(s, col("f")), lit(B)).as("b"))
      // collapse to per-(doc, bucket) counts FIRST: the bucket table and
      // the scoring pass both hang off this one exchange (reused — the
      // expensive tokenize+md5 featurization runs once), and the
      // corpus-wide totals are a 256-row fold of the bucket table, not a
      // third scan
      val dbc = feats.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("c"))
      val buckets = dbc.groupBy("b").agg(
        sum(col("c")).as("cr"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
      val tots = buckets.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
      val delta = buckets.crossJoin(broadcast(tots))
        .select(col("b"),
          (floor(log((col("ct") + 1).cast("double") / (col("tt") + B))
            * 1e6 + 0.5)
            - floor(log((col("cr") + 1).cast("double") / (col("tr") + B))
              * 1e6 + 0.5)).cast("long").as("dl_u"))
      dbc.join(broadcast(delta), "b")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_feats"), sum(col("c") * col("dl_u")).as("w_u"))
        .select(col("doc_id"), col("n_feats"), col("w_u"),
          Det.r(col("w_u").cast("double") / 1e6 / col("n_feats"), 4)
            .as("avg_llr"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_llm_dsir_weights" ->
      """WITH dt AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                     FROM documents),
              f AS (SELECT doc_id, lang,
                           unnest(list_concat(
                             list_transform(t, w -> 'u:' || w),
                             CASE WHEN len(t) >= 2
                                  THEN list_transform(range(1, len(t)),
                                         i -> 'b:' || t[i] || ' ' || t[i+1])
                                  ELSE [] END)) AS f
                    FROM dt),
              fb AS (SELECT doc_id, lang,
                            (('0x'||substr(md5(f),1,8))::BIGINT) % 256 AS b
                     FROM f),
              bk AS (SELECT b, count(*) AS cr,
                            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
                     FROM fb GROUP BY b),
              tot AS (SELECT count(*) AS tr,
                             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt
                      FROM fb),
              dl AS (SELECT b,
                            CAST(floor(ln(CAST(ct + 1 AS DOUBLE) / (tt + 256))
                                       * 1000000 + 0.5)
                                 - floor(ln(CAST(cr + 1 AS DOUBLE) / (tr + 256))
                                         * 1000000 + 0.5) AS BIGINT) AS dl_u
                     FROM bk CROSS JOIN tot)
         SELECT fb.doc_id, count(*) AS n_feats,
                CAST(sum(dl.dl_u) AS BIGINT) AS w_u,
                floor(CAST(sum(dl.dl_u) AS DOUBLE) / 1000000 / count(*)
                      * 10000 + 0.5) / 10000 AS avg_llr
         FROM fb JOIN dl USING (b)
         GROUP BY fb.doc_id ORDER BY doc_id""",
    "q_llm_curate" ->
      """WITH RECURSIVE
            q AS (SELECT doc_id, source, text,
                         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                           / len(string_split(text, ' ')) * 0.5
                         + (1.0 - CAST(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the','a','of','to','is'))) AS DOUBLE)
                             / len(string_split(text, ' '))) * 0.5 AS q
                  FROM documents),
            dd AS (SELECT doc_id, source, text,
                          row_number() OVER (PARTITION BY md5(trim(lower(text)))
                                             ORDER BY doc_id) AS dr
                   FROM q WHERE q >= 0.65),
            sam AS (SELECT doc_id, source, text FROM dd
                    WHERE dr = 1
                      AND (('0x'||substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000 < 750),
            d AS (SELECT doc_id, source,
                         CAST(len(string_split(text, ' ')) AS INT) AS n,
                         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                  FROM sam),
            pack AS (
              SELECT doc_id, source, n, rn,
                     0 AS seq_id, 0 AS off, n AS fill
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.doc_id, d.source, d.n, d.rn,
                     CASE WHEN p.fill + d.n <= 2048 THEN p.seq_id ELSE p.seq_id + 1 END,
                     CASE WHEN p.fill + d.n <= 2048 THEN p.fill ELSE 0 END,
                     CASE WHEN p.fill + d.n <= 2048 THEN p.fill + d.n ELSE d.n END
              FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
         SELECT doc_id, source, n AS n_tokens,
                CAST(seq_id AS INT) AS seq_id, CAST(off AS INT) AS offset
         FROM pack ORDER BY doc_id""",
    "q_llm_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              b AS (SELECT doc_id,
                           unnest(list_transform(range(1, len(t)),
                                                 i -> t[i] || ' ' || t[i+1])) AS bg
                    FROM tk WHERE len(t) >= 2),
              c AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY 1, 2)
         SELECT doc_id,
                CAST(sum(n) AS BIGINT) AS n_bigrams,
                CAST(max(n) AS BIGINT) AS top_cnt,
                floor(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) * 10000 + 0.5)
                  / 10000 AS top_share
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_temp_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs,
                           CAST(floor(sqrt(CAST(count(*) AS DOUBLE))
                                      * 1000000) AS BIGINT) AS sqrt_u
                    FROM documents GROUP BY lang),
            t AS (SELECT CAST(sum(sqrt_u) AS BIGINT) AS total_u FROM c)
         SELECT lang, n_docs,
                floor(CAST(sqrt_u AS DOUBLE) / total_u * 1000000 + 0.5)
                  / 1000000 AS share,
                (1000 * sqrt_u) // total_u AS n_alloc
         FROM c CROSS JOIN t ORDER BY lang""",
    "q_llm_mix_sample" ->
      """SELECT doc_id, source FROM documents
         WHERE (('0x'||substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000
               < CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 5 THEN 1000
                      WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 10 THEN 500
                      WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INT) < 15 THEN 250
                      ELSE 100 END
         ORDER BY doc_id""",
    "q_llm_edit_pairs" ->
      """WITH d AS (SELECT doc_id, source, substr(text, 1, 80) AS p,
                           length(text) AS len
                    FROM documents)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
                levenshtein(a.p, b.p) AS dist
         FROM d a JOIN d b
           ON a.source = b.source AND a.doc_id < b.doc_id
          AND abs(a.len - b.len) <= 20
          AND levenshtein(a.p, b.p) <= 8
         ORDER BY d1, d2""",
    "q_llm_split" ->
      """SELECT doc_id, source,
                CASE WHEN (('0x'||substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100 < 98 THEN 'train'
                     WHEN (('0x'||substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100 = 98 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q_llm_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
              cf AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
              tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS t FROM cf),
              lp AS (SELECT doc_id,
                            CAST(floor(ln(CAST(ctf AS DOUBLE) / t) * 1000000 + 0.5)
                                 AS BIGINT) AS lp_u
                     FROM tok JOIN cf USING (term) CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_tokens,
                floor(CAST(sum(lp_u) AS DOUBLE) / 1000000 / count(*) * 10000 + 0.5)
                  / 10000 AS avg_logprob
         FROM lp GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_ppl_bucket" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
              cf AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
              tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS t FROM cf),
              nl AS (SELECT doc_id,
                            CAST(floor(-ln(CAST(ctf AS DOUBLE) / t)
                                       * 1000000 + 0.5) AS BIGINT) AS nll_u
                     FROM tok JOIN cf USING (term) CROSS JOIN tot),
              doc AS (SELECT doc_id,
                             CAST(floor(CAST(sum(nll_u) AS DOUBLE)
                                        / count(*)) AS BIGINT) AS nll_u
                      FROM nl GROUP BY doc_id),
              b AS (SELECT ntile(4) OVER (ORDER BY nll_u, doc_id) AS bucket,
                           nll_u
                    FROM doc)
         SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_docs,
                floor(CAST(sum(nll_u) AS DOUBLE) / count(*) / 1e6
                      * 10000 + 0.5) / 10000 AS avg_nll,
                floor(CAST(min(nll_u) AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000
                  AS min_nll,
                floor(CAST(max(nll_u) AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000
                  AS max_nll
         FROM b GROUP BY bucket ORDER BY bucket""",
    "q_llm_bigram_logprob" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
              pos AS (SELECT doc_id, t[i] AS prev, t[i] || ' ' || t[i+1] AS bg
                      FROM tk, unnest(range(1, len(t))) AS u(i)
                      WHERE len(t) >= 2),
              c2 AS (SELECT bg, count(*) AS c2 FROM pos GROUP BY bg),
              c1 AS (SELECT prev, count(*) AS c1 FROM pos GROUP BY prev),
              v AS (SELECT count(DISTINCT term) AS v
                    FROM (SELECT unnest(string_split(text, ' ')) AS term
                          FROM documents)),
              lp AS (SELECT doc_id,
                            CAST(floor(ln((c2 + 1.0) / (c1 + v)) * 1000000
                                       + 0.5) AS BIGINT) AS lp_u
                     FROM pos JOIN c2 USING (bg) JOIN c1 USING (prev)
                     CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                floor(CAST(sum(lp_u) AS DOUBLE) / 1000000 / count(*) * 10000
                      + 0.5) / 10000 AS avg_logprob
         FROM lp GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_cross_dedup" ->
      """WITH h AS (SELECT doc_id, source, md5(trim(lower(text))) AS h FROM documents)
         SELECT b.doc_id, b.source FROM h b
         WHERE b.doc_id % 4 = 0
           AND NOT EXISTS (SELECT 1 FROM h c
                           WHERE c.doc_id % 4 <> 0 AND c.h = b.h)
         ORDER BY b.doc_id"""
  )
}
