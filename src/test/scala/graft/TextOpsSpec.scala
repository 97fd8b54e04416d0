package graft

import org.apache.spark.sql.functions._

/** Golden/property tests for the no-oracle text ops (SURVEY.md §5.3/§5.5)
  * and algebraic invariants for the oracle-backed ones. */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("minhash-LSH finds every strong near-dup pair (shingle Jaccard >= 0.9)") {
    // exact 3-shingle Jaccard, brute force over all pairs (sf0.001 only)
    val toks = split(col("text"), " ")
    val shingles = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array(col("text")))
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"), shingles.as("sh"))
    val a = d.alias("a"); val b = d.alias("b")
    val inter = size(array_intersect(col("a.sh"), col("b.sh")))
    val strong = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", inter.cast("double")
        / (size(col("a.sh")) + size(col("b.sh")) - inter))
      .filter(col("jac") >= 0.9)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .as[(Long, Long)].collect().toSet

    val found = q("q_llm_minhash_lsh")
      .select("d1", "d2").as[(Long, Long)].collect().toSet

    val missed = strong -- found
    assert(missed.isEmpty,
      s"LSH missed ${missed.size} of ${strong.size} strong pairs: " +
        missed.take(5).mkString(", "))
    info(s"strong pairs: ${strong.size}, LSH candidates surviving verify: ${found.size}")
    // and every reported pair genuinely passes the 0.5 threshold
    assert(q("q_llm_minhash_lsh").filter(col("jaccard") < 0.5).count() == 0)
  }

  test("minhash-LSH output is stable across runs (seeded hashing)") {
    val r1 = q("q_llm_minhash_lsh").collect().map(_.toString).sorted
    val r2 = q("q_llm_minhash_lsh").collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
  }

  test("simhash: identical texts get identical signatures; hamming sane") {
    val sig = q("q_llm_simhash").as[(Long, Long)].collect().toMap
    // group docs by exact text; same text must imply same simhash
    val byText = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .groupBy(_._2).values.filter(_.length > 1)
    byText.foreach { g =>
      val sigs = g.map(r => sig(r._1)).distinct
      assert(sigs.length == 1, s"same text, different simhash: $g")
    }
    // signatures fit in 32 bits
    assert(sig.values.forall(s => s >= 0 && s <= 0xFFFFFFFFL))
  }

  test("dup groups: every near-dup pair shares a canonical; canonicals are minima") {
    val canon = q("q_llm_dup_groups")
      .select("doc_id", "canonical").as[(Long, Long)].collect().toMap
    // every doc labeled, label <= id (hash-min invariant)
    assert(canon.size == Tables(spark, sf, "documents").count())
    assert(canon.forall { case (id, c) => c <= id })
    // connectivity: both endpoints of every near-dup pair agree
    q("q_llm_jaccard_pairs").select("d1", "d2").as[(Long, Long)]
      .collect().foreach { case (a, b) =>
        assert(canon(a) == canon(b), s"pair ($a,$b) split across components")
      }
    // canonicals are their own canonical
    canon.values.toSet.foreach((c: Long) => assert(canon(c) == c))
  }

  test("exact dedup is idempotent and covers all docs") {
    val d = q("q_llm_exact_dedup")
    val total = d.agg(sum(col("n_dups"))).as[Long].head()
    assert(total == Tables(spark, sf, "documents").count())
    // keepers are distinct docs
    assert(d.select("keeper").distinct().count() == d.count())
  }

  test("jaccard pairs are symmetric-free (d1<d2) and within [0.5, 1]") {
    val p = q("q_llm_jaccard_pairs")
    assert(p.filter(col("d1") >= col("d2")).count() == 0)
    assert(p.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
  }

  test("tfidf top term appears in its document") {
    val top = q("q_llm_tfidf").select("doc_id", "term").as[(Long, String)]
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    top.collect().foreach { case (id, term) =>
      assert(docs(id).split(" ").contains(term), s"doc $id top term $term absent")
    }
  }

  test("fingerprint is deterministic and collides only on equal token streams") {
    val fp1 = q("q_llm_fingerprint").as[(Long, Long)].collect().toMap
    val fp2 = q("q_llm_fingerprint").as[(Long, Long)].collect().toMap
    assert(fp1 == fp2)
    val texts = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    fp1.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
      val distinctTexts = g.keys.map(texts).toSet
      assert(distinctTexts.size == 1,
        s"hash collision across different texts: ${g.keys}")
    }
  }

  test("BPE vocab: 5 deterministic merges with non-increasing counts") {
    val rows = q("q_llm_bpe_vocab").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5)) // one merge per round
    // each learned token is the concatenation of the merged pair
    rows.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    // a BPE merge count can never exceed an earlier round's winner (any
    // new pair containing the merged token occurs at most that often)
    val cnts = rows.map(_.getLong(4)).toSeq
    assert(cnts == cnts.sorted.reverse, s"counts not non-increasing: $cnts")
    // deterministic tie-breaks -> identical plan output across runs
    val again = q("q_llm_bpe_vocab").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("BPE encode: per-doc token counts sit between word and char counts") {
    val enc = q("q_llm_bpe_encode")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val chars = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0))
          .as("nw"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).as("nc"))
      .as[(Long, Int, Int)].collect()
    assert(enc.keySet == chars.map(_._1).toSet)
    chars.foreach { case (d, nw, nc) =>
      val (nWords, nTok) = enc(d)
      assert(nWords == nw, s"doc $d word count $nWords != $nw")
      // every word is >= 1 token; 5 merges can only shrink char-level
      assert(nTok >= nWords && nTok <= nc, s"doc $d: $nTok not in [$nWords, $nc]")
    }
    // the merges actually compress: corpus-wide tokens < corpus chars
    assert(enc.values.map(_._2).sum < chars.map(_._3.toLong).sum)
  }

  test("leakage-safe split: near-dup pairs never straddle train/val") {
    val split = q("q_llm_split_safe").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val pairs = q("q_llm_jaccard_pairs")
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dup pair ($a,$b) straddles the split")
    }
    // 8-of-10 hash buckets go to train: train must be the majority side
    val tr = split.values.count(_ == "train")
    assert(tr * 2 > split.size, s"train side $tr of ${split.size}")
  }

  test("length buckets: 16-aligned covers, dense batches of <= 8 per bucket") {
    val rows = q("q_llm_length_buckets")
      .select("doc_id", "n_tok", "bucket", "batch_id", "pad")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, b, _, pad) =>
      assert(b >= n && b - n < 16 && b % 16 == 0, s"doc $id bucket $b n=$n")
      assert(pad == b - n, s"doc $id pad")
    }
    rows.groupBy(_._3).foreach { case (b, g) =>
      val ids = g.map(_._4).distinct.sorted.toSeq
      assert(ids == (0L until ids.size).toSeq, s"bucket $b batch ids $ids")
      val sizes = g.groupBy(_._4).view.mapValues(_.size).toMap
      ids.foreach(i => assert(sizes(i) <= 8))
      // every batch except possibly the last is full
      ids.dropRight(1).foreach(i => assert(sizes(i) == 8, s"bucket $b batch $i"))
    }
  }

  test("containment: pair set matches a brute-force array_intersect scan") {
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val a = d.alias("a"); val b = d.alias("b")
    val inter = size(array_intersect(col("a.toks"), col("b.toks")))
    val sa = size(col("a.toks")); val sb = size(col("b.toks"))
    val expect = a.join(b, col("a.source") === col("b.source")
        && col("a.doc_id") =!= col("b.doc_id")
        && sa >= 5 && sb >= sa && inter * 5 >= sa * 4)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val got = q("q_llm_containment").select("d_sub", "d_sup")
      .as[(Long, Long)].collect().toSet
    assert(got == expect,
      s"missing ${(expect -- got).take(5)}, extra ${(got -- expect).take(5)}")
    info(s"containment pairs at sf0.001: ${got.size}")
    // every reported pair genuinely clears the 0.8 containment bar
    assert(q("q_llm_containment")
      .filter(col("containment") < 0.8 - 1e-9).count() == 0)
  }

  test("entropy: bounds hold and a hand-computed doc matches") {
    val rows = q("q_llm_entropy")
      .select("doc_id", "n", "types", "entropy", "ttr")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, types, h, ttr) =>
      // 0 <= H <= ln(types) (uniform maximizes; +1e-4 covers the 4-decimal
      // half-up display rounding landing just above the exact bound)
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 1e-4, s"doc $id H=$h")
      assert(ttr > 0 && ttr <= 1.0 + 1e-9, s"doc $id ttr=$ttr")
      assert(types <= n)
    }
    val (id0, text) = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().head
    val toks = text.split(" ")
    val n = toks.length.toDouble
    val hTrue = math.log(n) -
      toks.groupBy(identity).values.map(g => g.size * math.log(g.size.toDouble)).sum / n
    val got = rows.find(_._1 == id0).get._4
    assert(math.abs(got - hTrue) < 1e-3, s"doc $id0: $got vs $hTrue")
  }

  test("inverted index: 20-cap, sorted postings, true df") {
    val rows = q("q_llm_inverted_index")
      .select("term", "df", "postings").as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (term, df, postings) =>
      val ids = postings.split(",").map(_.toLong)
      assert(df >= 1, s"$term df=$df")
      assert(ids.length == math.min(df, 20L), s"$term postings=${ids.length}")
      assert(ids.sorted.sameElements(ids), s"$term postings unsorted")
    }
    // recompute df + capped postings from the raw corpus for every term
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    rows.foreach { case (term, df, postings) =>
      val truth = docs.filter(_._2.split(" ").toSet.contains(term))
        .map(_._1).sorted
      assert(truth.length.toLong == df, s"$term df $df != ${truth.length}")
      assert(postings == truth.take(20).mkString(","), s"$term postings")
    }
  }
}
