package graft

import org.apache.spark.sql.functions._

/** Semantic unit tests for the round-6 operators (RAG chunking, BM25,
  * PageRank, event transitions). The DuckDB oracle checks cross-engine
  * parity; these pin the SEMANTICS against hand-computed invariants. */
class GraphSearchOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunking covers every token exactly via 16/12 windows") {
    val chunks = q("q_llm_chunk")
      .select("doc_id", "chunk_id", "start_tok", "n_toks")
      .as[(Long, Int, Int, Int)].collect()
    val docLen = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docLen(id)
      val sorted = cs.sortBy(_._2)
      // chunk_id dense from 0; starts advance by the stride
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      sorted.foreach { case (_, i, start, len) =>
        assert(start == i * 12 + 1)
        assert(len == math.min(16, n - i * 12))
        assert(len >= 1)
      }
      // the last chunk reaches the final token; the one before doesn't
      assert(sorted.last._3 + sorted.last._4 - 1 == n)
      val expected = if (n <= 16) 1 else 1 + math.ceil((n - 16) / 12.0).toInt
      assert(sorted.length == expected, s"doc $id: $n tokens")
    }
  }

  test("bm25 scores exactly the docs containing a query term") {
    val scored = q("q_llm_bm25")
      .select("doc_id", "n_hit", "score_u")
      .as[(Long, Long, Long)].collect()
    val qterms = Set("join", "hash", "vector")
    val expect = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, tx) => id -> tx.split(" ").toSet.intersect(qterms).size }
      .filter(_._2 > 0).toMap
    assert(scored.map(_._1).toSet == expect.keySet)
    scored.foreach { case (id, hits, su) =>
      assert(hits == expect(id), s"doc $id")
      assert(su > 0, s"doc $id: nonpositive score")
    }
  }

  test("rrf fuses the two pool rankings with exact 1/(60+r) weights") {
    val rows = q("q_llm_rrf_fusion")
      .select("doc_id", "r_lex", "r_sem", "rrf")
      .as[(Long, Option[Int], Option[Int], Double)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._1).distinct.length == 20)
    rows.foreach { case (id, rl, rs, score) =>
      assert(rl.isDefined || rs.isDefined, s"doc $id in neither pool")
      (rl ++ rs).foreach(r => assert(r >= 1 && r <= 100, s"doc $id rank $r"))
      val exp = rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rs.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(score - math.floor(exp * 1e6 + 0.5) / 1e6) < 1e-12,
        s"doc $id: rrf $score vs recomputed $exp")
    }
    // the fused winner can never score below a lone pool #1 (1/61): a
    // single-pool rank-1 doc guarantees that floor; dual-pool membership
    // only raises it
    assert(rows.map(_._4).max >= math.floor(1e6 / 61 + 0.5) / 1e6,
      "fused top score below the single-pool floor")
    // emitted in fused order, id-tie-broken
    val sorted = rows.sortBy(x => (-x._4, x._1)).toSeq
    assert(rows.toSeq == sorted, "output not in (rrf desc, doc_id) order")
  }

  test("pagerank conserves bounded mass over the near-dup graph") {
    val pr = q("q_llm_pagerank")
      .select("doc_id", "deg", "pr_u").as[(Long, Long, Long)].collect()
    assert(pr.nonEmpty, "near-dup graph is empty at this sf")
    assert(pr.forall(_._2 >= 1)) // every node has an edge by construction
    assert(pr.forall(_._3 > 0))
    val n = pr.length
    val mass = pr.map(_._3).sum
    // total rank stays in (teleport-only, full-conservation]: each round
    // loses only integer-floor dust (< 1 nano per edge and node)
    assert(mass <= 1000000000L + n, s"mass $mass over $n nodes")
    assert(mass >= 150000000L - n, s"mass $mass under teleport floor")
  }

  test("winnowing: a shared 30-char substring at different offsets is caught") {
    import org.apache.spark.sql.functions._
    // the MOSS guarantee: any shared run >= 16+8-1 = 23 chars produces at
    // least one shared fingerprint regardless of position
    val shared = "the quick brown fox jumps over" // 30 chars
    val df = Seq(
      (1L, s"AAAA BBBB $shared CCCC DDDD EEEE FFFF"),
      (2L, s"zzzz yyyy xxxx wwww $shared qqqq rrrr")
    ).toDF("doc_id", "text")
    val h = graft.functions.PortableHash32.portableHash32(spark, _: org.apache.spark.sql.Column)
    val grams = transform(sequence(lit(1), length(col("text")) - 15),
      i => h(concat(lit("wn:"), col("text").substr(i, lit(16)))))
    val mins = transform(sequence(lit(1), size(col("g")) - 7),
      j => array_min(slice(col("g"), j, lit(8))))
    val fps = df.select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"), explode(array_distinct(mins)).as("fp"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val common = fps(1L).map(_._2).toSet.intersect(fps(2L).map(_._2).toSet)
    assert(common.nonEmpty, "no shared fingerprint for a 30-char shared run")
  }

  test("winnow pairs are ordered, thresholded, and dedup-consistent") {
    val pairs = q("q_llm_winnow_dup")
      .select("d1", "d2", "n_shared").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "no substring-dup candidates at this sf")
    assert(pairs.forall { case (a, b, n) => a < b && n >= 3 })
    // exact duplicates (same normalized text) must appear as candidates:
    // identical text shares every fingerprint
    val dupPair = Tables(spark, sf, "documents")
      .groupBy(md5(trim(lower(col("text")))).as("h"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id"), col("ids"))
      .as[(Long, Seq[Long])].collect()
    if (dupPair.nonEmpty) {
      val ids = dupPair.head._2.sorted
      val (a, b) = (ids(0), ids(1))
      assert(pairs.exists(p => p._1 == a && p._2 == b),
        s"exact dup pair ($a,$b) missing from winnow candidates")
    }
  }

  test("transition matrix counts each user's steps exactly once") {
    val m = q("q_events_transition")
      .select("from_type", "to_type", "n").as[(String, String, Long)].collect()
    val ev = Tables(spark, sf, "events")
    val users = ev.select(col("user_id")).distinct().count()
    val total = ev.count()
    // each user with k events contributes k-1 transitions
    assert(m.map(_._3).sum == total - users)
    // per-from shares sum to 1 within display rounding
    val p = q("q_events_transition").select("from_type", "p")
      .as[(String, Double)].collect()
    p.groupBy(_._1).foreach { case (ft, rows) =>
      val s = rows.map(_._2).sum
      assert(math.abs(s - 1.0) <= 0.001 * rows.length, s"$ft sums to $s")
    }
  }

  test("triangle counts match a brute-force closure of the pair graph") {
    val pairs = q("q_llm_jaccard_pairs")
      .select("d1", "d2").as[(Long, Long)].collect()
    val eset = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val cnt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- pairs; c <- nodes if c > b && eset((a, c)) && eset((b, c))) {
      cnt(a) += 1; cnt(b) += 1; cnt(c) += 1
    }
    val got = q("q_graph_triangles").as[(Long, Long)].collect().toMap
    assert(got == cnt.toMap,
      s"got ${got.size} nodes with triangles, expected ${cnt.size}")
    info(s"triangles at sf0.001: ${cnt.values.sum / 3} over ${cnt.size} nodes")
    // each triangle contributes exactly 3 corner credits
    assert(cnt.values.sum % 3 == 0)
  }
}
