package graft

import org.apache.spark.sql.functions._

/** Semantic unit tests for the round-9 quality operators (SURVEY §2.9 /
  * §2.10 additions). The DuckDB oracle checks cross-engine parity; these
  * pin the SEMANTICS against literal recomputations on the fixture. */
class QualityOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("sessionize: sessions respect the 30-minute gap rule exactly") {
    val sess = q("q_events_sessionize")
      .select("user_id", "session_id", "n_events", "start_s", "end_s")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sess.nonEmpty)
    // per user: session ids are 1..k, ranges ordered and separated by
    // > 30 min, and event counts sum to the user's event total
    val byUser = sess.groupBy(_._1)
    val evCounts = Tables(spark, sf, "events")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    byUser.foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to ss.length).toSeq)
      assert(sorted.forall { case (_, _, n, a, b) => n > 0 && a <= b })
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(n._4 - p._5 > 1800,
          s"user $u: sessions ${p._2}/${n._2} gap ${n._4 - p._5} <= 1800")
        case _ => ()
      }
      assert(sorted.map(_._3).sum == evCounts(u))
    }
  }

  test("sessionize agrees with a driver-side replay of the gap rule") {
    val got = q("q_events_sessionize")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"))
      .as[(Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var sid = 0L; var prev = Long.MinValue
      val ids = ordered.map { r =>
        if (prev == Long.MinValue || r._2 - prev > 1800) sid += 1
        prev = r._2; sid
      }
      ids.groupBy(identity).map { case (s, g) => (u, s, g.length.toLong) }
    }.toSet
    assert(got == want)
  }

  test("boilerplate catalog rows are per-source top-10 with true doc counts") {
    val rows = q("q_llm_boilerplate")
      .select("source", "rk", "chunk", "n_docs")
      .as[(String, Int, String, Long)].collect()
    // ranks are 1..k<=10 per source, counts non-increasing in rank
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"source $src: n_docs not non-increasing in rank")
    }
    // every reported chunk really occurs in that many distinct docs
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val chunkDocs = docs.flatMap { case (id, src, text) =>
      text.split(" ").grouped(8).map(c => (src, c.mkString(" "), id))
    }.distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    rows.foreach { case (src, _, chunk, n) =>
      assert(chunkDocs((src, chunk)).toLong == n)
    }
  }

  test("char classes partition every document's characters") {
    val r = q("q_llm_char_classes")
      .select("doc_id", "n_chars", "n_digit", "n_alpha", "n_space", "n_other")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == Tables(spark, sf, "documents").count())
    r.foreach { case (id, n, d, a, sp, o) =>
      assert(d + a + sp + o == n, s"doc $id: classes don't sum to n_chars")
      assert(Seq(d, a, sp, o).forall(_ >= 0))
    }
    // spot-check one doc against String.count
    val (id0, text0) = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].head()
    val row = r.find(_._1 == id0).get
    assert(row._3 == text0.count(_.isDigit).toLong)
    assert(row._4 == text0.count(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong)
    assert(row._5 == text0.count(_ == ' ').toLong)
  }

  test("embed outliers: bottom-10 per label by centroid cosine") {
    val out = q("q_llm_embed_outliers")
      .select("label", "rk", "vec_id", "sim")
      .as[(Int, Int, Long, Double)].collect()
    val labels = Tables(spark, sf, "embeddings")
      .select("label").distinct().as[Int].collect()
    assert(out.groupBy(_._1).keySet == labels.toSet)
    out.groupBy(_._1).foreach { case (l, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rs.length).toSeq)
      // sims non-decreasing in rank (these are the LEAST similar)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 <= b._4
        case _ => true
      }, s"label $l: sims not sorted ascending")
    }
    // replay one label's centroid cosine in driver code (integer-exact
    // quantized centroid, like the operator)
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    val l0 = labels.min
    val group = vecs.filter(_._2 == l0)
    val dim = group.head._3.length
    val cent = Array.tabulate(dim) { i =>
      group.map(v => math.floor(v._3(i).toDouble * 1e6 + 0.5).toLong).sum
        .toDouble
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = group.map { case (id, _, v) =>
      (id, cos(v.map(_.toDouble), cent))
    }.sortBy { case (id, s) => (s, id) }.take(10).map(_._1).toSeq
    val got = out.filter(_._1 == l0).sortBy(_._2).map(_._3).toSeq
    assert(got == want, s"label $l0: got $got want $want")
  }
  test("readability: counts tie out against an in-JVM recomputation") {
    val got = q("q_llm_readability")
      .select("doc_id", "n_words", "n_sents", "n_long", "lix")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    got.foreach { case (id, w, sn, lg, lix) =>
      val toks = docs(id).split(" ", -1)
      assert(w == toks.length, s"doc $id words")
      assert(sn == math.max(docs(id).count(".!?".contains(_)), 1),
        s"doc $id sentences")
      assert(lg == toks.count(_.length >= 7), s"doc $id long words")
      val want = math.floor((w.toDouble / sn + 100.0 * lg / w) * 1e4 + 0.5) / 1e4
      assert(lix == want, s"doc $id lix $lix != $want")
    }
  }

  test("lang confusion: row sums tie out; diagonal equals lang_id correct") {
    val cells = q("q_llm_lang_confusion")
      .select("lang", "pred", "n", "share")
      .as[(String, String, Long, Double)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (l, p, n, sh) =>
      assert(n > 0 && sh > 0.0 && sh <= 1.0, s"($l,$p): n=$n share=$sh")
    }
    // per declared lang: cell counts sum to the lang's doc count and
    // shares sum to ~1
    val docCounts = Tables(spark, sf, "documents")
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    cells.groupBy(_._1).foreach { case (l, cs) =>
      assert(cs.map(_._3).sum == docCounts(l), s"$l row sum")
      assert(math.abs(cs.map(_._4).sum - 1.0) < 1e-3, s"$l share sum")
    }
    // the diagonal mass equals q_llm_lang_id's per-doc correct count
    val diag = cells.filter(c => c._1 == c._2).map(_._3).sum
    val correct = q("q_llm_lang_id")
      .agg(sum(col("correct"))).as[Long].head()
    assert(diag == correct, s"diagonal $diag != lang_id correct $correct")
  }

}
