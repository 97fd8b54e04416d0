package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-statistics readouts (exact values
  * are the oracle's job — Verify + DuckDB; these assert the properties
  * the metrics are DEFINED by, so a plausible-but-wrong formula can't
  * hash-match its own twin bug in the oracle). */
class CorpusStatsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("js_drift: one row per source, 0 ≤ JS ≤ ln 2, token total conserved") {
    val rows = q("q_llm_js_drift")
      .select("source", "n_tokens", "js_div")
      .as[(String, Long, Double)].collect()
    val sources = Tables(spark, sf, "documents")
      .select("source").distinct().as[String].collect().toSet
    assert(rows.map(_._1).toSet == sources)
    rows.foreach { case (s, _, js) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$s: js=$js")
    }
    val totalTokens = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_._2).sum == totalTokens)
  }

  test("js_drift: a one-source corpus has zero divergence from itself") {
    // P = Q exactly ⇒ every term contributes 0 and no absent mass exists
    val srcs = Tables(spark, sf, "documents")
      .select("source").distinct().as[String].collect().sorted
    val one = Tables(spark, sf, "documents")
      .filter(col("source") === srcs.head)
    assert(one.count() > 0, s"fixture lost source ${srcs.head}")
    val dir = java.nio.file.Files.createTempDirectory("graft-js-one")
    one.write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val js = SparkEntry.queries("q_llm_js_drift")(spark, dir.toString)
      .select("js_div").as[Double].collect()
    assert(js.length == 1 && math.abs(js.head) < 1e-6, js.mkString(","))
  }

  test("vocab_coverage: bounds hold and an OOV token implies OOV terms") {
    val rows = q("q_llm_vocab_coverage")
      .select("source", "n_tokens", "n_oov", "oov_terms", "coverage")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, nt, oov, oovT, cov) =>
      assert(oov >= 0 && oov <= nt, s"$s: oov=$oov of $nt")
      assert(cov >= 0.0 && cov <= 1.0, s"$s: coverage=$cov")
      assert((oov == 0) == (oovT == 0), s"$s: oov=$oov oov_terms=$oovT")
      assert(oovT <= oov, s"$s: distinct OOV terms exceed OOV tokens")
    }
    // the top-V vocab covers the corpus majority by construction
    // (V=512 highest-count terms): weighted coverage must beat 50%
    val tot = rows.map(_._2).sum.toDouble
    val covTok = rows.map(r => r._2 - r._3).sum.toDouble
    assert(covTok / tot > 0.5, s"weighted coverage ${covTok / tot}")
  }

  test("distinct_ngrams: count arithmetic ties out against the raw corpus") {
    val rows = q("q_llm_distinct_ngrams")
      .select("source", "n_uni", "d_uni", "distinct1", "n_bi", "d_bi",
        "distinct2")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, nu, du, d1, nb, db, d2) =>
      assert(du >= 1 && du <= nu, s"$s: d_uni=$du n_uni=$nu")
      assert(db <= nb, s"$s: d_bi=$db n_bi=$nb")
      assert(d1 > 0.0 && d1 <= 1.0 && d2 >= 0.0 && d2 <= 1.0, s"$s: $d1 $d2")
    }
    // bigrams per doc = max(tokens − 1, 0), unigrams per doc = tokens
    val docs = Tables(spark, sf, "documents")
      .groupBy("source").agg(
        sum(size(split(col("text"), " "))).as("ntok"),
        sum(greatest(size(split(col("text"), " ")) - 1, lit(0)))
          .as("nbi"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (s, nu, _, _, nb, _, _) =>
      val (ntok, nbi) = docs(s)
      assert(nu == ntok, s"$s: n_uni=$nu tokens=$ntok")
      assert(nb == nbi, s"$s: n_bi=$nb expected $nbi")
    }
  }
}
