package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, VectorAvg}

class VectorOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def embDbl = Tables(spark, sf, "embeddings")
    .select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("v"))

  test("custom cosine expression == higher-order-function formulation") {
    val e = embDbl.limit(50).select(col("vec_id"), col("v"))
    val a = e.alias("a"); val b = e.alias("b")
    val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
    val hof = {
      val dot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val n1 = aggregate(transform(col("a.v"), x => x * x), lit(0.0), (acc, x) => acc + x)
      val n2 = aggregate(transform(col("b.v"), x => x * x), lit(0.0), (acc, x) => acc + x)
      dot / (sqrt(n1) * sqrt(n2))
    }
    val diff = pairs
      .select(abs(CosineSimilarity.cosineSim(spark, col("a.v"), col("b.v")) - hof).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diff < 1e-12, s"max |expr - hof| = $diff")
  }

  test("cosine is symmetric and bounded") {
    val e = embDbl.limit(30).select(col("vec_id"), col("v"))
    val a = e.alias("a"); val b = e.alias("b")
    val sims = a.join(b, col("a.vec_id") =!= col("b.vec_id"))
      .select(CosineSimilarity.cosineSim(spark, col("a.v"), col("b.v")).as("s"),
        CosineSimilarity.cosineSim(spark, col("b.v"), col("a.v")).as("t"))
    val bad = sims.filter(abs(col("s") - col("t")) > 1e-15
      || col("s") > 1.0000001 || col("s") < -1.0000001).count()
    assert(bad == 0)
    // self-similarity = 1
    val self = e.select(CosineSimilarity.cosineSim(spark, col("v"), col("v")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-12).count()
    assert(self == 0)
  }

  test("VectorAvg aggregator == relational posexplode centroid") {
    val typed = embDbl.select(col("label"), col("v"))
      .as[(Int, Array[Double])]
    val byAgg = typed.groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAvg.agg.toColumn.name("centroid"))
      .collect().toMap
    val relational = embDbl
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
      .as[(Int, Array[Double])].collect().toMap
    assert(byAgg.keySet == relational.keySet)
    byAgg.foreach { case (k, v) =>
      val r = relational(k)
      assert(v.length == r.length)
      v.indices.foreach(i => assert(math.abs(v(i) - r(i)) < 1e-9,
        s"label $k pos $i: ${v(i)} vs ${r(i)}"))
    }
  }

  test("IVF ANN returns 5 neighbors per query with decent recall vs exact") {
    val exact = q("q_llm_cosine_topk").select("qid", "nbr")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ivf = q("q_llm_ann_ivf").select("qid", "nbr")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(ivf.keys.toSet == exact.keys.toSet)
    ivf.foreach { case (_, ns) => assert(ns.size == 5) }
    val recall = exact.map { case (k, ex) =>
      ivf(k).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    // label buckets are a coarse quantizer, not tuned clusters — expect
    // partial but non-trivial recall
    assert(recall >= 0.2, s"mean recall $recall")
    info(f"IVF mean recall vs exact top-5: $recall%.2f")
  }

  test("RP-LSH ANN: multi-table Hamming<=2 probing, recall >= bar, candidates <= 2.5%") {
    // ANN parameters target real corpus sizes; at the sf0.001 toy corpus
    // (50 vectors) bucket occupancy is pure noise, so this test runs at
    // sf0.01 (500 vectors), the same SF the driver's correctness gate uses.
    val sf01 = "/root/testdata/sf0.01"
    def q01(name: String) = SparkEntry.queries(name)(spark, sf01)
    val exact = q01("q_llm_cosine_topk").select("qid", "nbr")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val lsh = q01("q_llm_ann_lsh").select("qid", "nbr")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(lsh.keys.toSet.subsetOf(exact.keys.toSet))
    val recall = exact.map { case (k, ex) =>
      lsh.getOrElse(k, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    // the scale claim: candidates per query stay a small corpus fraction
    // (round-2 single-table shape probed 14%; the bar here is 2.5%)
    val nVec = Tables(spark, sf01, "embeddings").count()
    val nQueries = exact.size
    val cands = queries.VectorOps.annLshCandidates(spark, sf01).count()
    val frac = cands.toDouble / (nQueries * nVec)
    info(f"RP-LSH mean recall vs exact top-5: $recall%.2f, candidate fraction $frac%.4f")
    assert(recall >= 0.2, s"mean recall $recall")
    assert(frac <= 0.025, f"candidate fraction $frac%.4f")
    // determinism: seeded hyperplanes -> identical output across runs
    val r1 = q01("q_llm_ann_lsh").collect().map(_.toString).sorted
    val r2 = q01("q_llm_ann_lsh").collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
  }

  test("RpLshSig expression matches a straightforward Scala reference") {
    import graft.functions.{RpLshKernel, RpLshSig}
    val (l, bits, dim, seed) = (4, 16, 64, 7)
    val rows = embDbl.limit(20)
      .select(col("vec_id"), RpLshSig.rplshSig(spark, col("v"), l, bits, dim, seed).as("sigs"),
        col("v"))
      .as[(Long, Array[Int], Array[Double])].collect()
    val planes = RpLshKernel.planes(l, bits, dim, seed)
    rows.foreach { case (id, sigs, v) =>
      assert(sigs.length == l)
      for (t <- 0 until l; b <- 0 until bits) {
        val off = (t * bits + b) * dim
        val dot = (0 until dim).map(i => v(i) * planes(off + i)).sum
        val bit = (sigs(t) >> b) & 1
        assert(bit == (if (dot > 0) 1 else 0),
          s"vec $id table $t bit $b: dot=$dot sig bit=$bit")
      }
    }
  }

  test("int8 quantization reconstructs within half a step") {
    // dequant(code) = lo + code*scale must be within scale/2 of the
    // original value — the defining error bound of round-to-nearest
    // scalar quantization.
    val v = col("v")
    val lo = array_min(v)
    val scale = (array_max(v) - lo) / lit(255.0)
    val err = embDbl
      .select(col("vec_id"), v, lo.as("lo_raw"), scale.as("scale_raw"))
      .filter(col("scale_raw") > 0)
      .select(aggregate(
        zip_with(v,
          transform(v, x => col("lo_raw")
            + floor((x - col("lo_raw")) / col("scale_raw") + 0.5) * col("scale_raw")),
          (orig, deq) => abs(orig - deq) / col("scale_raw")),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_rel_err"))
      .agg(max(col("max_rel_err"))).as[Double].head()
    assert(err <= 0.5 + 1e-9, s"max |x - dequant| = $err steps")
  }

  test("multimodal struct assembly aligns doc and embedding 1:1") {
    val n = q("q_llm_multimodal").count()
    val docs = Tables(spark, sf, "documents").count()
    assert(n == docs)
  }
}
