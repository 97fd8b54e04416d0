package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import graft.operators.StageCache

/** Direct contract tests for the committed-stage cache that serves the
  * pair-graph, CC-closure, IVF-quantizer, and k-means consumers: build
  * exactly once per (JVM, fixture), serve every later read from the
  * committed parquet relation, rebuild only when the content
  * fingerprint changes, and collapse racing first consumers into one
  * build. (The GRAFT_STAGE_CACHE=off bypass is exercised end-to-end by
  * graft.ScaleBench, which requires it.) */
class StageCacheSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixtureKey(tag: String): String =
    Files.createTempDirectory(s"graft-scspec-$tag").toString

  test("stage builds once per (JVM, fixture); later reads serve the commit") {
    val dir = fixtureKey("once")
    val builds = new AtomicInteger(0)
    def rel = StageCache.relation(spark, "sc_once", dir)("fp1") {
      builds.incrementAndGet()
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }
    val first = rel.as[(Long, String)].collect().sortBy(_._1).toSeq
    val second = rel.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(builds.get == 1, "second consumer re-ran the build")
    assert(first == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(second == first, "committed relation drifted between reads")
  }

  test("fresh JVM serves an unchanged fingerprint, rebuilds a changed one") {
    val dir = fixtureKey("fp")
    val builds = new AtomicInteger(0)
    def rel(fp: String) = StageCache.relation(spark, "sc_fp", dir)(fp) {
      builds.incrementAndGet()
      Seq((builds.get.toLong, "x")).toDF("id", "v")
    }
    assert(rel("fp1").as[(Long, String)].collect().toSeq == Seq((1L, "x")))
    assert(builds.get == 1)
    // simulate a fresh JVM: the marker matches, so NO rebuild
    StageCache.forget("sc_fp", dir)
    assert(rel("fp1").as[(Long, String)].collect().toSeq == Seq((1L, "x")))
    assert(builds.get == 1, "unchanged fingerprint rebuilt across JVMs")
    // fresh JVM + changed fixture content: marker stale, MUST rebuild
    StageCache.forget("sc_fp", dir)
    assert(rel("fp2").as[(Long, String)].collect().toSeq == Seq((2L, "x")))
    assert(builds.get == 2, "changed fingerprint served the stale commit")
  }

  /** VERDICT r18 #6 — the StageCache line, pinned so it cannot drift:
    * the COMPLETE stage inventory, each stage's posture (declarer
    * computes vs r12-blessed committed-stage serve), and the rule that
    * a declarer's plan never scans its own stage's parquet. A new
    * stage, or a declarer quietly switching to reading its own output
    * (the r18 bpe_vocab regression), fails here. */
  private val DeclaredStages = Map(
    // declarer COMPUTES (its bench number is the declared computation);
    // consumers read the committed stage
    "jaccpairs" -> "q_llm_jaccard_pairs",
    "bpemerges" -> "q_llm_bpe_vocab",
    "docnll" -> "q_llm_ppl_bucket",
    "kmeans" -> "q_llm_kmeans",
    "kmcentroids" -> "q_llm_kmeans")
  private val ServedStages = Set(
    // r12-blessed decode/serve stages: the committed relation IS the
    // pipeline artifact (CC closures, IVF quantizer, BPE segmentation);
    // GRAFT_STAGE_CACHE=off (ScaleBench) still pays the full build
    "dupdocs", "semdedup", "semdedupapx", "ivfquant", "bpeseg")

  test("stage inventory is pinned: no new StageCache stage lands unreviewed") {
    import scala.jdk.CollectionConverters._
    val rx = """StageCache\.relation\([^,]+,\s*"(\w+)"""".r
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    val stages = withDirStream(Files.walk(srcRoot)) { it =>
      it.filter(_.toString.endsWith(".scala"))
        .flatMap(p => rx.findAllMatchIn(Files.readString(p)).map(_.group(1)))
        .toSet
    }
    val pinned = DeclaredStages.keySet ++ ServedStages
    assert(stages == pinned,
      s"stage registry drifted: +${stages -- pinned} -${pinned -- stages} — " +
        "update DeclaredStages/ServedStages deliberately (declarer must " +
        "compute; only r12-blessed artifacts may serve)")
  }

  /** File-backed leaves of the ANALYZED plan — unlike Dataset.inputFiles
    * (optimized plan), persisted subtrees don't hide their scans behind
    * InMemoryRelation here. */
  private def leafFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  test("every stage's declarer computes its stage (never reads its own output)") {
    DeclaredStages.foreach { case (stage, declarer) =>
      val files = leafFiles(q(declarer))
      val stageScan = files.filter(_.contains(s"graft-stage-$stage-"))
      assert(stageScan.isEmpty,
        s"$declarer reads its own committed stage '$stage' " +
          s"(${stageScan.take(2).mkString(", ")}) — the declarer's bench " +
          "number must be its declared computation (VERDICT r18 #6)")
    }
    // and the trainer queries still read the raw fixtures (not some
    // other committed intermediate standing in for the computation)
    assert(leafFiles(q("q_llm_ppl_bucket"))
      .exists(_.contains("documents.parquet")))
    assert(leafFiles(q("q_llm_kmeans"))
      .exists(_.contains("embeddings.parquet")))
    assert(leafFiles(q("q_llm_jaccard_pairs"))
      .exists(_.contains("documents.parquet")))
  }

  test("racing first consumers collapse into exactly one build") {
    val dir = fixtureKey("race")
    val builds = new AtomicInteger(0)
    def rel = StageCache.relation(spark, "sc_race", dir)("fp") {
      builds.incrementAndGet()
      Thread.sleep(200) // widen the race window
      Seq((7L, "r")).toDF("id", "v")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val results = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[Seq[(Long, String)]] {
          def call(): Seq[(Long, String)] =
            rel.as[(Long, String)].collect().toSeq
        }))
      results.foreach(f => assert(f.get() == Seq((7L, "r"))))
      assert(builds.get == 1, s"${builds.get} racing builds ran")
    } finally pool.shutdown()
  }
}
