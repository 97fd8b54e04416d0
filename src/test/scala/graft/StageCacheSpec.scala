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
