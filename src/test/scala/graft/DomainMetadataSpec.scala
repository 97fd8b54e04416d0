package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Domain metadata (ExactlyOnceSink, the Delta `domainMetadata` action
  * analog): a general named-metadata slot — per-domain latest-wins
  * deltas (set / remove), folded incrementally, surviving checkpoint +
  * cleanupLog through the aux header and riding clones with the log.
  * Clustered writes record their columns in `graft.clustering` through
  * the same verb, the Delta pattern of building clustering state on
  * domain metadata. */
class DomainMetadataSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-domain-spec").toString

  test("set / update / remove fold per domain, latest-wins") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, "a")).toDF("id", "x"))
    sink.setDomainMetadata("app.retention", Map("days" -> "30"))
    sink.setDomainMetadata("app.owner", Map("team" -> "data"))
    assert(sink.domainMetadata("app.retention") === Some(Map("days" -> "30")))
    // update touches ONLY its domain (per-domain delta, not a whole-set
    // replacement)
    sink.setDomainMetadata("app.retention", Map("days" -> "7"))
    assert(sink.domainMetadata("app.retention") === Some(Map("days" -> "7")))
    assert(sink.domainMetadata("app.owner") === Some(Map("team" -> "data")))
    sink.removeDomainMetadata("app.owner")
    assert(sink.domainMetadata("app.owner").isEmpty)
    assert(sink.activeDomains().keySet === Set("app.retention"))
    // removing an unknown domain is a no-op commit (IF EXISTS shape)
    sink.removeDomainMetadata("never.was")
    // a cold reader folds the same state from the raw log
    assert(new ExactlyOnceSink(dir).activeDomains() ===
      Map("app.retention" -> Map("days" -> "7")))
  }

  test("domains survive checkpoint + cleanupLog via the aux header, and ride clones") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir, checkpointInterval = 3)
    sink.commitAppend(Seq((1L, "a")).toDF("id", "x"))
    sink.setDomainMetadata("app.retention", Map("days" -> "30"))
    sink.setDomainMetadata("app.tmp", Map("k" -> "v"))
    sink.removeDomainMetadata("app.tmp")
    (0 until 6).foreach(i =>
      sink.commitAppend(Seq((10L + i, "b")).toDF("id", "x")))
    sink.cleanupLog(minAgeMs = 0) // the carrier commits are reclaimed
    val cold = new ExactlyOnceSink(dir)
    assert(cold.activeDomains() === Map("app.retention" -> Map("days" -> "30")),
      "domain state must survive retention through the checkpoint aux")
    // clones carry the domains with the log they copy
    val cloneDir = Files.createTempDirectory("graft-domain-clone").toString
    sink.cloneTo(cloneDir)
    assert(new ExactlyOnceSink(cloneDir).activeDomains() ===
      Map("app.retention" -> Map("days" -> "30")))
    // divergence: a clone-side domain write never leaks to the source
    new ExactlyOnceSink(cloneDir).setDomainMetadata("app.side", Map("c" -> "1"))
    assert(new ExactlyOnceSink(dir).activeDomains().keySet ===
      Set("app.retention"))
  }

  test("clustered writes record graft.clustering; readers discover the layout from the log") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("a", pmod(col("id") * 37, lit(100)))
      .withColumn("b", pmod(col("id") * 91, lit(100)))
    sink.commitAppend(df, clusterBy = Seq("a", "b"), clusterFiles = 4)
    assert(sink.domainMetadata("graft.clustering") ===
      Some(Map("columns" -> "a,b")),
      "a clustered append must record its clustering columns")
    // an unclustered append leaves the domain untouched
    sink.commitAppend(Seq((9999L, 1L, 1L)).toDF("id", "a", "b"))
    assert(sink.domainMetadata("graft.clustering") ===
      Some(Map("columns" -> "a,b")))
    // incremental OPTIMIZE with a different layout re-records it
    (0 until 3).foreach(_ => sink.commitAppend(
      spark.range(0, 50).toDF("id")
        .withColumn("a", lit(1L)).withColumn("b", lit(2L)).coalesce(1)))
    sink.compactSmall(spark, targetBytes = 1L << 20, clusterBy = Seq("b"))
    assert(sink.domainMetadata("graft.clustering") ===
      Some(Map("columns" -> "b")))
  }

  test("a clustered AND bloom-striped write records both domains in one commit") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(
      spark.range(0, 100).toDF("id").withColumn("u", col("id") * 7 % 100),
      clusterBy = Seq("id"), bloomBy = Seq("u"), bloomBits = 2048)
    assert(sink.domainMetadata("graft.clustering") ===
      Some(Map("columns" -> "id")))
    // the bloom domain records PHYSICAL columns + the bitmap width
    assert(sink.domainMetadata("graft.bloom") ===
      Some(Map("columns" -> "u", "bits" -> "2048")))
    // and user domains set later coexist with both write-recorded ones
    sink.setDomainMetadata("app.tag", Map("k" -> "v"))
    assert(sink.activeDomains().keySet ===
      Set("graft.clustering", "graft.bloom", "app.tag"))
  }
}
