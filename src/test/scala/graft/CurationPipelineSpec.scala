package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{CurationPipeline, ExactlyOnceSink, KafkaEnvelope}

/** Semantic invariants of the composed streaming curation pipeline
  * (doc topic → decode → gate → dedup → mask → exactly-once commit):
  * the corpus the daemon accumulates must be exactly what batch
  * curation over the same input would produce — gated, one row per
  * unique raw text, first-write-wins, masked — and replay must change
  * nothing. */
class CurationPipelineSpec extends SparkSpecBase {

  private def tmp(tag: String): String =
    Files.createTempDirectory(tag).toString

  test("curated ingest: gated, exactly-deduped, masked, replay-idempotent corpus") {
    val docs0 = Tables(spark, sf, "documents")
    val maxId = docs0.agg(max("doc_id")).head().getLong(0) + 1
    // 2x volume scale with IDENTICAL text: every doc has an exact dup in
    // another envelope partition (doc_id differs -> partition differs),
    // so cross-batch dedup must do real work
    val docs = docs0.unionByName(
      docs0.withColumn("doc_id", col("doc_id") + maxId))

    val topicDir = tmp("graft-cur-topic")
    val tableDir = tmp("graft-cur-table")
    KafkaEnvelope.writeDocTopicFrom(docs, topicDir, nPartitions = 4,
      chunksPerPartition = 2)
    val sink = new ExactlyOnceSink(tableDir, appId = "graft-cur-spec")

    def drain(ckpt: String): Unit = {
      val qy = KafkaEnvelope.decodeDocs(
          KafkaEnvelope.readStream(spark, topicDir, maxFilesPerTrigger = 2))
        .select("doc_id", "text", "lang", "source")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          CurationPipeline.curateBatch(df, sink, id)
        }
        .start()
      qy.awaitTermination(180000)
    }
    val ckpt = tmp("graft-cur-ckpt")
    drain(ckpt)

    val table = sink.read(spark)
    val kept = table.count()

    // 1. one row per unique GATED raw text (hash identity, not doc_id)
    val expect = docs0.filter(CurationPipeline.gate(col("text")))
      .select(md5(col("text"))).distinct().count()
    assert(kept == expect, s"corpus $kept rows != $expect unique gated texts")
    assert(kept > 0 && kept < docs.count(), "gate+dedup dropped nothing")
    assert(table.select("h").distinct().count() == kept, "duplicate hashes")

    // 2. winners come from the source, gated, and hash back to their h
    //    OVER THE RAW TEXT (mask applied after hashing): every committed
    //    h must exist among the raw gated source hashes
    val srcHashes = docs0.filter(CurationPipeline.gate(col("text")))
      .select(md5(col("text")).as("h")).distinct()
    assert(table.select("h").except(srcHashes).count() == 0,
      "committed hash not derivable from raw gated source text")

    // 3. masking: no email or digit run survives in committed text
    assert(table.filter(col("text").rlike("[0-9]")).count() == 0)
    assert(table.filter(
      col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).count() == 0)

    // 4. replay: a fresh stream over the same topic + a NEW checkpoint
    //    re-delivers every batch; batchId-keyed claims make it a no-op
    drain(tmp("graft-cur-ckpt2"))
    assert(sink.read(spark).count() == kept, "replay changed the corpus")
  }

  /** Same one-sided collapse gate for the NEAR-DUP arm — the most
    * expensive streaming curation stage (signature kernel + band
    * self-join + committed-signature candidate join per batch); a
    * silently quadratic candidate path must not ship as prose. */
  test("near-dup ingest throughput has not collapsed vs the committed golden") {
    val goldenPath = java.nio.file.Paths.get("golden/neardup_r12.json")
    val r = IngestBench.runDocsNearDup(spark, "/root/testdata/sf0.01",
      scale = 4, batches = 4)
    assert(r.batches >= 4, "per-batch near-dup cost not exercised")
    val json =
      f"""{
  "config": "local[4] sf=/root/testdata/sf0.01 scale=4 batches=4 neardup",
  "rows": ${r.rows}%d,
  "kept": ${r.kept}%d,
  "test.rps": ${r.rps}%.0f
}
"""
    if (sys.env.contains("GRAFT_REGEN_GOLDEN") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, json)
      info(s"golden regenerated at $goldenPath: rps=${r.rps.toInt}")
    } else {
      val committed = Files.readString(goldenPath)
      val rps = """"test\.rps":\s*([0-9.eE]+)""".r
        .findFirstMatchIn(committed)
        .getOrElse(fail(s"no test.rps in $goldenPath")).group(1).toDouble
      info(f"measured ${r.rps}%.0f docs/s vs golden $rps%.0f docs/s")
      assert(r.rps >= 0.5 * rps,
        f"near-dup ingest collapsed: ${r.rps}%.0f docs/s < 50%% of golden " +
          f"$rps%.0f; if intentional, regenerate with GRAFT_REGEN_GOLDEN=1")
    }
  }

  /** One-sided collapse gate like GoldenIngestSpec: the curated docs arm
    * runs IngestBench.runDocs' exact code path at a small fixed config
    * and fails below 50% of golden/curated_r12.json — a silently
    * quadratic probe or a mask regression can't ship as prose.
    * Regenerate with GRAFT_REGEN_GOLDEN=1 after intentional change. */
  test("curated ingest throughput has not collapsed vs the committed golden") {
    val goldenPath = java.nio.file.Paths.get("golden/curated_r12.json")
    val r = IngestBench.runDocs(spark, "/root/testdata/sf0.01",
      scale = 4, batches = 4, curated = true)
    assert(r.batches >= 4, "per-batch curation cost not exercised")
    val json =
      f"""{
  "config": "local[4] sf=/root/testdata/sf0.01 scale=4 batches=4 curated",
  "rows": ${r.rows}%d,
  "kept": ${r.kept}%d,
  "test.rps": ${r.rps}%.0f
}
"""
    if (sys.env.contains("GRAFT_REGEN_GOLDEN") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, json)
      info(s"golden regenerated at $goldenPath: rps=${r.rps.toInt}")
    } else {
      val committed = Files.readString(goldenPath)
      val rps = """"test\.rps":\s*([0-9.eE]+)""".r
        .findFirstMatchIn(committed)
        .getOrElse(fail(s"no test.rps in $goldenPath")).group(1).toDouble
      info(f"measured ${r.rps}%.0f docs/s vs golden $rps%.0f docs/s")
      assert(r.rps >= 0.5 * rps,
        f"curated ingest collapsed: ${r.rps}%.0f docs/s < 50%% of golden " +
          f"$rps%.0f; if intentional, regenerate with GRAFT_REGEN_GOLDEN=1")
    }
  }
}
