package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{CommitStore, CurationPipeline, ExactlyOnceSink,
  KafkaEnvelope}

/** The STREAMING ingest paths over the emulated object-store
  * ConditionalPut commit store (round 18, r17 "what's missing" #3): the
  * OCC fuzz, the two-JVM adversary and CommitStoreSpec already prove
  * the claim primitive over both backends, but the streaming writer —
  * the component the object-store posture exists for at the 100 TB
  * target — ran only over the POSIX default. Each arc here is the core
  * of its StreamingSpec twin with every sink constructed on
  * `CommitStore.ConditionalPut`: process() exactly-once + replay,
  * appendBatch's streamTxn cursor, the dead-letter split, the
  * tailChanges table→table replication loop, and the near-dup ingest
  * stage. Same assertions — the contract must not care which backend
  * materialized the log. */
class CputStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private val store = CommitStore.ConditionalPut

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("cput: envelope stream -> process() lands exactly-once, replay no-ops") {
    val topicDir = tmp("graft-cput-topic")
    val tableDir = tmp("graft-cput-table")
    val ckpt = tmp("graft-cput-ckpt")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 4)
    val sink = new ExactlyOnceSink(tableDir, storeFactory = store)
    val stream = KafkaEnvelope.decode(KafkaEnvelope.readStream(spark, topicDir, 2))
      .select("event_id", "ts", "user_id", "event_type", "event_value")
    val qy = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.process(df, id))
      .start()
    qy.awaitTermination(120000)
    val expected = Tables(spark, sf, "events").count()
    assert(sink.read(spark).count() === expected)
    assert(sink.read(spark).select("event_id").distinct().count() === expected)
    // replaying a committed batch over the cput store is a no-op
    val versions = sink.committedVersions()
    sink.process(sink.read(spark).limit(3)
      .select("event_id", "ts", "user_id", "event_type", "event_value"),
      versions.head)
    assert(sink.committedVersions() === versions)
    assert(sink.read(spark).count() === expected)
  }

  test("cput: appendBatch streamTxn cursor survives replay and a rival OCC writer") {
    val dir = tmp("graft-cput-cursor")
    val sink = new ExactlyOnceSink(dir, storeFactory = store)
    // metadata commit first, so versions diverge from batchIds (the
    // appendBatch use case)
    sink.setConstraint(spark, "pos", "id >= 0")
    assert(sink.appendBatch(Seq((1L, "a")).toDF("id", "x"), batchId = 0,
      streamAppId = "s1") >= 0)
    // a rival OCC writer interleaves on the same cput log
    new ExactlyOnceSink(dir, appId = "rival", storeFactory = store)
      .commitAppend(Seq((50L, "r")).toDF("id", "x"))
    assert(sink.appendBatch(Seq((2L, "b")).toDF("id", "x"), batchId = 1,
      streamAppId = "s1") >= 0)
    // replayed batches no-op
    assert(sink.appendBatch(Seq((1L, "dup")).toDF("id", "x"), batchId = 0,
      streamAppId = "s1") === -1L)
    assert(sink.appendBatch(Seq((2L, "dup")).toDF("id", "x"), batchId = 1,
      streamAppId = "s1") === -1L)
    assert(sink.read(spark).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 50L))
  }

  test("cput: malformed records quarantine to a dead-letter sink exactly-once") {
    val topicDir = tmp("graft-cput-dlq-topic")
    val mainDir = tmp("graft-cput-dlq-main")
    val dlqDir = tmp("graft-cput-dlq-dead")
    val ckpt = tmp("graft-cput-dlq-ckpt")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 2)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("user_id", "long")
    val mainSink = new ExactlyOnceSink(mainDir, storeFactory = store)
    val dlqSink = new ExactlyOnceSink(dlqDir, appId = "graft-dlq",
      storeFactory = store)
    val stream = KafkaEnvelope.readStream(spark, topicDir, 2)
      .withColumn("value",
        when(pmod(col("offset"), lit(7)) === 0,
          concat(lit("{corrupt::"), col("value"))).otherwise(col("value")))
      .withColumn("decoded", from_json(col("value"), schema))
    val qy = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        mainSink.process(df.filter(col("decoded.event_id").isNotNull)
          .select(col("decoded.event_id").as("event_id"),
            col("decoded.user_id").as("user_id")), id)
        dlqSink.process(df.filter(col("decoded.event_id").isNull)
          .select(col("topic"), col("partition"), col("offset"),
            col("value")), id)
      }
      .start()
    qy.awaitTermination(120000)
    val total = Tables(spark, sf, "events").count()
    val goodN = mainSink.read(spark).count()
    val deadN = dlqSink.read(spark).count()
    assert(goodN + deadN === total, s"$goodN good + $deadN dead != $total")
    assert(deadN > 0, "no corrupt records hit the DLQ")
    // replaying committed batches is a no-op on BOTH cput tables
    val (v1, v2) = (mainSink.committedVersions(), dlqSink.committedVersions())
    v1.foreach(b => mainSink.process(
      mainSink.read(spark).limit(1).select("event_id", "user_id"), b))
    assert(mainSink.committedVersions() === v1)
    assert(dlqSink.committedVersions() === v2)
  }

  test("cput: tailChanges replication loop converges over both cput tables") {
    val srcDir = tmp("graft-cput-repl-src")
    val dstDir = tmp("graft-cput-repl-dst")
    val ckpt = tmp("graft-cput-repl-ckpt")
    val src = new ExactlyOnceSink(srcDir, appId = "repl-src",
      storeFactory = store)
    val dst = new ExactlyOnceSink(dstDir, appId = "repl-dst",
      storeFactory = store)
    def state(s: ExactlyOnceSink): Map[Long, String] = {
      val df = s.read(spark)
      if (!df.columns.contains("id")) Map.empty
      else df.select("id", "x").as[(Long, String)].collect().toMap
    }
    def drain(): Unit = {
      val qy = src.tailChanges(spark, ckpt) { (changes, _) =>
        val byV = changes.select(col("batch"), col("_change_type"),
            col("id"), col("x")).collect()
          .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        byV.foreach { case (_, rows) =>
          val ups = rows.filter(r =>
            r.getString(1) == "insert" || r.getString(1) == "update_postimage")
            .map(r => (r.getLong(2), r.getString(3))).toSeq
          if (ups.nonEmpty) dst.mergeDV(spark, ups.toDF("id", "x"), Seq("id"))
          val dels = rows.filter(_.getString(1) == "delete").map(_.getLong(2))
          if (dels.nonEmpty) dst.deleteDV(spark, col("id").isin(dels.toSeq: _*))
        }
      }
      qy.awaitTermination(120000)
    }
    src.commitAppend(Seq.tabulate(20)(i => (i.toLong, s"v$i")).toDF("id", "x"))
    src.mergeDV(spark, Seq((3L, "u3"), (30L, "n30")).toDF("id", "x"), Seq("id"))
    drain()
    assert(state(dst) === state(src), "cput replica diverged after first drain")
    src.deleteDV(spark, col("id") < 5L)
    src.merge(spark, Seq((7L, "u7")).toDF("id", "x"), Seq("id"))
    drain()
    assert(state(dst) === state(src), "cput replica diverged after second drain")
  }

  test("cput: near-dup ingest keeps the committed corpus near-dup-free") {
    val streamDir = tmp("graft-cput-nd-stream")
    val tableDir = tmp("graft-cput-nd-table")
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .filter(col("doc_id") < 250)
    (0 until 2).foreach { k =>
      val part = tmp(s"graft-cput-nd-part$k")
      docs.filter(pmod(col("doc_id"), lit(2)) === k)
        .coalesce(1).write.mode("overwrite").parquet(part)
      val f = withDirStream(Files.list(Paths.get(part)))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).next())
      Files.move(f, Paths.get(streamDir, f"chunk-$k%02d.parquet"))
    }
    val sink = new ExactlyOnceSink(tableDir, storeFactory = store)
    val qy = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
      .writeStream.option("checkpointLocation", tmp("graft-cput-nd-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        CurationPipeline.nearDupBatch(df, sink, id)
        ()
      }
      .start()
    qy.awaitTermination(180000)
    val table = sink.read(spark)
    val nCommitted = table.select("doc_id").distinct().count()
    assert(nCommitted > 0 && nCommitted < docs.count(),
      s"cput ingest dedup dropped nothing ($nCommitted of ${docs.count()})")
    val hinter = graft.functions.SortedIntersectSize
      .sortedIntersectSize(spark, _: org.apache.spark.sql.Column,
        _: org.apache.spark.sql.Column)
    val a = table.select(col("band"), col("bkey"), col("doc_id").as("d1"),
      col("hs").as("hs_a"), col("sz").as("sz_a"))
    val b = table.select(col("band"), col("bkey"), col("doc_id").as("d2"),
      col("hs").as("hs_b"), col("sz").as("sz_b"))
    val residual = a.join(b, Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .filter(hinter(col("hs_a"), col("hs_b")) * 3 >= col("sz_a") + col("sz_b"))
      .count()
    assert(residual === 0, s"$residual near-dup pairs survived cput ingest")
  }
}
