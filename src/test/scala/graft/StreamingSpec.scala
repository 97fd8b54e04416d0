package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{ExactlyOnceSink, KafkaEnvelope, StatefulOps}

/** SURVEY.md §2.8/§5.4: the incremental forms — emulated Kafka envelope
  * source, watermarks + late data, streaming dedup, custom state, and the
  * exactly-once commit protocol incl. crash/replay idempotence. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("envelope topic -> readStream -> decode -> exactly-once sink == batch events") {
    val topicDir = tmp("graft-topic")
    val tableDir = tmp("graft-table")
    val ckpt = tmp("graft-ckpt")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 4)

    val sink = new ExactlyOnceSink(tableDir)
    val stream = KafkaEnvelope.decode(KafkaEnvelope.readStream(spark, topicDir, 2))
      .select("event_id", "ts", "user_id", "event_type", "event_value")
    val qy = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.process(df, id))
      .start()
    qy.awaitTermination(120000)

    val committed = sink.read(spark)
    val expected = Tables(spark, sf, "events").count()
    assert(committed.count() == expected,
      s"sink rows ${committed.count()} != events $expected")
    assert(committed.select("event_id").distinct().count() == expected)
    assert(sink.committedVersions().nonEmpty)
  }

  test("ingest pipeline: stream -> per-batch dedup vs committed corpus -> sink") {
    // The deltasink end-to-end: an at-least-once envelope stream lands
    // exactly-once AND content-deduplicated — each micro-batch drops rows
    // whose payload hash already exists in the committed table (the
    // streaming form of q_llm_cross_dedup), then appends the survivors.
    val topicDir = tmp("graft-ddtopic")
    val tableDir = tmp("graft-ddtable")
    val ckpt = tmp("graft-ddckpt")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 4)

    val sink = new ExactlyOnceSink(tableDir)
    def payloadHash = md5(concat_ws("|",
      col("user_id"), col("event_type"), col("event_value")))
    val stream = KafkaEnvelope.decode(KafkaEnvelope.readStream(spark, topicDir, 2))
      .select("event_id", "user_id", "event_type", "event_value")
    val qy = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val batch = df.withColumn("h", payloadHash)
          .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
            .Window.partitionBy("h").orderBy("event_id")))
          .filter(col("rn") === 1).drop("rn") // in-batch dedup, keep-first
        val corpus = sink.read(df.sparkSession)
        val novel =
          if (corpus.isEmpty) batch
          else batch.join(corpus.select("h"), Seq("h"), "left_anti")
        sink.process(novel, id)
      }
      .start()
    qy.awaitTermination(120000)

    val committed = sink.read(spark)
    val expected = Tables(spark, sf, "events")
      .select(md5(concat_ws("|", col("user_id"), col("event_type"),
        col("value"))).as("h"))
      .distinct().count()
    assert(committed.count() == expected,
      s"committed ${committed.count()} != distinct payloads $expected")
    assert(committed.select("h").distinct().count() == expected)
  }

  test("chunked topic replays per-partition offsets in order across micro-batches") {
    // the Kafka contract the envelope emulates: chunk k of a partition
    // must land in an earlier-or-equal micro-batch than chunk k+1, so a
    // consumer never sees a partition's offsets go backwards between
    // triggers (KafkaEnvelope.writeTopicFrom chunk-major file naming)
    val topicDir = tmp("graft-chunked-topic")
    KafkaEnvelope.writeTopicFrom(Tables(spark, sf, "events"), topicDir,
      nPartitions = 4, chunksPerPartition = 3)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long)]()
    val qy = KafkaEnvelope.readStream(spark, topicDir, maxFilesPerTrigger = 2)
      .writeStream
      .option("checkpointLocation", tmp("graft-chunked-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.groupBy("partition")
          .agg(min("offset").as("lo"), max("offset").as("hi"))
          .collect().foreach(r => seen.synchronized {
            seen += ((id, r.getInt(0), r.getLong(1), r.getLong(2)))
          }): Unit)
      .start()
    qy.awaitTermination(120000)
    assert(seen.map(_._1).distinct.size > 1, "expected multiple micro-batches")
    // per partition, ordered by batch id: each batch's min offset must
    // follow the previous batch's max (no offset ever goes backwards)
    seen.groupBy(_._2).foreach { case (p, rows) =>
      val byBatch = rows.sortBy(_._1)
      byBatch.zip(byBatch.drop(1)).foreach {
        case ((b1, _, _, hi1), (b2, _, lo2, _)) =>
          assert(lo2 > hi1,
            s"partition $p: batch $b2 starts at offset $lo2 <= batch $b1's max $hi1")
      }
      // and the union of batches is the gap-free log 0..n
      val offsets = byBatch.flatMap { case (_, _, lo, hi) => Seq(lo, hi) }
      assert(offsets.head == 0L, s"partition $p log does not start at 0")
    }
  }

  test("topic part-file mtimes are strictly increasing in name order") {
    // FileStreamSource orders candidate files by MODIFICATION TIME (name
    // only breaks ms-ties), and concurrent write tasks finish in arbitrary
    // order — writeTopicFrom must therefore re-stamp mtimes so the mtime
    // order equals the chunk-major name order, or chunk k+1 can be
    // consumed before chunk k and the previous spec turns flaky.
    val topicDir = tmp("graft-mtime-topic")
    KafkaEnvelope.writeTopicFrom(Tables(spark, sf, "events"), topicDir,
      nPartitions = 4, chunksPerPartition = 3)
    val parts = new java.io.File(topicDir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
    assert(parts.length >= 12, s"expected >=12 part files, got ${parts.length}")
    parts.zip(parts.drop(1)).foreach { case (a, b) =>
      assert(a.lastModified() < b.lastModified(),
        s"${a.getName} mtime ${a.lastModified()} !< " +
          s"${b.getName} mtime ${b.lastModified()}")
    }
  }

  test("sink replay of an already-committed batch is a no-op (exactly-once)") {
    val tableDir = tmp("graft-replay")
    val sink = new ExactlyOnceSink(tableDir)
    val df = Tables(spark, sf, "events").limit(100)
    sink.process(df, 0L)
    val n1 = sink.read(spark).count()
    sink.process(df, 0L) // crash-recovery replay of the same micro-batch
    val n2 = sink.read(spark).count()
    assert(n1 == 100 && n2 == 100, s"replay duplicated rows: $n1 -> $n2")
  }

  test("crashed attempt (staged data, no commit) is invisible, then repaired") {
    val tableDir = tmp("graft-crash")
    val sink = new ExactlyOnceSink(tableDir)
    val df = Tables(spark, sf, "events").limit(50)
    // simulate crash AFTER data move, BEFORE commit: data dir exists,
    // log entry does not
    val target = Paths.get(tableDir, "data", "batch=7")
    Files.createDirectories(target)
    Files.writeString(target.resolve("garbage.parquet"), "not parquet")
    assert(sink.read(spark).count() == 0, "uncommitted data visible to readers")
    // retry of batch 7 must clean the leftovers and commit atomically
    sink.process(df, 7L)
    assert(sink.read(spark).count() == 50)
  }

  test("sink time travel and schema evolution across commits") {
    val tableDir = tmp("graft-evolve")
    val sink = new ExactlyOnceSink(tableDir)
    val v0 = Tables(spark, sf, "events")
      .select("event_id", "user_id").limit(10)
    val v1 = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .limit(5)
    sink.process(v0, 0L)
    // write-time enforcement: the widened batch is rejected until the
    // caller opts into evolution — Delta's write-path default
    val rejected = intercept[RuntimeException](sink.process(v1, 1L))
    assert(rejected.getMessage.contains("mergeSchema"))
    assert(sink.read(spark).count() == 10, "rejected write must commit nothing")
    sink.process(v1, 1L, mergeSchema = true) // widened schema: + event_type
    // a type flip is never evolution: same column name, different type
    val flipped = Tables(spark, sf, "events")
      .select(col("event_id").cast("string"), col("user_id")).limit(3)
    val conflict = intercept[RuntimeException](
      sink.process(flipped, 2L, mergeSchema = true))
    assert(conflict.getMessage.contains("type mismatch"))
    // the merge/replace verbs enforce the same contract
    val badMerge = intercept[RuntimeException](
      sink.merge(spark, flipped, Seq("event_id")))
    assert(badMerge.getMessage.contains("type mismatch"))
    // a frame OMITTING columns is fine (null-padded on read)
    sink.process(v0.limit(0), 3L)
    // time travel: state as of version 0 has the original schema/rows
    val asOf0 = sink.read(spark, versionAsOf = Some(0L))
    assert(asOf0.count() == 10)
    assert(!asOf0.columns.contains("event_type"))
    // evolved read: union schema, old rows null-padded
    val cur = sink.read(spark, mergeSchema = true)
    assert(cur.count() == 15)
    assert(cur.columns.contains("event_type"))
    assert(cur.filter(col("event_type").isNull).count() == 10)
    // the log's metaData action records the evolved schema
    assert(sink.latestSchema().exists(_.fieldNames.contains("event_type")))
  }

  test("sink MERGE upserts, DELETE removes, compaction preserves state; history intact") {
    val tableDir = tmp("graft-merge")
    val sink = new ExactlyOnceSink(tableDir)
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    sink.process(base, 0L)
    // upsert: id 2 updated, id 4 inserted
    val mv = sink.merge(spark,
      Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v"), Seq("id"))
    assert(sink.read(spark).count() == 4)
    val m = sink.read(spark).select("id", "name").as[(Long, String)].collect().toMap
    assert(m(2L) == "B" && m(4L) == "d" && m(1L) == "a")
    // delete id 1
    sink.delete(spark, col("id") === 1L)
    assert(sink.read(spark).select("id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    // compaction: state unchanged (modulo the batch version cursor)
    val before = sink.read(spark).drop("batch")
      .collect().map(_.toString).sorted.toSeq
    sink.compact(spark)
    val after = sink.read(spark).drop("batch")
      .collect().map(_.toString).sorted.toSeq
    assert(before == after)
    // time travel: pre-merge state still readable at version 0
    val v0 = sink.read(spark, versionAsOf = Some(0L))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(v0 == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // and as-of the merge version: updated but not yet deleted
    val v1 = sink.read(spark, versionAsOf = Some(mv))
      .select("id").as[Long].collect().toSet
    assert(v1 == Set(1L, 2L, 3L, 4L))
  }

  test("live read (recorded-schema scan) equals the as-of-latest read (inference scan)") {
    // r19 read-path optimization: LIVE flat reads take the recorded
    // physical schema (no footer-inference job per commit); versionAsOf
    // keeps the legacy inference read. Reading live vs as-of the latest
    // version must be value-identical across evolution (null-padded old
    // rows), a widening append (int→long coercion now happens in the
    // parquet reader instead of unionByName) and a deletion vector.
    val tableDir = tmp("graft-schemaread")
    val sink = new ExactlyOnceSink(tableDir)
    sink.commitAppend(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "c"))
    // widening append: c becomes long, values beyond int range
    sink.commitAppend(Seq((4L, 3000000000L), (5L, 3000000001L)).toDF("id", "c"),
      mergeSchema = true)
    // evolution append: new column x, old rows null-padded
    sink.commitAppend(Seq((6L, 60L, "x6")).toDF("id", "c", "x"),
      mergeSchema = true)
    // merge-on-read delete: live read goes through scanWithPos
    sink.deleteDV(spark, col("id") === 2L)
    val last = sink.committedVersions().last
    val live = sink.read(spark)
    val asOf = sink.read(spark, versionAsOf = Some(last))
    // same column SET; the live read presents the RECORDED table-schema
    // order (Delta semantics — evolution-added columns where the schema
    // declares them, batch last), the inference path its legacy
    // union-accretion order
    assert(live.columns.sorted.toSeq == asOf.columns.sorted.toSeq,
      s"live ${live.columns.toSeq} != asOf ${asOf.columns.toSeq}")
    assert(live.columns.toSeq == Seq("id", "c", "x", "batch"),
      s"live read order != recorded schema order: ${live.columns.toSeq}")
    val cols = live.columns.sorted.map(col).toIndexedSeq
    val l = live.select(cols: _*).collect().map(_.toString).sorted.toSeq
    val a = asOf.select(cols: _*).collect().map(_.toString).sorted.toSeq
    assert(l == a, s"live read diverged from as-of-latest read:\n$l\n$a")
    assert(live.filter(col("id") === 4L).select("c").as[Long].head()
      == 3000000000L)
    assert(live.filter(col("id") === 2L).count() == 0)
  }

  test("two concurrent optimistic writers produce a linear, gap-free history") {
    val tableDir = tmp("graft-occ")
    val perWriter = 6
    def writer(id: String): Seq[Long] = {
      val sink = new ExactlyOnceSink(tableDir, appId = id)
      (0 until perWriter).map { i =>
        sink.commitAppend(Seq((id, i)).toDF("writer", "seq"))
      }
    }
    // interleave the two writers on real threads: every commitAppend races
    // for the next log version via exclusive file creation
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val (f1, f2) = (Future(writer("w1")), Future(writer("w2")))
    val (v1, v2) = (Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    val sink = new ExactlyOnceSink(tableDir)
    // gap-free and linear: exactly versions 0..2N-1, no duplicates
    assert(sink.committedVersions() == (0L until 2L * perWriter),
      s"history not linear: ${sink.committedVersions()}")
    // the two writers' claimed versions partition the history
    assert((v1 ++ v2).sorted == (0L until 2L * perWriter))
    assert(v1.toSet.intersect(v2.toSet).isEmpty)
    // every committed row is present exactly once
    val rows = sink.read(spark).select("writer", "seq")
      .as[(String, Int)].collect().toSeq
    assert(rows.size == 2 * perWriter)
    assert(rows.toSet == (0 until perWriter)
      .flatMap(i => Seq(("w1", i), ("w2", i))).toSet)
  }

  test("concurrent snapshot transactions (OCC) retry on conflict, losing no update") {
    val tableDir = tmp("graft-occ-snap")
    val seed = new ExactlyOnceSink(tableDir, appId = "seed")
    seed.process(Seq((0L, 0.0)).toDF("id", "v"), 0L)
    // two writers each run counter-increment-style merges concurrently;
    // OCC must serialize them (each retry re-reads the latest state)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    def bump(writer: String, rounds: Int) = Future {
      val sink = new ExactlyOnceSink(tableDir, appId = writer)
      (1 to rounds).foreach { _ =>
        sink.transactSnapshot(spark) { cur =>
          cur.withColumn("v", col("v") + 1.0)
        }
      }
    }
    Await.result(Future.sequence(Seq(bump("a", 4), bump("b", 4))), 5.minutes)
    val sink = new ExactlyOnceSink(tableDir)
    // 8 serialized increments happened-before the final state
    val v = sink.read(spark).select("v").as[Double].head()
    assert(v == 8.0, s"lost update: v = $v (want 8.0)")
    // and the version history is still contiguous: 0 + 8 snapshots
    assert(sink.committedVersions() == (0L to 8L))
  }

  test("vacuum removes only unreferenced data; readers unaffected") {
    val tableDir = tmp("graft-vacuum")
    val sink = new ExactlyOnceSink(tableDir)
    sink.process(Seq((1L, "a")).toDF("id", "x"), 0L)
    sink.commitAppend(Seq((2L, "b")).toDF("id", "x"))
    // an abandoned staging dir (crashed writer) + an orphan OCC data dir
    // (lost snapshot race, never committed)
    Files.createDirectories(Paths.get(tableDir, ".staging-dead"))
    val orphan = Paths.get(tableDir, "data", "files", "orphan-uuid")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk.parquet"), "junk")
    val before = sink.read(spark).select("id").as[Long].collect().toSet
    assert(sink.vacuum(minAgeMs = 0) == 2) // staging + orphan, nothing referenced
    assert(!Files.exists(orphan) && !Files.exists(Paths.get(tableDir, ".staging-dead")))
    assert(sink.read(spark).select("id").as[Long].collect().toSet == before)
    // compact, then vacuum without history: pre-snapshot dirs reclaimed
    sink.compact(spark)
    assert(sink.vacuum(retainHistory = false, minAgeMs = 0) == 2) // batch=0 + the append dir
    assert(sink.read(spark).select("id").as[Long].collect().toSet == before)
  }

  test("concurrent appends racing a vacuum loop never lose committed data") {
    // Adversarial form of the retention-age guard claim (vacuum scaladoc):
    // OCC writers move data under data/files BEFORE winning the version
    // claim, so a vacuum loop runs the whole time writers are mid-flight.
    // With the default 1h floor, every committed version's data dirs must
    // exist on disk afterwards and the table must contain every row.
    val tableDir = tmp("graft-vac-race")
    val sink = new ExactlyOnceSink(tableDir)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vacuums = new java.util.concurrent.atomic.AtomicInteger(0)
    val vac = new Thread(() => {
      while (!stop.get) { sink.vacuum(); vacuums.incrementAndGet(); Thread.sleep(5) }
    })
    vac.start()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val writes = (0 until 12).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = sink.commitAppend(
            spark.range(i * 10L, i * 10L + 10).toDF("id"))
        })
      }
      writes.foreach(_.get())
    } finally { pool.shutdown(); stop.set(true); vac.join() }
    assert(vacuums.get() > 0, "vacuum loop never ran — test proved nothing")
    val versions = sink.committedVersions()
    assert(versions.size == 12, s"expected 12 commits, got ${versions.size}")
    versions.foreach { v =>
      sink.commitDataDirs(v).foreach { d =>
        assert(Files.exists(Paths.get(tableDir, "data", d)),
          s"version $v references vanished dir $d")
      }
    }
    assert(sink.read(spark).count() == 120)
  }

  test("vacuum(minAgeMs=0) CAN purge an in-flight writer's unclaimed dir — the guard is load-bearing") {
    val tableDir = tmp("graft-vac-window")
    val sink = new ExactlyOnceSink(tableDir)
    sink.commitAppend(Seq((1L, "a")).toDF("id", "x"))
    // A writer in the post-move pre-claim window: data moved under
    // data/files/, not yet referenced by any commit.
    val inflight = Paths.get(tableDir, "data", "files", "inflight-uuid")
    Files.createDirectories(inflight)
    Files.writeString(inflight.resolve("part-0.parquet"), "pending")
    // the retention floor protects it ...
    sink.vacuum(minAgeMs = 3600000L)
    assert(Files.exists(inflight), "guarded vacuum purged an in-flight dir")
    // ... and without the floor it is purged: the claim that follows
    // would commit a version pointing at deleted files. This is WHY
    // minAgeMs=0 is only legal when no writer can be in flight.
    Thread.sleep(20) // ensure mtime <= cutoff at ms resolution
    sink.vacuum(minAgeMs = 0)
    assert(!Files.exists(inflight),
      "vacuum(0) left the unclaimed dir — guard test is vacuous")
    // the committed version's own data was never at risk
    assert(sink.read(spark).count() == 1)
  }

  test("commit-log file stats skip non-matching files on read") {
    val tableDir = tmp("graft-skip")
    val sink = new ExactlyOnceSink(tableDir)
    // three commits with disjoint id ranges -> disjoint min/max stats
    sink.process(spark.range(0, 100).toDF("id").withColumn("tag", lit("lo")), 0L)
    sink.process(spark.range(1000, 1100).toDF("id").withColumn("tag", lit("mid")), 1L)
    sink.process(spark.range(5000, 5100).toDF("id").withColumn("tag", lit("hi")), 2L)
    val full = sink.read(spark)
    assert(full.count() == 300)
    val allFiles = full.inputFiles.toSet
    // a predicate inside the middle commit's range must touch ONLY files
    // whose recorded [min,max] intersect it
    val pruned = sink.readSkipping(spark, "id", 1000, 1050)
    val prunedFiles = pruned.inputFiles.toSet
    assert(prunedFiles.nonEmpty && prunedFiles.subsetOf(allFiles))
    assert(prunedFiles.forall(_.contains("batch=1")),
      s"stat skipping read outside batch=1: $prunedFiles")
    assert(prunedFiles.size < allFiles.size,
      "no files were skipped")
    // the surviving files still contain every matching row
    assert(pruned.filter(col("id").between(1000, 1050)).count() == 51)
    // a range matching nothing reads nothing
    assert(sink.readSkipping(spark, "id", 900, 950).inputFiles.isEmpty)
  }

  test("readChanges returns only rows appended in the version range") {
    val tableDir = tmp("graft-cdc")
    val sink = new ExactlyOnceSink(tableDir)
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).toDF("id")
    sink.process(batch(0, 10), 0L)
    sink.process(batch(10, 30), 1L)
    sink.process(batch(30, 60), 2L)
    // incremental consumer cursor at version 0: sees versions 1..2 only
    val ch = sink.readChanges(spark, fromVersion = 0)
    assert(ch.count() == 50)
    assert(ch.select("batch").distinct().as[Int].collect().toSet == Set(1, 2))
    assert(ch.agg(min(col("id")), max(col("id"))).as[(Long, Long)].head() ==
      (10L, 59L))
    // bounded range
    assert(sink.readChanges(spark, 0, 1).count() == 20)
    // compaction is a physical rewrite, not a logical change
    sink.compact(spark)
    assert(sink.readChanges(spark, 2).count() == 0)
    // and appends after the snapshot surface again
    sink.process(batch(60, 70), 10L)
    assert(sink.readChanges(spark, 2).select("id").as[Long].collect().toSet ==
      (60L until 70L).toSet)
    // appended rows are typed as inserts in the feed
    assert(sink.readChanges(spark, 2).select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
  }

  test("readChanges(pruneBy) opens only matching change files (CDC skipping)") {
    val dir = tmp("graft-cdc-prune")
    val sink = new ExactlyOnceSink(dir)
    // one append, FOUR files with disjoint id ranges — per-file pruning
    // must act WITHIN the commit, not just between commits
    sink.commitAppend(spark.range(0, 100).toDF("id")
      .withColumn("x", concat(lit("v"), col("id")))
      .repartitionByRange(4, col("id")))
    // two merges touching disjoint id ranges → two change dirs whose
    // recorded changeAdd stats cannot both intersect a selective probe
    val mv1 = sink.merge(spark,
      (0L until 5L).map(i => (i, s"m$i")).toDF("id", "x"), Seq("id"))
    val mv2 = sink.merge(spark,
      (90L until 95L).map(i => (i, s"m$i")).toDF("id", "x"), Seq("id"))
    // the entries record per-change-file stats
    val e = Files.readString(Paths.get(dir, "_graft_log", f"$mv1%020d.json"))
    assert(e.contains("\"changeAdd\""), "merge entry lacks changeAdd stats")

    val full = sink.readChanges(spark, -1L, mv2)
    val pruned = sink.readChanges(spark, -1L, mv2,
      pruneBy = Seq(("id", 0.0, 4.0)))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"pruneBy opened ${pruned.inputFiles.length}/" +
        s"${full.inputFiles.length} — no change-file skipping")
    // pruning is file-level and conservative: after applying the
    // predicate, the selective feed equals the full feed's slice
    val sel = pruned.filter(col("id") <= 4)
      .select("id", "x", "_change_type", "batch")
    val ref = full.filter(col("id") <= 4)
      .select("id", "x", "_change_type", "batch")
    assert(sel.collect().toSet === ref.collect().toSet)
    assert(sel.count() > 0)
    // a probe hitting NOTHING prunes to an empty frame
    assert(sink.readChanges(spark, mv1, mv2,
      pruneBy = Seq(("id", 40.0, 50.0))).isEmpty)
    // the streaming tail passes pruneBy through: the applier's batch
    // frame opens only matching files
    var tailFiles = -1
    var tailRows = -1L
    sink.tailChanges(spark, tmp("graft-cdc-prune-ckpt"),
        pruneBy = Seq(("id", 0.0, 4.0))) { (ch, _) =>
      tailFiles = ch.inputFiles.length
      tailRows = ch.filter(col("id") <= 4).count()
    }.awaitTermination()
    assert(tailFiles >= 0 && tailFiles < full.inputFiles.length,
      "tailing applier scanned the unpruned feed")
    assert(tailRows === ref.count())
  }

  test("readChanges surfaces merge/delete logical changes; opaque snapshots fail loudly") {
    val tableDir = tmp("graft-cdf")
    val sink = new ExactlyOnceSink(tableDir)
    sink.process(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), 0L)
    // MERGE: one key update (2), one insert (4) — the feed carries the
    // Delta-CDF change rows, not the rewritten table
    val mv = sink.merge(spark, Seq((2L, "B"), (4L, "d")).toDF("id", "name"),
      Seq("id"))
    val ch = sink.readChanges(spark, fromVersion = 0)
    assert(ch.select("id", "name", "_change_type")
      .as[(Long, String, String)].collect().toSet == Set(
        (4L, "d", "insert"),
        (2L, "b", "update_preimage"),
        (2L, "B", "update_postimage")))
    assert(ch.select("batch").distinct().as[Int].collect().toSet ==
      Set(mv.toInt))
    // DELETE: the removed rows appear as `delete` changes
    val dv = sink.delete(spark, col("id") === 1L)
    assert(sink.readChanges(spark, mv).select("id", "_change_type")
      .as[(Long, String)].collect().toSet == Set((1L, "delete")))
    // compact in range contributes nothing (physical rewrite only)
    sink.compact(spark)
    assert(sink.readChanges(spark, dv).count() == 0)
    // change dirs survive history-dropping vacuum: the feed reads history
    assert(sink.vacuum(retainHistory = false, minAgeMs = 0) >= 0)
    assert(sink.readChanges(spark, mv - 1, dv).count() == 4) // 3 merge + 1 delete rows
    // an opaque snapshot (arbitrary transform, unknowable change set)
    // in range must fail loudly, never silently drop changes
    sink.transactSnapshot(spark)(cur => cur)
    val err = intercept[RuntimeException](sink.readChanges(spark, dv))
    assert(err.getMessage.contains("no recorded change rows"))
    // ranges that end before the opaque snapshot still work
    assert(sink.readChanges(spark, mv, dv).count() == 1)
  }

  test("a CDC consumer reconstructs live state from the change feed alone") {
    val tableDir = tmp("graft-cdc-mirror")
    val sink = new ExactlyOnceSink(tableDir)
    sink.process(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v"), 0L)
    sink.merge(spark, Seq((2L, "B", 25.0), (4L, "d", 40.0))
      .toDF("id", "name", "v"), Seq("id"))
    sink.delete(spark, col("id") === 3L)
    sink.commitAppend(Seq((5L, "e", 50.0)).toDF("id", "name", "v"))
    sink.compact(spark) // physical rewrite — must not disturb the mirror
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name", "v").as[(Long, String, Double)].collect().toSet
    val mirror = rows(sink.stateFromChanges(spark, Seq("id")))
    assert(mirror == rows(sink.read(spark)))
    assert(mirror == Set((1L, "a", 10.0), (2L, "B", 25.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
    // bounded replay: mirror as of the merge (before the delete)
    val mv = 1L
    assert(rows(sink.stateFromChanges(spark, Seq("id"), toVersion = mv)) ==
      rows(sink.read(spark, versionAsOf = Some(mv))))
  }

  test("per-file bloom filters prune point lookups that range stats cannot") {
    val tableDir = tmp("graft-bloom")
    val sink = new ExactlyOnceSink(tableDir)
    // three appends with FULLY OVERLAPPING id ranges (0..2999) but
    // disjoint id sets (mod-3 residues): every file's [min,max] spans
    // nearly the whole range, so stat skipping is useless here
    (0 until 3).foreach { r =>
      sink.commitAppend(
        spark.range(0, 3000).toDF("id").filter(col("id") % 3 === r)
          .withColumn("sval", concat(lit("k"), col("id")))
          .coalesce(1), // one file per commit => full-range [min,max] each
        bloomBy = Seq("id", "sval"))
    }
    val all = sink.read(spark)
    val nFiles = all.inputFiles.length
    assert(nFiles >= 3)
    // range stats cannot prune a point probe on these overlapping files
    assert(sink.readSkipping(spark, "id", 1001, 1001)
      .inputFiles.length == nFiles)
    // the bloom prunes to (about) the one commit holding the residue;
    // false positives are possible but bounded — strictly fewer files
    val hit = sink.readLookup(spark, "id", "1001")
    assert(hit.inputFiles.length < nFiles,
      s"bloom pruned nothing: ${hit.inputFiles.length}/$nFiles")
    assert(hit.filter(col("id") === 1001).count() == 1) // lossless
    // string-column bloom works the same way
    val hitS = sink.readLookup(spark, "sval", "k2000")
    assert(hitS.inputFiles.length < nFiles)
    assert(hitS.filter(col("sval") === "k2000").count() == 1)
    // a value absent from the table: typically every file pruned (allow
    // rare FPs, but the probe must return no matching rows regardless)
    val miss = sink.readLookup(spark, "id", "999999")
    assert(miss.isEmpty || miss.filter(col("id") === 999999).count() == 0)
    // files without a bloom for the column are conservatively kept
    sink.commitAppend(Seq(3000L).toDF("id")
      .withColumn("sval", lit("k3000"))) // no bloomBy
    assert(sink.readLookup(spark, "id", "3000")
      .filter(col("id") === 3000).count() == 1)
  }

  test("z-order accepts string clustering columns; string stats prune files") {
    val tableDir = tmp("graft-zorder-str")
    val sink = new ExactlyOnceSink(tableDir)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    sink.commitAppend(docs, clusterBy = Seq("source"), clusterFiles = 8)
    val all = sink.read(spark)
    assert(all.count() == docs.count())
    val nFiles = all.inputFiles.length
    // a lexicographic slab covering ~4/20 source values reads fewer files
    val pruned = sink.readSkipping(spark, "source", "src0", "src12")
    assert(pruned.inputFiles.length < nFiles,
      s"string skip read all ${pruned.inputFiles.length}/$nFiles files")
    // pruning is lossless
    val slab = col("source") >= "src0" && col("source") <= "src12"
    assert(pruned.filter(slab).count() == docs.filter(slab).count())
    // a user __z column is rejected loudly, not silently overwritten
    val err = intercept[IllegalArgumentException] {
      graft.operators.ZOrder.key(docs.withColumn("__z", lit(1)), Seq("n_chars"))
    }
    assert(err.getMessage.contains("__z"))
    // unsupported cluster-column type rejected with a clear message
    val err2 = intercept[IllegalArgumentException] {
      graft.operators.ZOrder.key(
        docs.withColumn("arr", array(lit(1))), Seq("arr"))
    }
    assert(err2.getMessage.contains("unclusterable"))
  }

  test("z-ordered append: file skipping prunes on BOTH clustered columns") {
    val tableDir = tmp("graft-zorder")
    val sink = new ExactlyOnceSink(tableDir)
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    sink.commitAppend(ev, clusterBy = Seq("user_id", "value"),
      clusterFiles = 16)
    val all = sink.read(spark)
    assert(all.count() == ev.count()) // clustering reorders, loses nothing
    val nFiles = all.inputFiles.length
    assert(nFiles >= 8, s"expected >=8 z-ordered files, got $nFiles")
    // a 12.5%-mass slab on EITHER column touches a minority of files —
    // the point of z-order over linear sort (which serves only one
    // column). Equi-mass (quantile) slabs, not equi-width: value is
    // skewed, and no layout can read few files for a predicate that
    // matches half the rows.
    val stats = ev.agg(min(col("user_id")), min(col("value"))).head()
    val (uLo, vLo) = (stats.getLong(0).toDouble, stats.getDouble(1))
    val uCut = ev.stat.approxQuantile("user_id", Array(0.125), 0.001).head
    val vCut = ev.stat.approxQuantile("value", Array(0.125), 0.001).head
    val byUser = sink.readSkipping(spark, "user_id", uLo, uCut)
    val byValue = sink.readSkipping(spark, "value", vLo, vCut)
    assert(byUser.inputFiles.length < nFiles / 2,
      s"user_id skip read ${byUser.inputFiles.length}/$nFiles files")
    assert(byValue.inputFiles.length < nFiles / 2,
      s"value skip read ${byValue.inputFiles.length}/$nFiles files")
    // pruning is lossless: surviving files hold every matching row
    assert(byUser.filter(col("user_id").between(uLo, uCut)).count() ==
      ev.filter(col("user_id").between(uLo, uCut)).count())
    assert(byValue.filter(col("value").between(vLo, vCut)).count() ==
      ev.filter(col("value").between(vLo, vCut)).count())
  }

  test("compact(clusterBy) rewrites arrival-order appends into a skippable table") {
    val tableDir = tmp("graft-optimize")
    val sink = new ExactlyOnceSink(tableDir)
    val ev = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // arrival-order appends: stats are wide on both columns
    Seq(ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1))
      .foreach(b => sink.commitAppend(b))
    val vCut = ev.stat.approxQuantile("value", Array(0.125), 0.001).head
    val vLo = ev.agg(min(col("value"))).head().getDouble(0)
    // arrival order cannot prune a value predicate: every file's value
    // stats span the full range
    val preFiles = sink.read(spark).inputFiles.length
    assert(sink.readSkipping(spark, "value", vLo, vCut)
      .inputFiles.length == preFiles)
    // OPTIMIZE ZORDER BY (user_id, value)
    sink.compact(spark, clusterBy = Seq("user_id", "value"), clusterFiles = 16)
    val all = sink.read(spark)
    assert(all.count() == ev.count())
    val after = sink.readSkipping(spark, "value", vLo, vCut)
    assert(after.inputFiles.length < all.inputFiles.length / 2,
      s"post-OPTIMIZE value skip read ${after.inputFiles.length}/${all.inputFiles.length}")
    assert(after.filter(col("value").between(vLo, vCut)).count() ==
      ev.filter(col("value").between(vLo, vCut)).count())
  }

  test("CHECK constraints enforce per row at write time, transactionally") {
    val dir = tmp("graft-cons")
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, 10.0), (2L, 5.0)).toDF("id", "value"))
    // adding a constraint existing data violates is rejected
    intercept[IllegalArgumentException] {
      sink.setConstraint(spark, "big", "value >= 6.0")
    }
    sink.setConstraint(spark, "nonneg", "value >= 0.0")
    assert(sink.activeConstraints() == Map("nonneg" -> "value >= 0.0"))
    // a valid append passes
    sink.commitAppend(Seq((3L, 1.5)).toDF("id", "value"))
    val before = sink.committedVersions()
    // a violating append aborts inside the write; nothing commits
    val e = intercept[Exception] {
      sink.commitAppend(Seq((4L, 2.0), (5L, -1.0)).toDF("id", "value"))
    }
    assert(e.getMessage != null || e.getCause != null) // job failed loudly
    assert(sink.committedVersions() == before, "violating write committed")
    assert(sink.read(spark).count() == 3)
    // dropping the constraint re-opens the gate; history stays linear
    sink.dropConstraint("nonneg")
    assert(sink.activeConstraints().isEmpty)
    sink.commitAppend(Seq((5L, -1.0)).toDF("id", "value"))
    assert(sink.read(spark).count() == 4)
    val vs = sink.committedVersions()
    assert(vs == (vs.min to vs.max), s"gapped history: $vs")
  }

  test("replaceWhere atomically swaps the matching slice; CDC records it") {
    val dir = tmp("graft-rw")
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0)
    ).toDF("part", "id", "value"))
    val preVersions = sink.committedVersions().size
    val v = sink.replaceWhere(spark, col("part") === "a",
      Seq(("a", 7L, 70.0)).toDF("part", "id", "value"))
    // state: slice 'a' fully replaced, 'b' untouched, one new version
    val state = sink.read(spark).select("part", "id", "value")
      .as[(String, Long, Double)].collect().toSet
    assert(state == Set(("a", 7L, 70.0), ("b", 3L, 30.0)))
    assert(sink.committedVersions().size == preVersions + 1)
    // CDC for that commit: the two replaced rows as deletes + the insert
    val ch = sink.readChanges(spark, v - 1, v)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(ch == Set(("delete", 1L), ("delete", 2L), ("insert", 7L)))
    // a replacement row OUTSIDE the predicate aborts; nothing commits
    val before = sink.committedVersions()
    intercept[Exception] {
      sink.replaceWhere(spark, col("part") === "a",
        Seq(("b", 9L, 90.0)).toDF("part", "id", "value"))
    }
    assert(sink.committedVersions() == before)
    // downstream state from the change feed alone still matches read()
    val rebuilt = sink.stateFromChanges(spark, Seq("id"))
      .select("part", "id", "value").as[(String, Long, Double)].collect().toSet
    assert(rebuilt == state)
  }

  test("streaming MERGE upserts are replay-idempotent via the streamTxn cursor") {
    // the full deltasink CDC-consumer verb: a keyed stream of updates
    // merged per micro-batch; a complete REPLAY of the same source from
    // a fresh checkpoint commits nothing new (Delta txn-action pattern)
    val topicDir = tmp("graft-merge-topic")
    val tableDir = tmp("graft-merge-table")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 2)
    val sink = new ExactlyOnceSink(tableDir)

    def run(ckpt: String): Unit = {
      val stream = KafkaEnvelope.decode(KafkaEnvelope.readStream(spark, topicDir, 2))
        .select("event_id", "ts", "user_id", "event_type", "event_value")
      val qy = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // per-batch last state per user (ordered by the portable key)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("ts").desc, col("event_id").desc)
          val latest = df.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select("user_id", "event_type", "event_value")
          sink.mergeBatch(spark, latest, Seq("user_id"), id): Unit
        }
        .start()
      qy.awaitTermination(120000)
    }
    run(tmp("graft-merge-ckpt1"))
    val stateAfterFirst = sink.read(spark)
      .select("user_id", "event_type", "event_value")
      .as[(Long, String, Double)].collect().toSet
    val versionsAfterFirst = sink.committedVersions()
    assert(stateAfterFirst.nonEmpty)
    // one row per user (MERGE semantics, not append)
    assert(stateAfterFirst.size ==
      stateAfterFirst.map(_._1).size, "duplicate user rows after merge")
    assert(sink.lastStreamBatch("graft-sink").nonEmpty)

    // full replay with a FRESH checkpoint: same batchIds re-arrive;
    // every one no-ops against the recorded cursor
    run(tmp("graft-merge-ckpt2"))
    assert(sink.committedVersions() == versionsAfterFirst,
      "replay committed new versions")
    val stateAfterReplay = sink.read(spark)
      .select("user_id", "event_type", "event_value")
      .as[(Long, String, Double)].collect().toSet
    assert(stateAfterReplay == stateAfterFirst)
  }

  test("envelope topic preserves the per-partition ordered-log contract") {
    // the Kafka semantics downstream code relies on: per partition,
    // offsets are dense from 0, never duplicated, and arrive in
    // non-decreasing order across commit versions
    val topicDir = tmp("graft-ord-topic")
    val tableDir = tmp("graft-ord-table")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 3)
    val sink = new ExactlyOnceSink(tableDir)
    val qy = KafkaEnvelope.readStream(spark, topicDir, 1)
      .writeStream.option("checkpointLocation", tmp("graft-ord-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.process(df.select("topic", "partition", "offset", "key"), id))
      .start()
    qy.awaitTermination(120000)
    val rows = sink.read(spark)
      .select("partition", "offset", "batch")
      .as[(Int, Long, Int)].collect()
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val offs = rs.map(_._2).sorted
      assert(offs.toSeq == (0L until offs.length).toSeq,
        s"partition $p offsets not dense from 0")
      assert(rs.map(_._2).distinct.length == rs.length,
        s"partition $p delivered an offset twice")
      // commit-version order never rewinds an offset
      val byBatch = rs.sortBy(r => (r._3, r._2)).map(_._2)
      assert(byBatch.toSeq == byBatch.sorted.toSeq,
        s"partition $p offsets rewound across batches")
    }
  }

  test("streaming NEAR-dup ingest: MinHash-LSH dedup against the committed corpus") {
    // The incremental form of q_llm_minhash_lsh — what a training-data
    // platform actually runs at ingest: each micro-batch signatures its
    // docs with the IDENTICAL portable MinHash kernel the batch query
    // uses, candidate-joins against the committed signature table on
    // (band, bkey), verifies exact hashed-shingle Jaccard >= 0.5, drops
    // near-dups (conservative greedy within the batch: any doc matching
    // a smaller-id batch doc or ANY committed doc), and appends the
    // survivors' signatures exactly-once. The invariant that matters:
    // the committed corpus stays near-dup-free forever, at per-batch
    // cost proportional to the batch + its candidates, never a corpus
    // rescan.
    val streamDir = tmp("graft-nd-stream")
    val tableDir = tmp("graft-nd-table")
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    (0 until 4).foreach { k =>
      val part = tmp(s"graft-nd-part$k")
      docs.filter(pmod(col("doc_id"), lit(4)) === k)
        .coalesce(1).write.mode("overwrite").parquet(part)
      val f = withDirStream(Files.list(Paths.get(part)))(_
        .filter(_.getFileName.toString.endsWith(".parquet")).next())
      Files.move(f, Paths.get(streamDir, f"chunk-$k%02d.parquet"))
    }
    val sink = new ExactlyOnceSink(tableDir)
    def hinterIn(s: org.apache.spark.sql.SparkSession)(
        a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.SortedIntersectSize.sortedIntersectSize(s, a, b)
    val hinter = hinterIn(spark) _
    val qy = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
      .writeStream.option("checkpointLocation", tmp("graft-nd-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // the factored pipeline stage (CurationPipeline.nearDupBatch)
        // resolves kernels against the CLONED foreachBatch session;
        // this spec proves the invariant, IngestBench measures the cost
        graft.streaming.CurationPipeline.nearDupBatch(df, sink, id)
        ()
      }
      .start()
    qy.awaitTermination(180000)

    val table = sink.read(spark)
    val nCommitted = table.select("doc_id").distinct().count()
    assert(nCommitted > 0 && nCommitted < docs.count(),
      s"ingest dedup dropped nothing ($nCommitted of ${docs.count()})")
    // THE invariant: the committed corpus has no verified near-dup pair
    val a = table.select(col("band"), col("bkey"), col("doc_id").as("d1"),
      col("hs").as("hs_a"), col("sz").as("sz_a"))
    val b = table.select(col("band"), col("bkey"), col("doc_id").as("d2"),
      col("hs").as("hs_b"), col("sz").as("sz_b"))
    val residual = a.join(b, Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .filter(hinter(col("hs_a"), col("hs_b")) * 3 >= col("sz_a") + col("sz_b"))
      .count()
    assert(residual == 0, s"$residual near-dup pairs survived ingest")
  }

  test("malformed stream records quarantine to a dead-letter sink exactly-once") {
    // The ingestion contract's dead-letter path (SURVEY §3.1 step 2):
    // PERMISSIVE-decode each micro-batch, split good/corrupt, land both
    // sides in their own exactly-once tables keyed on the same batchId —
    // replay duplicates neither, and no record is lost or double-counted.
    val topicDir = tmp("graft-dlq-topic")
    val mainDir = tmp("graft-dlq-main")
    val dlqDir = tmp("graft-dlq-dead")
    val ckpt = tmp("graft-dlq-ckpt")
    // envelope topic with a corrupt value every 7th record
    val env = KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 2)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("user_id", "long")
    val mainSink = new ExactlyOnceSink(mainDir)
    val dlqSink = new ExactlyOnceSink(dlqDir, appId = "graft-dlq")
    val stream = KafkaEnvelope.readStream(spark, topicDir, 2)
      .withColumn("value",
        when(pmod(col("offset"), lit(7)) === 0,
          concat(lit("{corrupt::"), col("value"))).otherwise(col("value")))
      .withColumn("decoded", from_json(col("value"), schema))
    val qy = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val good = df.filter(col("decoded.event_id").isNotNull)
          .select(col("decoded.event_id").as("event_id"),
            col("decoded.user_id").as("user_id"))
        val dead = df.filter(col("decoded.event_id").isNull)
          .select(col("topic"), col("partition"), col("offset"), col("value"))
        mainSink.process(good, id)
        dlqSink.process(dead, id)
      }
      .start()
    qy.awaitTermination(120000)
    val total = Tables(spark, sf, "events").count()
    val goodN = mainSink.read(spark).count()
    val deadN = dlqSink.read(spark).count()
    assert(goodN + deadN == total, s"$goodN good + $deadN dead != $total")
    assert(deadN > 0, "no corrupt records hit the DLQ")
    // every quarantined record carries its replay cursor
    assert(dlqSink.read(spark).filter(col("offset").isNull).count() == 0)
    // replaying the same batches is a no-op on BOTH tables
    val (v1, v2) = (mainSink.committedVersions(), dlqSink.committedVersions())
    v1.foreach(b => mainSink.process(
      mainSink.read(spark).limit(1).select("event_id", "user_id"), b))
    assert(mainSink.committedVersions() == v1)
    assert(dlqSink.committedVersions() == v2)
    assert(mainSink.read(spark).count() == goodN)
  }

  test("stream-stream LEFT OUTER interval join emits null-padded unmatched rows") {
    // the enrichment join that must ALSO surface unenriched rows: left
    // rows with no match emit null-padded once the watermark closes the
    // join window — the state-eviction semantics a 100 TB stream needs
    val imps = MemoryStream[(Timestamp, Long)](11, spark, None)
    val clicks = MemoryStream[(Timestamp, Long)](12, spark, None)
    val impDf = imps.toDF().toDF("imp_ts", "ad_id")
      .withWatermark("imp_ts", "10 minutes")
    val clickDf = clicks.toDF().toDF("click_ts", "c_ad_id")
      .withWatermark("click_ts", "10 minutes")
    val joined = impDf.join(clickDf,
      col("ad_id") === col("c_ad_id")
        && col("click_ts") >= col("imp_ts")
        && col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val qy = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_left_out")
      .option("checkpointLocation", tmp("graft-ssj-left"))
      .start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    imps.addData((t(0), 1L), (t(0), 2L))
    clicks.addData((t(5), 1L)) // ad 1 clicks within bound; ad 2 never does
    qy.processAllAvailable()
    // advance both watermarks far past imp_ts+interval so ad 2's state
    // is provably unmatched and must be emitted null-padded
    imps.addData((t(59), 99L))
    clicks.addData((t(59), 98L))
    qy.processAllAvailable()
    qy.stop()
    val out = spark.table("ssj_left_out")
      .select(col("ad_id"), col("c_ad_id").isNull.as("unmatched"))
      .as[(Long, Boolean)].collect().toSet
    assert(out.contains((1L, false)), s"matched row missing: $out")
    assert(out.contains((2L, true)), s"null-padded unmatched row missing: $out")
  }

  test("watermark drops events later than the lateness bound") {
    val input = MemoryStream[(Timestamp, Long)](1, spark, None)
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val qy = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out")
      .option("checkpointLocation", tmp("graft-wm"))
      .start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(0), 1L), (t(5), 2L))
    qy.processAllAvailable()
    input.addData((t(40), 3L)) // advances watermark to 10:30
    qy.processAllAvailable()
    input.addData((t(1), 99L)) // 39 min late > 10 min bound -> dropped
    qy.processAllAvailable()
    input.addData((t(55), 4L)) // closes the 10:40 window too
    qy.processAllAvailable()
    qy.stop()
    val rows = spark.table("wm_out")
      .select(col("window.start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(rows("2024-01-01 10:00:00") == 2,
      s"late row was not dropped: $rows")
  }

  test("streaming dedup within watermark removes redelivered events") {
    val input = MemoryStream[(Timestamp, Long)](2, spark, None)
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val qy = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dd_out")
      .option("checkpointLocation", tmp("graft-dd"))
      .start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(0), 1L), (t(1), 2L), (t(1), 2L)) // dup in-batch
    qy.processAllAvailable()
    input.addData((t(2), 2L), (t(3), 3L)) // redelivery across batches
    qy.processAllAvailable()
    qy.stop()
    val ids = spark.table("dd_out").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), ids.mkString(","))
  }

  test("flatMapGroupsWithState sessionization matches gap semantics") {
    val input = MemoryStream[StatefulOps.Ev](3, spark, None)
    val sessions = StatefulOps.sessionize(
      input.toDS().withWatermark("ts", "1 minute").as[StatefulOps.Ev])
    val qy = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", tmp("graft-sess"))
      .start()
    def ev(min: Int, v: Double) =
      StatefulOps.Ev(1L, Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), v)
    input.addData(ev(0, 1.0), ev(5, 2.0)) // one session
    qy.processAllAvailable()
    input.addData(ev(40, 3.0)) // gap 35 min >= 30 -> closes first session
    qy.processAllAvailable()
    qy.stop()
    val out = spark.table("sess_out").as[StatefulOps.SessionOut].collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.n_events == 2 && out.head.value_sum == 3.0)
  }

  test("transformWithState running totals accumulate across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StatefulOps.Ev](4, spark, None)
      val totals = StatefulOps.runningTotals(input.toDS())
      val qy = totals.writeStream.outputMode("update")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation", tmp("graft-tws"))
        .start()
      def ev(u: Long, min: Int, v: Double) =
        StatefulOps.Ev(u, Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), v)
      input.addData(ev(1, 0, 1.0), ev(1, 1, 2.0), ev(2, 0, 5.0))
      qy.processAllAvailable()
      input.addData(ev(1, 2, 4.0)) // state must survive the batch boundary
      qy.processAllAvailable()
      qy.stop()
      // last update per user carries the running total
      val last = spark.table("tws_out").as[StatefulOps.UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.last }
      assert(last(1L).n_events == 3 && last(1L).value_sum == 7.0, last.toString)
      assert(last(2L).n_events == 1 && last(2L).value_sum == 5.0, last.toString)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("checkpoint restart: a NEW query resumes transformWithState state exactly-once") {
    // The deploy-restart path a real Kafka->Delta job exercises on every
    // release: stop the StreamingQuery, start a NEW query object from the
    // SAME checkpoint, and both the RocksDB keyed state (running totals)
    // and the committed source offsets must carry over — no lost state,
    // no double-counted events.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = tmp("graft-tws-restart")
      val input = MemoryStream[StatefulOps.Ev](11, spark, None)
      def ev(u: Long, min: Int, v: Double) =
        StatefulOps.Ev(u, Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), v)
      // the memory sink refuses checkpoint recovery by design; a real
      // deployment restarts through foreachBatch (or a file sink), so
      // collect updates per micro-batch on the driver
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, StatefulOps.UserTotal)]()
      def start() =
        StatefulOps.runningTotals(input.toDS()).writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch((df: org.apache.spark.sql.Dataset[StatefulOps.UserTotal], id: Long) =>
            df.collect().foreach(r => got.add(id -> r)))
          .start()
      val q1 = start()
      input.addData(ev(1, 0, 1.0), ev(1, 1, 2.0), ev(2, 0, 5.0))
      q1.processAllAvailable()
      q1.stop() // deploy boundary: the query object is gone for good
      input.addData(ev(1, 2, 4.0), ev(2, 3, 1.5)) // arrives while down
      val q2 = start() // NEW StreamingQuery, same checkpoint
      q2.processAllAvailable()
      q2.stop()
      import scala.jdk.CollectionConverters._
      val byBatch = got.asScala.toSeq.groupBy(_._1)
      // totals CONTINUE from the restored state: user 1 = 2 events before
      // the restart + 1 after (not 1: state survived; not 4: batch 0 was
      // not re-processed), user 2 = 1 + 1.
      val resumed = byBatch.filterKeys(_ >= 1).values.flatten.map(_._2)
        .groupBy(_.user_id).map { case (u, r) => u -> r.last }
      assert(resumed(1L).n_events == 3 && resumed(1L).value_sum == 7.0,
        got.asScala.mkString(", "))
      assert(resumed(2L).n_events == 2 && resumed(2L).value_sum == 6.5,
        got.asScala.mkString(", "))
      // exactly-once across the restart: batch 0's updates were emitted
      // once (no replay), and the restarted query emitted exactly one
      // update per touched user
      assert(byBatch(0L).length == 2, s"batch 0 replayed: ${byBatch(0L)}")
      assert(byBatch.filterKeys(_ >= 1).values.flatten.size == 2,
        s"post-restart emissions: $byBatch")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RESTORE rolls the live table back to a prior version, metadata-only") {
    val tableDir = tmp("graft-restore")
    val sink = new ExactlyOnceSink(tableDir)
    def df(r: Range) = r.map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    assert(sink.commitAppend(df(1 to 10)) == 0L)
    assert(sink.commitAppend(df(11 to 15)) == 1L)
    assert(sink.commitAppend(df(16 to 18)) == 2L)
    val filesBefore = withDirStream(
      Files.list(Paths.get(tableDir, "data", "files")))(_.length)
    val rv = sink.restore(spark, 0L)
    assert(rv == 3L)
    // live state == the version-0 snapshot
    assert(sink.read(spark).select("id").as[Long].collect().sorted.toSeq
      == (1L to 10L))
    // metadata-only: the restore staged NO new data dir (the re-pointed
    // add actions reference version 0's existing files)
    val filesAfter = withDirStream(
      Files.list(Paths.get(tableDir, "data", "files")))(_.length)
    assert(filesAfter == filesBefore, s"restore wrote data dirs: $filesBefore -> $filesAfter")
    // history stays linear and dense; pre-restore time travel intact
    assert(sink.committedVersions() == Seq(0L, 1L, 2L, 3L))
    assert(sink.read(spark, versionAsOf = Some(2L)).count() == 18)
    assert(sink.read(spark, versionAsOf = Some(1L)).count() == 15)
    // the restore commit records the rollback as logical CDC deletes
    val ch = sink.readChanges(spark, 2L, 3L)
    assert(ch.count() == 8)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq
      == Seq("delete"))
    assert(ch.select("id").as[Long].collect().sorted.toSeq == (11L to 18L))
    // a CDC consumer following the feed alone lands on the restored state
    assert(sink.stateFromChanges(spark, Seq("id"))
      .select("id").as[Long].collect().sorted.toSeq == (1L to 10L))
    // vacuum without history keeps every file the restore re-pointed at
    // and reclaims the rolled-back appends' dirs
    val removed = sink.vacuum(retainHistory = false, minAgeMs = 0)
    assert(removed == 2, s"vacuum removed $removed dirs")
    assert(sink.read(spark).select("id").as[Long].collect().sorted.toSeq
      == (1L to 10L))
    // the re-pointed add actions kept their file stats: skipping prunes
    assert(sink.readSkipping(spark, "id", 100.0, 200.0).isEmpty)
  }

  test("stream-stream interval join matches within the time bound") {
    // Two watermarked streams joined on key with an event-time interval
    // condition — the streaming enrichment shape (click joined to the
    // impression at most 10 minutes before it). State for both sides is
    // bounded by the watermark + interval.
    val imps = MemoryStream[(Timestamp, Long)](5, spark, None)
    val clicks = MemoryStream[(Timestamp, Long)](6, spark, None)
    val impDf = imps.toDF().toDF("imp_ts", "ad_id")
      .withWatermark("imp_ts", "20 minutes")
    val clickDf = clicks.toDF().toDF("click_ts", "c_ad_id")
      .withWatermark("click_ts", "20 minutes")
    val joined = impDf.join(clickDf,
      col("ad_id") === col("c_ad_id")
        && col("click_ts") >= col("imp_ts")
        && col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
    val qy = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", tmp("graft-ssj"))
      .start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    imps.addData((t(0), 1L), (t(0), 2L))
    clicks.addData((t(5), 1L))   // within 10 min of imp 1 -> joins
    clicks.addData((t(15), 2L))  // 15 min after imp 2 -> outside bound
    qy.processAllAvailable()
    qy.stop()
    val rows = spark.table("ssj_out").select("ad_id").as[Long].collect().toSeq
    assert(rows == Seq(1L), s"interval join rows: $rows")
  }

  test("streaming session_window aggregation closes sessions at the gap") {
    val input = MemoryStream[(Timestamp, Long)](7, spark, None)
    val sess = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val qy = sess.writeStream.outputMode("append")
      .format("memory").queryName("sw_out")
      .option("checkpointLocation", tmp("graft-sw"))
      .start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(0), 1L), (t(5), 1L)) // one session, 2 events
    qy.processAllAvailable()
    input.addData((t(50), 1L)) // 45-min gap: closes the first session
    qy.processAllAvailable()
    input.addData((t(59), 1L)) // extends the second session (not emitted yet)
    qy.processAllAvailable()
    qy.stop()
    val out = spark.table("sw_out")
      .select(col("session_window.start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("2024-01-01 10:00:00" -> 2L), out.toString)
  }

  test("batch and streaming tumbling aggregation agree (AvailableNow over topic)") {
    val topicDir = tmp("graft-topic2")
    KafkaEnvelope.writeTopic(spark, sf, topicDir, nPartitions = 2)
    val ckpt = tmp("graft-ckpt2")
    val streamAgg = KafkaEnvelope.decode(KafkaEnvelope.readStream(spark, topicDir, 8))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val qy = streamAgg.writeStream.outputMode("complete")
      .format("memory").queryName("tumble_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    qy.awaitTermination(120000)
    val streamed = spark.table("tumble_out")
      .select(unix_timestamp(col("window.start")).as("b"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val batch = q("q_stream_tumbling")
      .select(col("bucket_s"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-batch divergence: ${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
  }

  test("tailChanges streams a table's CDC feed: complete, incremental, restart-safe") {
    val srcDir = Files.createTempDirectory("graft-tail-src").toString
    val ckpt = Files.createTempDirectory("graft-tail-ckpt").toString
    val sink = new ExactlyOnceSink(srcDir)
    sink.commitAppend(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x"))
    sink.mergeDV(spark, Seq((2L, "b2"), (4L, "d")).toDF("id", "x"), Seq("id"))
    sink.deleteDV(spark, col("id") === 1L)

    // collected (version, change_type, id, x) across all delivered batches
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, String)]
    def drain(): Unit = {
      val qy = sink.tailChanges(spark, ckpt) { (changes, _) =>
        seen ++= changes.select(col("batch"), col("_change_type"),
            col("id"), col("x"))
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
      }
      qy.awaitTermination(120000)
    }
    drain()
    // the full history so far arrived: appends as inserts, the MOR
    // merge's pre/post pairs, the MOR delete's delete row
    assert(seen.map(_._2).toSet ===
      Set("insert", "update_preimage", "update_postimage", "delete"))
    // replaying latest-wins over the delivered feed reproduces read()
    def replay(): Map[Long, String] = {
      val byKey = seen.groupBy(_._3)
      byKey.flatMap { case (id, evs) =>
        val last = evs.sortBy(e => (e._1,
          if (e._2 == "insert" || e._2 == "update_postimage") 1 else 0)).last
        if (last._2 == "delete") None else Some(id -> last._4)
      }
    }
    val live = sink.read(spark).select("id", "x").as[(Long, String)].collect().toMap
    assert(replay() === live)

    // new commits after the first drain: the checkpoint makes the second
    // drain deliver ONLY the new versions
    val before = seen.size
    sink.commitAppend(Seq((5L, "e")).toDF("id", "x"))
    sink.mergeDV(spark, Seq((5L, "e2")).toDF("id", "x"), Seq("id"))
    drain()
    val newOnes = seen.drop(before)
    assert(newOnes.nonEmpty && newOnes.forall(_._1 >= 3),
      s"second drain must carry only new versions, got ${newOnes.take(5)}")
    assert(replay() === sink.read(spark).select("id", "x")
      .as[(Long, String)].collect().toMap)
  }

  test("tailChanges rate limit: maxVersionsPerTrigger bounds each micro-batch") {
    val srcDir = Files.createTempDirectory("graft-tailrl-src").toString
    val ckpt = Files.createTempDirectory("graft-tailrl-ckpt").toString
    val sink = new ExactlyOnceSink(srcDir)
    (0 until 5).foreach(k =>
      sink.commitAppend(Seq((k.toLong, s"v$k")).toDF("id", "x")))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    val qy = sink.tailChanges(spark, ckpt, maxVersionsPerTrigger = 1) {
      (ch, _) =>
        batches += ch.select("batch").distinct().collect()
          .map(_.getInt(0)).toSeq
        ()
    }
    qy.awaitTermination(120000)
    assert(batches.flatten.sorted == (0 until 5), s"feed incomplete: $batches")
    assert(batches.forall(_.size == 1),
      s"a micro-batch exceeded the 1-version budget: $batches")
  }

  test("table-to-table replication: tailChanges feeding merge-on-read apply") {
    val srcDir = Files.createTempDirectory("graft-repl-src").toString
    val dstDir = Files.createTempDirectory("graft-repl-dst").toString
    val ckpt = Files.createTempDirectory("graft-repl-ckpt").toString
    val src = new ExactlyOnceSink(srcDir, appId = "repl-src")
    val dst = new ExactlyOnceSink(dstDir, appId = "repl-dst")

    def state(s: ExactlyOnceSink): Map[Long, String] = {
      val df = s.read(spark)
      if (!df.columns.contains("id")) Map.empty
      else df.select("id", "x").as[(Long, String)].collect().toMap
    }
    // the applier: per source version (ascending — cross-version order
    // matters), upsert the row-creating changes and delete the deletes;
    // both verbs are merge-on-read, so the replica pays O(touched
    // files) per applied version, and re-applying a replayed batch is
    // harmless (same upserts converge, deletes of absent keys no-op)
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
    assert(state(dst) === state(src), "replica diverged after first drain")

    src.deleteDV(spark, col("id") < 5L)
    src.merge(spark, Seq((7L, "u7")).toDF("id", "x"), Seq("id")) // CoW merge too
    drain()
    assert(state(dst) === state(src), "replica diverged after second drain")

    // O(range) tail cost: a drain carrying ONE new source version may
    // parse only that version's entry (+1 slack), never the table's
    // whole history — otherwise every micro-batch pays O(lifetime)
    // JSON parses and a long-lived tail degrades quadratically
    src.commitAppend(Seq((100L, "tail")).toDF("id", "x"))
    val parsesBefore = src.logFileParses.get()
    drain()
    val parsed = src.logFileParses.get() - parsesBefore
    assert(parsed <= 2,
      s"tailChanges parsed $parsed log entries for a 1-version batch — O(history) leak")
    assert(state(dst) === state(src), "replica diverged after third drain")
  }

  test("streaming cluster tagging matches the batch k-means assignment") {
    // The clustering serve path: the trained round-2 centroid table
    // (q_llm_kmeans' committed model) rides the stream as a K-row
    // literal, and every incoming embedding is tagged with its cluster
    // by the same exact-integer argmin — strictly map-only (no shuffle,
    // no state, streaming-safe in append mode). Tags must be
    // BIT-IDENTICAL to the batch assignment: quantization, distances
    // and tie-breaks are all integer math, so batch/stream parity is
    // exact equality, not tolerance.
    val cents = graft.queries.VectorOps.kmeansCentroids(spark, sf)
      .as[(Int, Seq[Long])].collect().sortBy(_._1)
    assert(cents.nonEmpty)
    // array ordered by cid ascending + strict < keeps the earlier entry
    // on distance ties == the batch min(struct(d2, cid)) tie-break
    val centArr = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cent")) }: _*)
    val expected = SparkEntry.queries("q_llm_kmeans")(spark, sf)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap

    val input = MemoryStream[(Long, Seq[Float])](31, spark, None)
    val tagged = input.toDF().toDF("vec_id", "embedding")
      .withColumn("qv", transform(col("embedding"),
        x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long")))
      .withColumn("cluster_id",
        aggregate(centArr,
          struct(lit(Long.MaxValue).as("d2"), lit(-1).as("cid")),
          (acc, c) => {
            val dd = graft.queries.VectorOps
              .kmDist2(col("qv"), c.getField("cent"))
            when(dd < acc.getField("d2"),
              struct(dd.as("d2"), c.getField("cid").as("cid")))
              .otherwise(acc)
          }).getField("cid"))
      .select("vec_id", "cluster_id")
    val qy = tagged.writeStream.outputMode("append")
      .format("memory").queryName("km_tag")
      .option("checkpointLocation", tmp("graft-kmtag"))
      .start()
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = vecs.splitAt(vecs.length / 2)
    input.addData(b1.toSeq: _*)
    qy.processAllAvailable()
    input.addData(b2.toSeq: _*)
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("km_tag").as[(Long, Int)].collect().toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size}")
    assert(got == expected, "stream tags diverge from the batch assignment")
  }
  test("streaming drift monitor matches the batch JS formula per micro-batch") {
    // The corpus-LM serve path for distribution monitoring: the
    // committed vocabulary distribution (term counts + total) is the
    // model, and every incoming micro-batch of documents is scored with
    // the SAME fixed-point JS expression trees the batch q_llm_js_drift
    // declares (shared jsTermU/jsAbsentU) via foreachBatch — the drift
    // gauge an ingest pipeline watches to catch an off-distribution
    // feed before it pollutes a curated table. Parity is exact
    // equality, not tolerance: identical integer inputs, identical
    // nano-floored terms, identical long sums.
    import graft.queries.CorpusStatsOps
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val ctf = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_t"))
    val nTotal = ctf.agg(sum(col("c_t"))).as[Long].head()

    def score(batch: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val sp = batch.sparkSession
      import sp.implicits._
      val cnt = batch.select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c_st"))
      val nS = cnt.agg(sum(col("c_st"))).as[Long].head()
      val (terms, covC, presU) = cnt.join(broadcast(ctf), "term")
        .agg(count(lit(1)), sum(col("c_t")),
          sum(CorpusStatsOps.jsTermU(col("c_st"), lit(nS), col("c_t"),
            lit(nTotal))))
        .as[(Long, Long, Long)].head()
      val absU = sp.range(1).select(
        CorpusStatsOps.jsAbsentU(lit(covC), lit(nTotal))).as[Long].head()
      (nS, terms, (presU + absU).toDouble / 1e9 / 2)
    }

    val input = MemoryStream[(Long, String)](33, spark, None)
    val got = scala.collection.concurrent.TrieMap[Long, (Long, Long, Double)]()
    val qy = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", tmp("graft-drift"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got.put(id, score(b)); ()
      }.start()
    val all = docs.as[(Long, String)].collect()
    val (b0, b1) = all.partition(_._1 < 250)
    input.addData(b0.toSeq); qy.processAllAvailable()
    input.addData(b1.toSeq); qy.processAllAvailable()
    qy.stop()
    assert(got.keySet == Set(0L, 1L))
    // the same fixed-point trees score the same rows in plain batch mode
    assert(got(0L) == score(docs.filter(col("doc_id") < 250)))
    assert(got(1L) == score(docs.filter(col("doc_id") >= 250)))
    // JS against the parent corpus is bounded and small for an
    // in-distribution half, far from the ln 2 ceiling
    got.values.foreach { case (_, _, js) =>
      assert(js >= 0.0 && js < 0.5 * math.log(2.0), s"drift $js")
    }
  }

  test("mergeFull: all four clause outcomes land, CDC records every one") {
    // target 1..6, source 4..9(+s): matched 4,5,6 / insert 7,8,9 /
    // not-matched-by-source 1,2,3. matchedDelete kills target 5 (its
    // source row is CONSUMED, not inserted — Delta clause precedence);
    // notMatchedBySourceDelete retires 1 and 2 (the full-sync clause);
    // 3 survives untouched; 4 and 6 take the whole-row update.
    val dir = tmp("graft-mergefull-unit")
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend((1L to 6L).map(i => (i, s"t$i")).toDF("id", "x"))
    val v = sink.mergeFull(spark,
      (4L to 9L).map(i => (i, s"s$i")).toDF("id", "x"), Seq("id"),
      matchedDelete = Some(col("id") === 5L),
      notMatchedBySourceDelete = Some(col("id") <= 2L))
    val got = sink.read(spark).select("id", "x").as[(Long, String)]
      .collect().toMap
    assert(got === Map(3L -> "t3", 4L -> "s4", 6L -> "s6",
      7L -> "s7", 8L -> "s8", 9L -> "s9"))
    // metadata COUNT(*) agrees after the clause mix
    assert(sink.rowCount(spark) === 6L)
    // the CDC feed carries every clause: 3 inserts, 2 pre/post pairs,
    // 3 deletes (one matched-DELETE + two by-source)
    val ch = sink.readChanges(spark, fromVersion = v - 1)
      .select("_change_type", "id", "x").as[(String, Long, String)]
      .collect().groupBy(_._1)
    assert(ch("insert").map(_._2).sorted.toSeq == Seq(7L, 8L, 9L))
    assert(ch("update_preimage").map(r => r._2 -> r._3).toMap ===
      Map(4L -> "t4", 6L -> "t6"))
    assert(ch("update_postimage").map(r => r._2 -> r._3).toMap ===
      Map(4L -> "s4", 6L -> "s6"))
    assert(ch("delete").map(r => r._2 -> r._3).toMap ===
      Map(1L -> "t1", 2L -> "t2", 5L -> "t5"))
    // time travel to the seed still sees the pre-merge state
    assert(sink.read(spark, versionAsOf = Some(v - 1))
      .select("id").as[Long].collect().sorted.toSeq == (1L to 6L))
  }

}
