package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Shallow clone ([[ExactlyOnceSink.cloneTo]]) and in-commit timestamps:
  * zero-copy table references, post-clone divergence, merge-on-read over
  * foreign files, physical independence after compact, and the stamped
  * commit clock that time travel and history read from the entries
  * themselves. */
class CloneSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ids(sink: ExactlyOnceSink): Seq[Long] =
    sink.read(spark).select("id").as[Long].collect().sorted.toSeq

  private def dataFilesUnder(dir: String): Seq[String] =
    if (!Files.isDirectory(Paths.get(dir, "data"))) Nil
    else withDirStream(Files.walk(Paths.get(dir, "data")))(_
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq)

  test("clone sees the source state at clone time without copying a byte") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 100).toDF("id").withColumn("v", lit(1L)))
    src.commitAppend(spark.range(100, 150).toDF("id").withColumn("v", lit(2L)))

    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)

    assert(ids(clone) == (0L until 150L).toSeq)
    assert(dataFilesUnder(cloneDir).isEmpty, "shallow clone must copy no data files")
    // version history carries over: time travel on the clone
    assert(clone.read(spark, versionAsOf = Some(0L))
      .select("id").as[Long].collect().sorted.toSeq == (0L until 100L).toSeq)
  }

  test("writes after the clone diverge in both directions") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 10).toDF("id"))
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)

    src.commitAppend(spark.range(10, 20).toDF("id"))   // source-only
    clone.commitAppend(spark.range(100, 105).toDF("id")) // clone-only

    assert(ids(src) == (0L until 20L).toSeq)
    assert(ids(clone) == ((0L until 10L) ++ (100L until 105L)).toSeq)
    // the clone's new commit landed in ITS data root, not the source's
    assert(dataFilesUnder(cloneDir).nonEmpty)
  }

  test("deletion vectors on the clone tombstone foreign source files; source unaffected") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 50).toDF("id").withColumn("v", lit(7L)))
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)

    // row-level DV delete against files that physically live in the source
    clone.deleteDV(spark, col("id") < 20)
    assert(ids(clone) == (20L until 50L).toSeq)
    assert(ids(src) == (0L until 50L).toSeq, "source must not see clone deletes")
    // and the skipping read still prunes on the clone
    val skipped = clone.readSkipping(spark, "id", 40L, 49L)
      .filter(col("id") >= 40L).select("id").as[Long].collect().sorted.toSeq
    assert(skipped == (40L until 50L).toSeq)
  }

  test("clone of a merge-on-read source carries its deletion vectors") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 30).toDF("id"))
    src.deleteDV(spark, col("id") % 3 === 0)
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    assert(ids(clone) == (0L until 30L).filter(_ % 3 != 0).toSeq)
  }

  test("compact localizes the clone: survives source data deletion afterwards") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 40).toDF("id"))
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    clone.commitAppend(spark.range(40, 45).toDF("id"))

    clone.compact(spark) // copy-on-write rewrite into clone-local files
    // destroy the source's data entirely — the documented Delta caveat,
    // now harmless because the clone no longer references it
    withDirStream(Files.walk(Paths.get(srcDir, "data")))(_.toSeq)
      .reverse.foreach(Files.delete)
    assert(ids(clone) == (0L until 45L).toSeq)
  }

  test("vacuum on the clone never reclaims source files") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 25).toDF("id"))
    val srcFiles = dataFilesUnder(srcDir).toSet
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    clone.vacuum(retainHistory = false, minAgeMs = 0)
    assert(dataFilesUnder(srcDir).toSet == srcFiles)
    assert(ids(clone) == (0L until 25L).toSeq)
  }

  test("chained clone: a clone of a clone still reads the original data") {
    val aDir = tmp("graft-clone-a")
    val a = new ExactlyOnceSink(aDir)
    a.commitAppend(spark.range(0, 15).toDF("id"))
    val bDir = tmp("graft-clone-b")
    a.cloneTo(bDir)
    val b = new ExactlyOnceSink(bDir)
    b.commitAppend(spark.range(15, 18).toDF("id"))
    val cDir = tmp("graft-clone-c")
    b.cloneTo(cDir)
    val c = new ExactlyOnceSink(cDir)
    assert(ids(c) == (0L until 18L).toSeq)
    assert(dataFilesUnder(cDir).isEmpty)
  }

  test("cloneTo refuses a target that already has a log") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 5).toDF("id"))
    val otherDir = tmp("graft-clone-other")
    new ExactlyOnceSink(otherDir).commitAppend(spark.range(0, 3).toDF("id"))
    val e = intercept[IllegalArgumentException] { src.cloneTo(otherDir) }
    assert(e.getMessage.contains("already has a commit log"))
  }

  test("clone preserves a partitioned source's hive layout reads") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(
      spark.range(0, 60).toDF("id").withColumn("part", col("id") % 3),
      partitionBy = Seq("part"))
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    val got = clone.read(spark).filter(col("part") === 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 60L).filter(_ % 3 == 1).toSeq)
  }

  // -------------------------------------------------------------------
  // protocol reader features
  // -------------------------------------------------------------------

  test("an entry declaring an unknown reader feature fails loudly, never misreads") {
    val dir = tmp("graft-proto")
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(spark.range(0, 5).toDF("id"))
    // hand-write a future-format commit: a feature this reader lacks
    val log = Paths.get(dir, "_graft_log")
    Files.writeString(log.resolve(f"${1L}%020d.json"),
      """{"txn":{"appId":"future-writer","version":1},""" +
        """"protocol":{"readerFeatures":["v2Checkpoints"]},""" +
        """"snapshot":false,"dir":"files/x","add":[]}""")
    val e = intercept[IllegalArgumentException] { sink.read(spark).count() }
    assert(e.getMessage.contains("v2Checkpoints"))
    assert(e.getMessage.contains("reader feature"))
  }

  test("DV and clone commits declare their reader features; known ones parse") {
    val srcDir = tmp("graft-proto-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 10).toDF("id"))
    src.deleteDV(spark, col("id") < 2)
    val dvEntry = Files.readString(
      Paths.get(srcDir, "_graft_log").resolve(f"${1L}%020d.json"))
    assert(dvEntry.contains(""""readerFeatures":["dv"]"""))
    val cloneDir = tmp("graft-proto-tgt")
    src.cloneTo(cloneDir)
    val cloned = new ExactlyOnceSink(cloneDir)
    val clonedEntry = Files.readString(
      Paths.get(cloneDir, "_graft_log").resolve(f"${1L}%020d.json"))
    assert(clonedEntry.contains("absolutePaths"))
    assert(ids(cloned) == (2L until 10L).toSeq) // features known → reads fine
  }

  // -------------------------------------------------------------------
  // in-commit timestamps
  // -------------------------------------------------------------------

  test("in-commit timestamps are strictly monotone in version order") {
    val dir = tmp("graft-ict")
    val sink = new ExactlyOnceSink(dir)
    (0 until 5).foreach(i => sink.commitAppend(spark.range(i, i + 1).toDF("id")))
    val ts = sink.history(spark)
      .select("version", "timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).sortBy(_._1)
    assert(ts.length == 5)
    assert(ts.forall(_._2 > 0))
    ts.sliding(2).foreach { case Array((v1, t1), (v2, t2)) =>
      assert(t2 > t1, s"ICT not strictly increasing: v$v1=$t1 v$v2=$t2")
    }
  }

  test("timestamps survive cleanupLog through the checkpoint (no null history)") {
    val dir = tmp("graft-ict")
    val sink = new ExactlyOnceSink(dir, checkpointInterval = 4)
    (0 until 9).foreach(i => sink.commitAppend(spark.range(i, i + 1).toDF("id")))
    assert(sink.cleanupLog(minAgeMs = 0) > 0, "expected raw entries reclaimed")
    val hist = sink.history(spark).select("version", "timestamp").collect()
    assert(hist.forall(r => r.getTimestamp(1) != null),
      "ICT must survive log cleanup via checkpoint entries")
  }

  test("timestampAsOf serves the stamped clock and fails loudly below the retained window") {
    val dir = tmp("graft-ict")
    val sink = new ExactlyOnceSink(dir, checkpointInterval = 2)
    (0 until 5).foreach(i => sink.commitAppend(spark.range(i, i + 1).toDF("id")))
    val hist = sink.history(spark).select("version", "timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).sortBy(_._1).toSeq
    sink.cleanupLog(minAgeMs = 0) // anchor = checkpoint at v4; raw < 4 reclaimed
    // as-of the NEWEST stamp: full state, resolved from the stamps alone
    val atLatest = sink.read(spark, new java.sql.Timestamp(hist.last._2))
      .select("id").as[Long].collect().sorted.toSeq
    assert(atLatest == (0L until 5L).toSeq)
    // as-of a stamp below the retained window: loud failure, exactly as
    // versionAsOf below the window — never a silently later state
    val e = intercept[RuntimeException] {
      sink.read(spark,
        new java.sql.Timestamp(hist.find(_._1 == 2L).get._2)).count()
    }
    assert(e.getMessage.contains("predates retained history"))
  }

  test("the clone serves the source's CDC history and metadata counts") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 10).toDF("id"))
    src.deleteDV(spark, col("id") < 3) // records delete change rows
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    // the CDC feed over the cloned history reads the source-rooted
    // change dirs (rewritten absolute) — identical to the source's feed
    def feed(s: ExactlyOnceSink) = s.readChanges(spark, fromVersion = -1L)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(feed(clone) == feed(src))
    assert(feed(clone).count(_._1 == "delete") == 3)
    // metadata-only COUNT(*) works across foreign files + clone DVs
    assert(clone.rowCount(spark) == 7L)
    clone.deleteDV(spark, col("id") === 9L)
    assert(clone.rowCount(spark) == 6L)
    assert(src.rowCount(spark) == 7L)
  }

  test("a clone inherits the source's commit timestamps verbatim") {
    val srcDir = tmp("graft-clone-src")
    val src = new ExactlyOnceSink(srcDir)
    (0 until 3).foreach(i => src.commitAppend(spark.range(i, i + 1).toDF("id")))
    val srcTs = src.history(spark).select("version", "timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toMap
    val cloneDir = tmp("graft-clone-tgt")
    val clone = new ExactlyOnceSink(cloneDir)
    src.cloneTo(cloneDir)
    val cloneTs = clone.history(spark).select("version", "timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toMap
    assert(cloneTs == srcTs)
  }

  // -------------------------------------------------------------------
  // DEEP CLONE: physical independence with FULL history (time travel,
  // CDC, row ids) — the source can be deleted outright afterwards
  // -------------------------------------------------------------------

  private def purgeDir(dir: String): Unit =
    withDirStream(Files.walk(Paths.get(dir)))(_.toSeq)
      .reverse.foreach(Files.delete)

  test("deep clone: full history survives outright deletion of the source") {
    val srcDir = tmp("graft-deep-src")
    // multipart checkpoints on, so the byte-copied sidecars are part of
    // what the post-deletion reads exercise
    val src = new ExactlyOnceSink(srcDir, checkpointInterval = 3,
      checkpointPartBytes = 1)
    src.enableRowTracking(spark)
    src.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "x")) // v0
    src.commitAppend(Seq((3L, "c"), (4L, "d")).toDF("id", "x")) // v1
    src.mergeDV(spark, Seq((2L, "B"), (5L, "e")).toDF("id", "x"),
      Seq("id")) // v2: update 2, insert 5 (merge-on-read)
    src.deleteDV(spark, col("id") === 1L) // v3 (DV tombstone)
    src.restore(spark, 1L) // v4 -> back to {1,2,3,4}
    src.commitAppend(Seq((9L, "z")).toDF("id", "x")) // v5

    // capture the source's answers BEFORE it disappears
    def snap(s: ExactlyOnceSink) = (
      ids(s),
      s.read(spark, versionAsOf = Some(2L)).select("id", "x")
        .as[(Long, String)].collect().sorted.toSeq,
      s.readChanges(spark, fromVersion = -1L)
        .select("_change_type", "id").as[(String, Long)]
        .collect().sorted.toSeq,
      s.rowCount(spark),
      s.readWithRowIds(spark).select("id", "_row_id", "_row_commit_version")
        .as[(Long, Long, Long)].collect().sorted.toSeq)
    val expect = snap(src)

    val deepDir = tmp("graft-deep-tgt")
    src.deepCloneTo(deepDir)
    assert(dataFilesUnder(deepDir).nonEmpty,
      "a deep clone owns physical copies of the data")
    assert(withDirStream(Files.list(Paths.get(deepDir, "_graft_log")))(
      _.map(_.getFileName.toString).toSeq).exists(_.endsWith(".sidecar")),
      "multipart checkpoint sidecars must be carried over")

    purgeDir(srcDir) // the verb's whole point: zero live coupling

    val deep = new ExactlyOnceSink(deepDir, checkpointInterval = 3,
      checkpointPartBytes = 1)
    assert(snap(deep) === expect,
      "live read, time travel, CDC, rowCount and row ids must all " +
        "survive source deletion")
    // and the clone keeps being a writable table
    deep.commitAppend(Seq((100L, "w")).toDF("id", "x"))
    assert(ids(deep).contains(100L))
  }

  test("deepCloneTo refuses a shallow clone; compact + cleanupLog localizes it") {
    val srcDir = tmp("graft-deep-src2")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 20).toDF("id"))
    val shallowDir = tmp("graft-deep-shallow")
    src.cloneTo(shallowDir)
    val shallow = new ExactlyOnceSink(shallowDir, checkpointInterval = 2)

    val e = intercept[RuntimeException] {
      shallow.deepCloneTo(tmp("graft-deep-refused"))
    }
    assert(e.getMessage.contains("absolute path"),
      s"refusal must name the coupling, got: ${e.getMessage}")

    // the documented localize path: compact (live set goes clone-local),
    // then cross a checkpoint cadence and retire the absolute-path
    // history entries from the servable log
    shallow.compact(spark)
    shallow.commitAppend(spark.range(20, 25).toDF("id"))
    shallow.commitAppend(spark.range(25, 30).toDF("id"))
    shallow.cleanupLog(minAgeMs = 0)
    val deepDir = tmp("graft-deep-localized")
    shallow.deepCloneTo(deepDir)

    purgeDir(srcDir)
    purgeDir(shallowDir)
    val deep = new ExactlyOnceSink(deepDir)
    assert(ids(deep) === (0L until 30L).toSeq,
      "the localized deep clone must survive deletion of BOTH ancestors")
  }

  test("deepCloneTo refuses a target with a pre-existing data tree") {
    // copies replace name-collisions but leave strangers in place: a
    // stale target data/ tree would be silently MERGED with the clone,
    // keeping files the cloned log never references — the target must
    // be empty, not merely log-less
    val srcDir = tmp("graft-deep-src3")
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(spark.range(0, 5).toDF("id"))
    val tgtDir = tmp("graft-deep-stale")
    val stale = Paths.get(tgtDir, "data", "old")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("stray.parquet"), "not a clone file")
    val e = intercept[IllegalArgumentException](src.deepCloneTo(tgtDir))
    assert(e.getMessage.contains("data tree"),
      s"refusal must name the stale data tree, got: ${e.getMessage}")
    // an empty (or absent) target still works
    val okDir = tmp("graft-deep-ok")
    src.deepCloneTo(okDir)
    assert(ids(new ExactlyOnceSink(okDir)) === (0L until 5L).toSeq)
  }
}
