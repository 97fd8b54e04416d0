package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Version checksums (ExactlyOnceSink `<v>.crc`, the Delta
  * VersionChecksum analog): every commit leaves a best-effort,
  * atomically-written summary of the table state its version pins —
  * live file count, row count, DV-deleted rows, total bytes — computed
  * from the same O(interval) log fold the metadata COUNT(*) uses. The
  * point is INTEGRITY: a log corrupted or hand-edited after the fact
  * diverges from its commit-time summary and [[verifyChecksum]] fails
  * loudly instead of letting reads silently drift. */
class ChecksumSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-crc-spec").toString

  test("every commit writes a checksum that matches a fresh fold") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "x")) // v0
    sink.commitAppend(Seq((3L, "c")).toDF("id", "x")) // v1
    (0L to 1L).foreach { v =>
      val stored = sink.storedChecksum(v)
      assert(stored.isDefined, s"v$v has no checksum")
      assert(stored.get === sink.computeChecksum(v))
    }
    val c1 = sink.storedChecksum(1L).get
    assert(c1.numRows === Some(3L))
    assert(c1.numFiles >= 2, "two appends leave at least two live files")
    assert(c1.numDeletedRows === 0L)
    assert(c1.tableSizeBytes.exists(_ > 0L),
      "per-add byte sizes must fold into tableSizeBytes")
  }

  test("the summary tracks DV deletes, merges, and compaction") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    // one 10-row file, so a partial delete takes the DV tier (a fully
    // matched file would take the cheaper remove tier instead)
    sink.commitAppend(
      spark.range(0, 10).toDF("id").withColumn("x", lit("a")).repartition(1))
    val vDel = sink.deleteDV(spark, col("id") < 3) // DV tombstones, files stay
    val cDel = sink.storedChecksum(vDel).get
    assert(cDel.numRows === Some(7L))
    assert(cDel.numDeletedRows === 3L)
    assert(cDel.numDvFiles >= 1L)
    val vCp = sink.compact(spark) // snapshot rewrite materializes the DVs away
    val cCp = sink.storedChecksum(vCp).get
    assert(cCp.numRows === Some(7L))
    assert(cCp.numDeletedRows === 0L)
    assert(cCp.numDvFiles === 0L)
    assert(sink.verifyChecksum().map(_.version) === Some(vCp))
  }

  test("a tampered checksum fails verification loudly") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, "a")).toDF("id", "x"))
    assert(sink.verifyChecksum(Some(0L)).isDefined)
    val crc = Paths.get(dir, "_graft_log", f"${0L}%020d.crc")
    Files.writeString(crc,
      Files.readString(crc).replace("\"numFiles\":1", "\"numFiles\":7"))
    val e = intercept[RuntimeException](sink.verifyChecksum(Some(0L)))
    assert(e.getMessage.contains("checksum mismatch"))
    // a torn checksum is no checksum: degraded, never wrong
    Files.writeString(crc, "{torn")
    assert(sink.storedChecksum(0L).isEmpty)
    assert(sink.verifyChecksum(Some(0L)).isEmpty)
  }

  test("checksums ride clones verbatim and cleanupLog reclaims the unservable ones") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir, checkpointInterval = 3)
    (0 until 8).foreach(i =>
      sink.commitAppend(Seq((i.toLong, s"r$i")).toDF("id", "x")))
    // shallow clone: counts are path-independent, so the copied
    // checksums verify against the clone's rewritten entries
    val cloneDir = Files.createTempDirectory("graft-crc-clone").toString
    sink.cloneTo(cloneDir)
    val clone = new ExactlyOnceSink(cloneDir)
    assert(clone.verifyChecksum(Some(7L)).flatMap(_.numRows) === Some(8L))
    // retention: checksums below the anchor summarize unservable folds
    sink.cleanupLog(minAgeMs = 0)
    assert(sink.storedChecksum(2L).isEmpty,
      "reclaimed versions must not keep stale checksums")
    assert(sink.verifyChecksum().flatMap(_.numRows) === Some(8L),
      "the newest retained checksum still verifies")
  }
}
