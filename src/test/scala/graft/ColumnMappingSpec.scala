package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Column mapping (the Delta RENAME/DROP COLUMN analog): metadata-only
  * re-labelling of the logical schema over frozen physical file names —
  * no data rewrite, every read path translates, writes keep landing
  * under the physical name, skipping still prunes, and the rules
  * survive checkpointed log cleanup. */
class ColumnMappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def newSink(tag: String, interval: Int = 0): (ExactlyOnceSink, String) = {
    val dir = Files.createTempDirectory(s"graft-cmap-$tag").toString
    (new ExactlyOnceSink(dir, checkpointInterval = interval), dir)
  }

  private def rows(lo: Long, n: Int) =
    (lo until lo + n).map(i => (i, s"r$i", i * 1.0)).toDF("id", "x", "v")

  test("rename is metadata-only: reads translate, files keep the physical name") {
    val (sink, dir) = newSink("rename")
    sink.commitAppend(rows(0, 10).coalesce(1))
    sink.deleteDV(spark, col("id") === 3L) // a tombstone rides along
    val beforeFiles = withDirStream(Files.walk(Paths.get(dir, "data")))(_
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet)

    sink.renameColumn("x", "label")

    // no data rewrite
    val afterFiles = withDirStream(Files.walk(Paths.get(dir, "data")))(_
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet)
    assert(afterFiles == beforeFiles, "rename rewrote data files")
    // logical read: renamed column, same values, tombstone still applied
    val got = sink.read(spark)
    assert(got.columns.contains("label") && !got.columns.contains("x"))
    assert(got.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      (0L until 10L).filterNot(_ == 3L).map(i => i -> s"r$i").toMap)
    // the physical files still carry the original name
    val raw = spark.read.parquet(afterFiles.head)
    assert(raw.columns.contains("x") && !raw.columns.contains("label"))
    // latestSchema speaks logical
    assert(sink.latestSchema().get.fieldNames.toSeq == Seq("id", "label", "v"))
  }

  test("writes after a rename land under the physical name; skipping prunes") {
    val (sink, dir) = newSink("write")
    (0 until 4).foreach(k => sink.commitAppend(rows(k * 100L, 100).coalesce(1)))
    sink.renameColumn("v", "value")
    // logical write with the NEW name
    sink.commitAppend(rows(400, 100).coalesce(1)
      .withColumnRenamed("v", "value"))
    assert(sink.read(spark).count() == 500)
    // the new file's physical column is still v
    val newest = withDirStream(Files.walk(Paths.get(dir, "data")))(_
      .filter(_.toString.endsWith(".parquet")).toSeq)
      .maxBy(p => Files.getLastModifiedTime(p).toMillis)
    assert(spark.read.parquet(newest.toString).columns.contains("v"))
    // stat skipping on the LOGICAL name prunes via the physical stats
    val pruned = sink.readSkipping(spark, "value", 150.0, 160.0)
    assert(pruned.inputFiles.length < sink.read(spark).inputFiles.length,
      "rename broke stat pruning")
    assert(pruned.filter(col("value").between(150.0, 160.0)).count() == 11)
    // CDC and upserts speak logical too
    sink.mergeDV(spark, Seq((7L, "u7", 7.0)).toDF("id", "x", "value"), Seq("id"))
    val ch = sink.readChanges(spark, fromVersion = 5)
    assert(ch.columns.contains("value") && !ch.columns.contains("v"))
    assert(sink.read(spark).filter(col("id") === 7L)
      .select("x").head().getString(0) == "u7")
  }

  test("physical names are reserved; drop tombstones them for good") {
    val (sink, _) = newSink("drop")
    sink.commitAppend(rows(0, 5).coalesce(1))
    sink.renameColumn("x", "label")
    // the frozen physical name cannot re-enter as a new logical column
    val e = intercept[RuntimeException](sink.commitAppend(
      Seq((5L, "l5", 5.0, "sneak")).toDF("id", "label", "v", "x"),
      mergeSchema = true))
    assert(e.getMessage.contains("reserved"), e.getMessage)

    sink.dropColumn("label")
    val got = sink.read(spark)
    assert(got.columns.toSet.intersect(Set("x", "label")).isEmpty)
    // narrower appends still fine; the dropped physical stays dead
    sink.commitAppend(Seq((10L, 10.0)).toDF("id", "v"))
    assert(sink.read(spark).count() == 6)
    val e2 = intercept[RuntimeException](sink.commitAppend(
      Seq((11L, 11.0, "zombie")).toDF("id", "v", "x"), mergeSchema = true))
    assert(e2.getMessage.contains("reserved"))
    // but a FRESH logical name is free — even the old logical label
    sink.commitAppend(Seq((12L, 12.0, "fresh")).toDF("id", "v", "label"),
      mergeSchema = true)
    assert(sink.read(spark, mergeSchema = true)
      .filter(col("label") === "fresh").count() == 1)
  }

  test("guards: duplicate target, referenced columns; cold instance after cleanup") {
    val (sink, dir) = newSink("guard", interval = 3)
    sink.commitAppend(rows(0, 4).coalesce(1))
    intercept[Exception](sink.renameColumn("x", "v")) // exists
    intercept[Exception](sink.renameColumn("nope", "y")) // absent
    sink.setConstraint(spark, "pos", "v >= 0")
    val c = intercept[Exception](sink.renameColumn("v", "w"))
    assert(c.getMessage.contains("referenced"))
    sink.dropConstraint("pos")
    sink.renameColumn("v", "w")
    // bury the carrier under a checkpoint and reclaim it
    (1 to 6).foreach(k => sink.commitAppend(rows(10L * k, 2).coalesce(1)
      .withColumnRenamed("v", "w")))
    sink.cleanupLog(minAgeMs = 0)
    val cold = new ExactlyOnceSink(dir)
    val got = cold.read(spark)
    assert(got.columns.contains("w") && !got.columns.contains("v"),
      "mapping lost after cleanupLog")
    assert(cold.latestSchema().get.fieldNames.contains("w"))
    // the metadata verbs are first-class history entries
    val ops = cold.history(spark).select("operation").collect()
      .map(_.getString(0)).toSet
    assert(ops.contains("RENAME COLUMN") && ops.contains("SET CONSTRAINT"),
      s"metadata ops missing from history: $ops")
  }

  test("field metadata containing the key 'partitionColumns' cannot spoof latestSchema") {
    // field metadata flows into schema.json uncut, so a substring scan
    // for the NEXT entry key would truncate mid-schema and brick every
    // subsequent verb — latestSchema must parse the entry as JSON
    import org.apache.spark.sql.types._
    val (sink, dir) = newSink("spoof")
    val md = new MetadataBuilder()
      .putString("partitionColumns", "\":[],\"evil\":{").build()
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "x")
    val spoofed = spark.createDataFrame(base.rdd, StructType(Seq(
      StructField("id", LongType, nullable = false, md),
      StructField("x", StringType))))
    sink.commitAppend(spoofed)
    val sch = new ExactlyOnceSink(dir).latestSchema().get
    assert(sch.fieldNames.toSeq === Seq("id", "x"))
    assert(sch("id").metadata.getString("partitionColumns").nonEmpty)
    // every latestSchema-reading verb still works over the spoofed entry
    sink.setConstraint(spark, "pos", "id > 0")
    sink.renameColumn("x", "x2")
    sink.commitAppend(Seq((3L, "c")).toDF("id", "x2"))
    assert(sink.read(spark).count() === 3)
  }
}
