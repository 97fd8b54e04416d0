package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Generated columns (the Delta GENERATED ALWAYS AS analog): declared
  * as metaData like constraints, computed on write when absent,
  * validated per row when present, usable as a partition / skipping
  * column, and surviving checkpointed log cleanup via the aux header. */
class GeneratedColumnSpec extends SparkSpecBase {
  import spark.implicits._

  private def newSink(tag: String, interval: Int = 0): (ExactlyOnceSink, String) = {
    val dir = Files.createTempDirectory(s"graft-gen-$tag").toString
    (new ExactlyOnceSink(dir, checkpointInterval = interval), dir)
  }

  private def rows(lo: Long, n: Int): org.apache.spark.sql.DataFrame =
    (lo until lo + n).map(i => (i, s"r$i")).toDF("id", "x")

  /** Task-side raise_error text lands somewhere down the cause chain. */
  private def chainMsg(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("absent column is computed on write; present column is validated") {
    val (sink, _) = newSink("compute")
    sink.setGeneratedColumn(spark, "bucket", "id % 4")
    sink.commitAppend(rows(0, 8)) // no bucket column supplied
    val got = sink.read(spark).select("id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 8L).map(i => i -> i % 4).toMap)

    // correct supplied values pass
    sink.commitAppend(rows(8, 2).withColumn("bucket", col("id") % 4))
    assert(sink.read(spark).count() == 10)
    // wrong supplied values abort the write before any commit
    val e = intercept[Exception](
      sink.commitAppend(rows(10, 2).withColumn("bucket", lit(99L))))
    assert(chainMsg(e).contains("generated column"),
      s"unexpected: ${chainMsg(e)}")
    assert(sink.read(spark).count() == 10, "aborted write committed data")
  }

  test("declaring on a non-empty table requires a consistent existing column") {
    val (sink, _) = newSink("declare")
    sink.commitAppend(rows(0, 4).withColumn("bucket", col("id") % 4))
    // consistent -> accepted
    sink.setGeneratedColumn(spark, "bucket", "id % 4")
    assert(sink.activeGenerated() == Map("bucket" -> "id % 4"))
    // missing column -> rejected
    val m = intercept[Exception](
      sink.setGeneratedColumn(spark, "nope", "id + 1"))
    assert(m.getMessage.contains("lack the column"))
    // inconsistent values -> rejected
    val i = intercept[Exception](
      sink.setGeneratedColumn(spark, "bucket", "id % 3"))
    assert(i.getMessage.contains("do not match"))
  }

  test("merge and mergeDV compute the column for narrower update frames") {
    val (sink, _) = newSink("merge")
    sink.setGeneratedColumn(spark, "bucket", "id % 4")
    sink.commitAppend(rows(0, 8))
    // CoW merge: updates lack bucket -> computed, not nulled
    sink.merge(spark, Seq((2L, "u2"), (20L, "n20")).toDF("id", "x"), Seq("id"))
    // MOR merge: same contract through the deletion-vector path
    sink.mergeDV(spark, Seq((3L, "u3"), (30L, "n30")).toDF("id", "x"), Seq("id"))
    val got = sink.read(spark).select("id", "x", "bucket").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(2L) == (("u2", 2L)) && got(20L) == (("n20", 0L)))
    assert(got(3L) == (("u3", 3L)) && got(30L) == (("n30", 2L)))
    assert(got.forall { case (id, (_, b)) => b == id % 4 }, "a null or wrong bucket survived")
  }

  test("generated partition column prunes; rule survives checkpoint + cleanupLog") {
    val (sink, dir) = newSink("part", interval = 3)
    sink.setGeneratedColumn(spark, "chunk", "id DIV 100")
    (0 until 6).foreach(k => sink.commitAppend(rows(k * 100L, 100).coalesce(1)))
    // footer stats on the generated column are tight per commit -> the
    // skipping read touches one file
    val pruned = sink.readSkipping(spark, "chunk", 2.0, 2.0)
    assert(pruned.inputFiles.length < sink.read(spark).inputFiles.length)
    assert(pruned.filter(col("chunk") === 2).count() == 100)
    // reclaim the carrier entry; a COLD instance must still enforce via
    // the checkpoint aux header
    sink.cleanupLog(minAgeMs = 0)
    val cold = new ExactlyOnceSink(dir)
    assert(cold.activeGenerated() == Map("chunk" -> "id DIV 100"))
    cold.commitAppend(rows(600, 50).coalesce(1))
    assert(cold.read(spark).filter(col("chunk") === 6).count() == 50)
    val e = intercept[Exception](
      cold.commitAppend(rows(650, 2).withColumn("chunk", lit(0L))))
    assert(chainMsg(e).contains("generated column"))
    // drop: writes without the column now null-pad instead of computing
    cold.dropGeneratedColumn("chunk")
    cold.commitAppend(rows(700, 2).coalesce(1))
    assert(cold.read(spark).filter(col("chunk").isNull).count() == 2)
  }

  test("generated rule x column-mapping rename x replaceWhere: the interaction product") {
    // VERDICT r12 #4: generated expressions are keyed to LOGICAL names,
    // renames re-label logical onto frozen physical names, and
    // replaceWhere re-derives generated columns on its snapshot — the
    // three must compose without the rule silently going stale.
    val (sink, _) = newSink("rw-rename")
    sink.setGeneratedColumn(spark, "bucket", "id % 4")
    sink.commitAppend(rows(0, 6).withColumn("z", lit("tag")))
    // 1. renaming a column the rule REFERENCES is refused (the expr
    //    would silently stop resolving) — the Delta guard
    val g = intercept[IllegalArgumentException](sink.renameColumn("id", "id2"))
    assert(g.getMessage.contains("referenced by"))
    // 2. renaming an UNREFERENCED column is fine mid-history
    sink.renameColumn("z", "z2")
    // 3. replaceWhere under the renamed schema, replacement OMITS the
    //    generated column: the snapshot must re-derive it for the
    //    replacement rows and carry it for the kept rows
    val repl = Seq((100L, "new100", "t"), (101L, "new101", "t"))
      .toDF("id", "x", "z2")
    sink.replaceWhere(spark, col("id") >= 3, repl)
    val got = sink.read(spark).select("id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 100L -> 0L, 101L -> 1L),
      s"generated column not re-derived under rename+replaceWhere: $got")
    // 4. a replacement row carrying a WRONG generated value aborts the
    //    snapshot (negative control: validation also survives the rename)
    val bad = Seq((102L, "bad", "t")).toDF("id", "x", "z2")
      .withColumn("bucket", lit(99L))
    val e = intercept[Exception](
      sink.replaceWhere(spark, col("id") >= 100, bad))
    assert(chainMsg(e).contains("generated column"), chainMsg(e))
    assert(sink.read(spark).count() == 5, "aborted replaceWhere committed")
    // 5. and the rename is visible in the replaced table's schema
    assert(sink.read(spark).columns.contains("z2"))
  }
}
