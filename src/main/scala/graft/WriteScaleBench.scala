package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Write-path scaling canary (VERDICT r13 #4): ScaleBench prices the
  * QUERY surface at 10×/50× data; this main prices the SINK's two
  * table-maintenance verbs whose 100 TB claims are cost-model claims
  * about what they DON'T touch:
  *
  *   - `mergeDV` — O(matched files + batch): per-file min/max stats
  *     prune the probe to the files whose key ranges intersect the
  *     update batch, so an update stream touching a bounded key range
  *     must cost the SAME on a 10× table as on a 1× table;
  *   - `compactSmall` — O(small files): incremental OPTIMIZE packs
  *     only files under the target size, so the same small-file
  *     backlog must cost the same regardless of how much packed data
  *     sits alongside it.
  *
  * Protocol: for each table scale (default 1,10) build an events table
  * of `scale` disjoint fixture copies (the UpsertBench construction),
  * apply B identical mergeDV batches against copy-0 keys (timed per
  * batch), then append a fixed 24-commit small-file backlog and time
  * one compactSmall pass. Flat per-batch and per-pass times across the
  * scales = the cost model holds; growth tracking table size = a scan
  * leak. Since round 15 every scale also runs ROW-TRACKED, so the
  * artifact prices the row-tracking feature per verb (tracked /
  * untracked at the largest scale) and re-checks flatness under it.
  * Emits one JSON line and persists golden/scaling_w_r16.json
  * (run on an idle box; the Bench sentinel travels in the artifact).
  */
object WriteScaleBench {

  case class M(baseRows: Long, mergePerBatch: Seq[Double],
      smallFiles: Int, compactSec: Double)

  def run(spark: SparkSession, sfDir: String, scale: Int, batches: Int,
      updatesPerBatch: Int, tableDir: String,
      tracked: Boolean = false): M = {
    val ev0 = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val maxId = ev0.agg(max("event_id")).head().getLong(0) + 1
    val sink = new ExactlyOnceSink(tableDir, appId = s"graft-wscale-$scale")
    // row-tracking arm (round 15): same workload over a tracked table
    // prices the feature's write cost — baseRowId allocation on every
    // commit, the resolution + lineage joins inside mergeDV, and the
    // two materialized long columns compactSmall's rewrite carries
    if (tracked) sink.enableRowTracking(spark)
    // few large files per copy: the base table must NOT qualify as
    // compactable backlog (targetBytes below) or as mergeDV rewrite
    // fodder beyond the genuinely matched files
    (0 until scale).foreach { k =>
      sink.commitAppend(
        ev0.withColumn("event_id", col("event_id") + k * maxId).coalesce(4))
    }
    val baseRows = ev0.count() * scale

    // mergeDV arm: every batch touches a different residue class of
    // copy-0 keys — matched files are copy-0's 4, whatever the scale
    val p = math.max(2L, baseRows / scale / updatesPerBatch)
    val updates = (0 until batches).map { b =>
      ev0.filter(pmod(col("event_id"), lit(p)) === lit(b.toLong))
        .limit(updatesPerBatch)
        .withColumn("value", lit(1e6 + b))
        .cache()
    }
    updates.foreach(_.count()) // materialize outside the timed region
    val perBatch = (0 until batches).map { b =>
      val t0 = System.nanoTime()
      sink.mergeDV(spark, updates(b), Seq("event_id"))
      (System.nanoTime() - t0) / 1e9
    }
    updates.foreach(_.unpersist(blocking = false))
    require(sink.read(spark).count() == baseRows, "mergeDV changed row count")

    // compactSmall arm: a FIXED small-file backlog (24 one-file commits
    // of 200 rows), then one incremental OPTIMIZE pass at a target that
    // covers the backlog but not the base files
    val smallCommits = 24
    (0 until smallCommits).foreach { i =>
      sink.commitAppend(ev0.limit(200)
        .withColumn("event_id", col("event_id") + (scale + 1 + i) * maxId)
        .coalesce(1))
    }
    val t0 = System.nanoTime()
    val v = sink.compactSmall(spark, targetBytes = 256L << 10)
    val compactSec = (System.nanoTime() - t0) / 1e9
    require(v >= 0, "compactSmall found nothing to pack")
    require(sink.read(spark).count() == baseRows + smallCommits * 200L,
      "compaction changed row count")
    M(baseRows, perBatch, smallCommits, compactSec)
  }

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val path = Paths.get(dir)
    if (Files.exists(path))
      locally { val st = Files.walk(path)
        try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
        finally st.close() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_WRITE_SCALES", "1,10")
      .split(',').map(_.trim.toInt).toSeq
    val batches = sys.env.getOrElse("SPARK_GRAFT_WRITE_BATCHES", "6").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_WRITE_K", "2000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val calibBefore = Bench.calibrate()
    val (calibMtBefore, mtThreads) = Bench.calibrateMt()
    // each scale runs untracked AND row-tracked back to back: the
    // flat-vs-table claim is re-checked under tracking, and the
    // tracked/untracked ratio prices the feature per verb
    val results = scales.flatMap { s =>
      Seq(false, true).map { rt =>
        val dir = Files.createTempDirectory(s"graft-wscale-$s-$rt").toString
        try (s, rt) -> run(spark, sfDir, s, batches, k, dir, tracked = rt)
        finally rmTree(dir)
      }
    }
    val calibAfter = Bench.calibrate()
    val (calibMtAfter, _) = Bench.calibrateMt()
    val contaminated =
      math.max(calibBefore, calibAfter) > Bench.CalibNominalSec * 1.10 ||
        math.max(calibMtBefore, calibMtAfter) > Bench.CalibMtNominalSec * 1.10

    def f3(v: Double): String = f"$v%.3f"
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val per = results.map { case ((s, rt), m) =>
      s""""x$s${if (rt) "_rt" else ""}":{"base_rows":${m.baseRows},""" +
        s""""mergedv_per_batch_s":[${m.mergePerBatch.map(f3).mkString(",")}],""" +
        s""""mergedv_p50_s":${f3(med(m.mergePerBatch))},""" +
        s""""small_files":${m.smallFiles},""" +
        s""""compact_small_s":${f3(m.compactSec)}}"""
    }.mkString("{", ",", "}")
    def leg(rt: Boolean) = results.collect { case ((_, r), m) if r == rt => m }
    def ratios(ms: Seq[M]) = (
      med(ms.last.mergePerBatch) / med(ms.head.mergePerBatch),
      ms.last.compactSec / ms.head.compactSec)
    val (mdR, cpR) = ratios(leg(false))
    val (mdRt, cpRt) = ratios(leg(true))
    // feature price at the LARGEST scale: tracked / untracked per verb
    val rtCostMerge =
      med(leg(true).last.mergePerBatch) / med(leg(false).last.mergePerBatch)
    val rtCostCompact = leg(true).last.compactSec / leg(false).last.compactSec
    val line =
      s"""{"metric":"write_scale_canary","scales":[${scales.mkString(",")}],""" +
        s""""updates_per_batch":$k,"batches":$batches,""" +
        s""""mergedv_p50_ratio":${f3(mdR)},""" +
        s""""compact_small_ratio":${f3(cpR)},""" +
        s""""mergedv_p50_ratio_rowtracked":${f3(mdRt)},""" +
        s""""compact_small_ratio_rowtracked":${f3(cpRt)},""" +
        s""""rowtracking_cost_mergedv":${f3(rtCostMerge)},""" +
        s""""rowtracking_cost_compact":${f3(rtCostCompact)},""" +
        s""""calib_before":${f3(calibBefore)},"calib_after":${f3(calibAfter)},""" +
        s""""calib_mt_before":${f3(calibMtBefore)},""" +
        s""""calib_mt_after":${f3(calibMtAfter)},"calib_mt_threads":$mtThreads,""" +
        s""""calib_mt_nominal":${f3(Bench.CalibMtNominalSec)},""" +
        s""""calib_nominal":${f3(Bench.CalibNominalSec)},""" +
        s""""contaminated":$contaminated,"sf":"$sfDir","tables":$per}"""
    Files.createDirectories(Paths.get("golden"))
    Files.writeString(Paths.get("golden/scaling_w_r16.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
