package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Snapshot-seed canary for the log-checkpoint machinery: prices what a
  * cold reader pays to construct table state after N commits, across
  * the three log shapes a long-lived table moves through —
  *
  *   - RAW: no checkpoint — the replay lists, reads and parses all N
  *     per-version files (the unbounded-stream failure mode checkpoints
  *     exist to remove);
  *   - SINGLE: one `<v>.checkpoint` holding the full visible body —
  *     one file read, parallel entry parse (round 15);
  *   - MULTI: the same body split into size-bounded sidecars (the
  *     Delta V2 analog) — parallel file reads + parallel parse.
  *
  * Fixture: ONE real bloom-carrying commit is made through the writer,
  * then template-replicated into N log entries (txn version, dir and
  * ict substituted per entry) — the seed fold is metadata-only, so the
  * replicated entries exercise exactly what a cold reader parses at a
  * bulk no local Spark loop could build in bench time; this synthesis
  * is a BENCH fixture device, disclosed here, not a protocol path. The
  * checkpoint itself is then written by the real writer (one real
  * append landing on the cadence), and `rowCount()` on a fresh
  * instance — the metadata-only fold, no Spark scan — times the seed.
  * On local NVMe, per-file read syscalls are cheap and the parallel
  * PARSE carries both checkpoint shapes; on an object store the
  * per-file round-trips dominate and the sidecar fan-out (plus the
  * bounded manifest) is the win. Emits one JSON line and persists
  * golden/ckpt_r16.json. */
object CheckpointBench {

  private def copyTree(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val st = Files.walk(src)
    try st.iterator().asScala.toSeq.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING) }
    } finally st.close()
  }

  private def rmTree(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir)) {
      val st = Files.walk(dir)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally st.close()
    }
  }

  /** Median cold-seed seconds over `reps` fresh instances. */
  private def seed(dir: String, reps: Int, spark: SparkSession,
      expectRows: Long): Double = {
    val ts = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      val n = new ExactlyOnceSink(dir).rowCount(spark)
      require(n == expectRows, s"seed fold returned $n rows, want $expectRows")
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(reps / 2)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_CKPT_COMMITS", "20000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CKPT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val calibBefore = Bench.calibrate()
    val (calibMtBefore, mtThreads) = Bench.calibrateMt()

    // one REAL commit (stats + a ~1 KB bloom — a representative entry
    // body), template-replicated to n entries
    val rawDir = Files.createTempDirectory("graft-ckptbench-raw")
    val w = new ExactlyOnceSink(rawDir.toString, checkpointInterval = 0)
    w.commitAppend(
      spark.range(0, 200).toDF("id").withColumn("x", concat(lit("doc-"),
        col("id").cast("string"))).coalesce(1), bloomBy = Seq("x"))
    val logDir = rawDir.resolve("_graft_log")
    val template = Files.readString(logDir.resolve(f"${0L}%020d.json")).trim
    require(template.startsWith("""{"ict":"""), "entry must lead with ict")
    val ictEnd = template.indexOf(',')
    val ict0 = template.substring("""{"ict":""".length, ictEnd).toLong
    val tail0 = template.substring(ictEnd)
    val perCommitRows = 200L
    (1 until n).foreach { v =>
      // per-version fields: monotone ict and the txn version. Every
      // replicated entry deliberately re-points at version 0's data dir
      // and add paths — the metadata-only fold under test never opens
      // data files, so the fixture buys an n-entry log without n data
      // copies (a REAL table would have distinct dirs; nothing timed
      // here reads them)
      val body = s"""{"ict":${ict0 + v}""" + tail0
        .replace(""""txn":{"appId":"graft-sink","version":0}""",
          s""""txn":{"appId":"graft-sink","version":$v}""")
      Files.writeString(logDir.resolve(f"$v%020d.json"), body)
    }
    val total = perCommitRows * n
    val entryBytes = template.length.toLong
    val rawSeed = seed(rawDir.toString, reps, spark, total)

    // SINGLE / MULTI: copy the raw table, land one real append exactly
    // on the checkpoint cadence (timed = the checkpoint WRITE cost),
    // then time the cold seeds the checkpoint unlocks
    def shaped(partBytes: Long): (Double, Double, Int, Path) = {
      val dir = Files.createTempDirectory(s"graft-ckptbench-$partBytes")
      copyTree(rawDir, dir)
      val s = new ExactlyOnceSink(dir.toString, checkpointInterval = n,
        checkpointPartBytes = partBytes)
      val t0 = System.nanoTime()
      s.commitAppend(spark.range(0, 200).toDF("id")
        .withColumn("x", lit("ck")).coalesce(1)) // version n -> checkpoint
      val wSec = (System.nanoTime() - t0) / 1e9
      val parts = {
        val st = Files.list(dir.resolve("_graft_log"))
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.count(_.getFileName.toString.endsWith(".sidecar"))
        } finally st.close()
      }
      (seed(dir.toString, reps, spark, total + 200L), wSec, parts, dir)
    }
    val (singleSeed, singleWrite, p1, d1) = shaped(1L << 30)
    val (multiSeed, multiWrite, pM, dM) = shaped(1L << 20)
    require(p1 == 0 && pM > 4, s"expected shapes single/multi, got $p1/$pM parts")

    val calibAfter = Bench.calibrate()
    val (calibMtAfter, _) = Bench.calibrateMt()
    val contaminated =
      math.max(calibBefore, calibAfter) > Bench.CalibNominalSec * 1.10 ||
        math.max(calibMtBefore, calibMtAfter) > Bench.CalibMtNominalSec * 1.10
    def f3(v: Double): String = f"$v%.3f"
    val line =
      s"""{"metric":"checkpoint_seed_canary","commits":$n,"reps":$reps,""" +
        s""""entry_bytes":$entryBytes,""" +
        s""""raw_seed_s":${f3(rawSeed)},""" +
        s""""single_seed_s":${f3(singleSeed)},""" +
        s""""multi_seed_s":${f3(multiSeed)},""" +
        s""""multi_parts":$pM,""" +
        s""""ckpt_write_single_s":${f3(singleWrite)},""" +
        s""""ckpt_write_multi_s":${f3(multiWrite)},""" +
        s""""calib_before":${f3(calibBefore)},"calib_after":${f3(calibAfter)},""" +
        s""""calib_mt_before":${f3(calibMtBefore)},""" +
        s""""calib_mt_after":${f3(calibMtAfter)},"calib_mt_threads":$mtThreads,""" +
        s""""calib_mt_nominal":${f3(Bench.CalibMtNominalSec)},""" +
        s""""calib_nominal":${f3(Bench.CalibNominalSec)},""" +
        s""""contaminated":$contaminated}"""
    Seq(rawDir, d1, dM).foreach(rmTree)
    Files.createDirectories(Paths.get("golden"))
    Files.writeString(Paths.get("golden/ckpt_r16.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
