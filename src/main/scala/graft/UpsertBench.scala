package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Streaming-upsert throughput: the SAME keyed update stream applied
  * through the sink's two MERGE protocols —
  *
  *   - copy-on-write (`mergeBatch`): every micro-batch snapshot-rewrites
  *     the whole live table; per-batch cost grows with table size;
  *   - merge-on-read (`mergeBatch(mor = true)`, deletion vectors): each
  *     micro-batch tombstones the matched rows in place and appends the
  *     updates; per-batch cost tracks matched files + batch size.
  *
  * The declared-query bench measures the analytics surface and
  * IngestBench the append-ingest surface; this main measures the UPSERT
  * surface — the verb a CDC-consuming "stream DeltaLake tables from
  * Kafka" daemon (reference README.md:2) actually lives on — and prints
  * one JSON line with both modes' per-batch seconds so the
  * merge-on-read scaling claim is measured, not argued. UpsertBenchSpec
  * cross-validates the two protocols row-for-row at a small config. */
object UpsertBench {

  case class UpsertResult(baseRows: Long, perBatchSec: Seq[Double],
      totalSec: Double, checksum: Double)

  /** Build a base table (`scale` appended fixture copies, disjoint id
    * ranges), then apply `batches` micro-batches of `updatesPerBatch`
    * keyed updates each, timed per batch. The update stream is
    * deterministic and IDENTICAL across modes, so results are
    * comparable and the final states must agree. */
  def run(spark: SparkSession, sfDir: String, scale: Int, batches: Int,
      updatesPerBatch: Int, mor: Boolean, tableDir: String): UpsertResult = {
    val ev0 = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val maxId = ev0.agg(max("event_id")).head().getLong(0) + 1
    val sink = new ExactlyOnceSink(tableDir,
      appId = s"graft-upsert-${if (mor) "mor" else "cow"}")
    (0 until scale).foreach { k =>
      sink.commitAppend(ev0.withColumn("event_id", col("event_id") + k * maxId))
    }
    val baseRows = ev0.count() * scale

    // deterministic per-batch updates against copy-0 keys: every batch
    // touches a different residue class, so batches never collide and
    // each is verifiable (event_value = 1e6 + batch)
    val evCount = baseRows / scale
    val p = math.max(2L, evCount / updatesPerBatch)
    val updates = (0 until batches).map { b =>
      ev0.filter(pmod(col("event_id"), lit(p)) === lit(b.toLong))
        .limit(updatesPerBatch)
        .withColumn("value", lit(1e6 + b))
        .cache()
    }
    updates.foreach(_.count()) // materialize outside the timed region

    val perBatch = (0 until batches).map { b =>
      val t0 = System.nanoTime()
      sink.mergeBatch(spark, updates(b), Seq("event_id"), batchId = b,
        mor = mor)
      (System.nanoTime() - t0) / 1e9
    }
    updates.foreach(_.unpersist(blocking = false))

    val fin = sink.read(spark)
      .agg(count(lit(1)), sum(col("value"))).head()
    require(fin.getLong(0) == baseRows,
      s"upsert changed row count: ${fin.getLong(0)} != $baseRows")
    UpsertResult(baseRows, perBatch, perBatch.sum, fin.getDouble(1))
  }

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(dir)
    if (Files.exists(path))
      locally { val st = Files.walk(path)
            try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
            finally st.close() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_UPSERT_SCALE", "10").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_UPSERT_BATCHES", "8").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_UPSERT_K", "1000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = Seq(false, true).map { mor =>
      val dir = Files.createTempDirectory(
        s"graft-upsert-${if (mor) "mor" else "cow"}").toString
      try mor -> run(spark, sfDir, scale, batches, k, mor, dir)
      finally rmTree(dir)
    }.toMap
    val cow = results(false)
    val morR = results(true)
    require(cow.checksum == morR.checksum && cow.baseRows == morR.baseRows,
      s"protocols diverged: cow=(${cow.baseRows},${cow.checksum}) " +
        s"mor=(${morR.baseRows},${morR.checksum})")
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(
      f"""{"metric":"upsert_bench","base_rows":${cow.baseRows},"updates_per_batch":$k,"batches":$batches,"cow_total_s":${cow.totalSec}%.2f,"mor_total_s":${morR.totalSec}%.2f,"speedup":${cow.totalSec / morR.totalSec}%.2f,"cow_per_batch_s":${fmt(cow.perBatchSec)},"mor_per_batch_s":${fmt(morR.perBatchSec)},"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
