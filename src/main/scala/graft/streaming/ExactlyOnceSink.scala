package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Exactly-once, Delta-protocol-style table sink (SURVEY.md §7.3).
  *
  * The delta-spark jar is absent offline, so the Delta commit protocol's
  * essential guarantee — data files and the consumer's progress cursor
  * commit in ONE atomic action (Delta's `add` + `txn{appId, version}`
  * log entry) — is reproduced on public APIs:
  *
  *   table/
  *     data/batch=<id>/part-*.parquet   (written to a staging dir first)
  *     _graft_log/<%020d batchId>.json  (atomic rename = the commit point)
  *
  * A batch is visible iff its log entry exists. `process` is idempotent
  * on batchId — a replayed micro-batch (crash between write and commit,
  * Spark retries from the checkpoint WAL) sees the committed version and
  * no-ops, which is exactly-once delivery end-to-end. Readers list the
  * log, not the data dir, so half-written staging data is never visible.
  *
  * Single-writer (the deltasink scenario: one ingestion daemon per
  * table); the atomic-rename commit generalizes to Delta's
  * optimistic-concurrency loop if multiple writers are ever needed.
  */
class ExactlyOnceSink(tableDir: String, appId: String = "graft-sink") {
  private val logDir = Paths.get(tableDir, "_graft_log")
  private val dataDir = Paths.get(tableDir, "data")

  private def logFile(batchId: Long): Path =
    logDir.resolve(f"$batchId%020d.json")

  def committedVersions(): Seq[Long] = {
    if (!Files.isDirectory(logDir)) return Seq.empty
    Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  def isCommitted(batchId: Long): Boolean = Files.exists(logFile(batchId))

  /** foreachBatch body: write-then-commit, idempotent on batchId.
    * `partitionBy` columns produce hive-style subdirectories inside the
    * batch dir (the Delta partitioned-table layout); the commit entry
    * records them in the `metaData` action alongside the schema. */
  def process(df: DataFrame, batchId: Long, partitionBy: Seq[String] = Nil): Unit =
    process(df, batchId, partitionBy, snapshot = false)

  private def process(df: DataFrame, batchId: Long, partitionBy: Seq[String],
      snapshot: Boolean): Unit = {
    if (isCommitted(batchId)) return // replay after crash → no-op
    Files.createDirectories(logDir)
    Files.createDirectories(dataDir)

    // 1. stage data files (invisible to readers — they go through the log)
    val staging = Paths.get(tableDir, s".staging-$batchId")
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(staging.toString)
    val adds = Files.walk(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      .map(p => staging.relativize(p)).sortBy(_.toString)

    // 2. move into place under the batch's own directory
    val target = dataDir.resolve(s"batch=$batchId")
    if (Files.exists(target)) { // leftover from a crashed attempt
      Files.walk(target).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Files.createDirectories(target)
    val moved = adds.map { rel =>
      val dst = target.resolve(rel)
      Files.createDirectories(dst.getParent)
      Files.move(staging.resolve(rel), dst, StandardCopyOption.ATOMIC_MOVE)
      rel
    }
    Files.walk(staging).iterator().asScala.toSeq.reverse.foreach(Files.delete)

    // 3. THE commit: one atomic rename publishing add-actions + txn
    //    cursor + table metadata (schema JSON is itself JSON — inlined)
    val parts = partitionBy.map("\"" + _ + "\"").mkString(",")
    val op = if (snapshot) "SNAPSHOT" else "STREAMING UPDATE"
    val entry =
      s"""{"txn":{"appId":"$appId","version":$batchId},""" +
        s""""snapshot":$snapshot,""" +
        s""""metaData":{"schemaString":${df.schema.json},""" +
        s""""partitionColumns":[$parts]},""" +
        s""""add":[${moved.map(p => "\"" + p.toString.replace("\\", "/") + "\"").mkString(",")}],""" +
        s""""commitInfo":{"operation":"$op","batchId":$batchId}}"""
    val tmp = logDir.resolve(s".${batchId}.json.tmp")
    Files.writeString(tmp, entry)
    Files.move(tmp, logFile(batchId), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read the committed table state (only data referenced by the log);
    * `versionAsOf` time-travels to the state after that batch committed.
    * `batch` surfaces as a partition column (basePath discovery) — the
    * version cursor is queryable like any Delta partition.
    * `mergeSchema` = Delta-style schema evolution on read: batches
    * written with widened schemas union into one (missing columns null),
    * per the schemaString each commit's metaData action records. */
  def read(spark: org.apache.spark.sql.SparkSession,
      versionAsOf: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val all = committedVersions()
      .filter(v => versionAsOf.forall(v <= _))
    // A snapshot commit REPLACES everything before it (Delta's
    // copy-on-write rewrite, narrowed to a full-table snapshot): the
    // live state is the last snapshot plus appends after it.
    val fromSnapshot = all.filter(isSnapshot).lastOption
      .map(sv => all.filter(_ >= sv)).getOrElse(all)
    val dirs = fromSnapshot.map(v => dataDir.resolve(s"batch=$v").toString)
    if (dirs.isEmpty)
      spark.emptyDataFrame
    else
      spark.read
        .option("basePath", dataDir.toString)
        .option("mergeSchema", mergeSchema.toString)
        .parquet(dirs: _*)
  }

  private def isSnapshot(v: Long): Boolean =
    Files.readString(logFile(v)).contains("\"snapshot\":true")

  private def nextVersion(): Long =
    committedVersions().lastOption.map(_ + 1).getOrElse(0L)

  /** Live state without the `batch` version-cursor partition column
    * (which read() surfaces via basePath discovery). */
  private def liveData(spark: org.apache.spark.sql.SparkSession): DataFrame =
    read(spark).drop("batch")

  /** MERGE (upsert): rows of `updates` replace committed rows sharing
    * the same key; non-matching update rows insert. Implemented as a
    * full-state rewrite committed as one snapshot version — Delta's
    * copy-on-write merge narrowed to the single-writer/full-rewrite
    * case. Time travel still sees every prior version. */
  def merge(spark: org.apache.spark.sql.SparkSession,
      updates: DataFrame, keys: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val current = liveData(spark)
    val merged =
      if (current.isEmpty) updates
      else current.join(updates.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(updates)
    val v = nextVersion()
    process(merged, v, Nil, snapshot = true)
    v
  }

  /** DELETE rows matching the predicate; snapshot-commit the remainder. */
  def delete(spark: org.apache.spark.sql.SparkSession,
      predicate: org.apache.spark.sql.Column): Long = {
    val remaining = liveData(spark).filter(!predicate)
    val v = nextVersion()
    process(remaining, v, Nil, snapshot = true)
    v
  }

  /** Compact the live state (many small append batches → one snapshot);
    * semantically a no-op, physically the Delta OPTIMIZE analog. */
  def compact(spark: org.apache.spark.sql.SparkSession): Long = {
    val v = nextVersion()
    process(liveData(spark), v, Nil, snapshot = true)
    v
  }

  /** Table schema as recorded by the latest commit's metaData action. */
  def latestSchema(): Option[org.apache.spark.sql.types.StructType] =
    committedVersions().lastOption.map { v =>
      val raw = Files.readString(logFile(v))
      val marker = "\"schemaString\":"
      val from = raw.indexOf(marker) + marker.length
      // schemaString is a nested JSON object ending before ,"partitionColumns"
      val to = raw.indexOf(",\"partitionColumns\"", from)
      org.apache.spark.sql.types.DataType.fromJson(raw.substring(from, to))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
}
