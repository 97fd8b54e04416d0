package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Emulated Kafka source (SURVEY.md §7.3).
  *
  * The reference's category is a Kafka→Delta ingestion daemon
  * (reference README.md:2 "Stream DeltaLake tables from Kafka"); the
  * spark-sql-kafka connector jar is absent from the offline image, so the
  * *semantics* a Kafka source provides — an ordered, partitioned,
  * replayable log with (topic, partition, offset, timestamp, key, value)
  * records — are reproduced on the public file-stream source: JSON-lines
  * files carrying the Kafka envelope, consumed with maxFilesPerTrigger
  * for ordered incremental delivery. Offsets are per-partition positions,
  * exactly as a broker would hand out.
  *
  * At scale this maps 1:1 onto the real connector: swap
  * `readStream.schema(envelope).json(dir)` for
  * `readStream.format("kafka")` and the downstream plan is unchanged.
  */
object KafkaEnvelope {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** Payload schema carried in `value` (JSON) — the events record. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType), // event time, µs since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Produce envelope JSON-lines files from the events fixture: the
    * "topic". Partition = user_id % nPartitions, offset = position within
    * partition in event-time order — a faithful per-partition-ordered log. */
  def writeTopic(spark: SparkSession, sfDir: String, outDir: String,
      nPartitions: Int = 4): Unit =
    writeTopicFrom(graft.Tables(spark, sfDir, "events"), outDir, nPartitions)

  /** DataFrame-input form (IngestBench scales the fixture before
    * producing). `chunksPerPartition` splits each partition's log into
    * that many OFFSET-CONTIGUOUS files — the file-stream analog of a
    * broker handing out bounded fetches, giving `maxFilesPerTrigger`
    * real micro-batch granularity to work with. Chunks are contiguous
    * (offset div chunkSize, never a modulo stripe) and the writer
    * range-partitions on (chunk, partition) so part-file NAMES sort
    * CHUNK-major. Spark's FileStreamSource orders candidate files by
    * MODIFICATION TIME (name only breaks ms-level ties), and concurrent
    * write tasks finish in arbitrary order — so after the write we stamp
    * each part file's mtime monotonically in name order, making the
    * mtime sort and the chunk-major name sort agree deterministically.
    * A chunked topic then replays each partition's offsets in order
    * across micro-batches (chunk k of a partition always lands in an
    * earlier-or-equal batch than chunk k+1), which is the Kafka
    * per-partition-ordering contract this source emulates. Chunk-major
    * (not
    * partition-major) so each micro-batch spans ALL partitions — a
    * broker fetch returns a slice of every subscribed partition, and a
    * partition-major layout would serialize the partitions through the
    * trigger, idling the executor cores. */
  def writeTopicFrom(ev: org.apache.spark.sql.DataFrame, outDir: String,
      nPartitions: Int = 4, chunksPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("partition").orderBy("ts", "event_id")
    val base = ev
      .withColumn("partition", (col("user_id") % nPartitions).cast("int"))
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .select(
        lit("events").as("topic"),
        col("partition"), col("offset"),
        col("ts").as("timestamp"),
        col("user_id").cast("string").as("key"),
        to_json(struct(
          col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))).as("value"))
    writeEnvelope(base, outDir, nPartitions, chunksPerPartition)
  }

  /** Documents-payload producer (the curation-pipeline ingest subject):
    * same envelope/chunking contract as [[writeTopicFrom]], partitioned
    * by doc_id, offsets in doc_id order. The synthetic timestamp is
    * deterministic (µs = doc_id) — envelope completeness, not event
    * time, is what the doc pipeline consumes. */
  def writeDocTopicFrom(docs: org.apache.spark.sql.DataFrame, outDir: String,
      nPartitions: Int = 4, chunksPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("partition").orderBy("doc_id")
    val base = docs
      .withColumn("partition", (col("doc_id") % nPartitions).cast("int"))
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .select(
        lit("documents").as("topic"),
        col("partition"), col("offset"),
        timestamp_micros(col("doc_id")).as("timestamp"),
        col("doc_id").cast("string").as("key"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"))).as("value"))
    writeEnvelope(base, outDir, nPartitions, chunksPerPartition)
  }

  private def writeEnvelope(base: org.apache.spark.sql.DataFrame,
      outDir: String, nPartitions: Int, chunksPerPartition: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val partLen = Window.partitionBy("partition")
    base
      .withColumn("chunk", (col("offset") /
        ceil(count(lit(1)).over(partLen) / lit(chunksPerPartition)))
        .cast("int"))
      .repartitionByRange(nPartitions * chunksPerPartition,
        col("chunk"), col("partition"))
      .sortWithinPartitions("partition", "offset")
      .drop("chunk")
      .write.mode("overwrite").json(outDir)
    // FileStreamSource consumes in mtime order; make that order match the
    // chunk-major name order regardless of task finish order.
    val parts = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
    val mtimeBase =
      if (parts.isEmpty) 0L else parts.map(_.lastModified()).max
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(
          mtimeBase - 1000L * (parts.length - i)))
    }
  }

  /** Incremental, replayable read of the emulated topic. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Documents-payload schema carried in `value` for doc topics. */
  val docPayloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Deserialize stage for document topics ([[writeDocTopicFrom]]). */
  def decodeDocs(envelope: DataFrame): DataFrame =
    envelope
      .withColumn("payload", from_json(col("value"), docPayloadSchema))
      .select(col("partition"), col("offset"),
        col("payload.doc_id").as("doc_id"),
        col("payload.text").as("text"),
        col("payload.lang").as("lang"),
        col("payload.source").as("source"))

  /** Deserialize stage (SURVEY §3.1 step 2): bytes→typed rows against the
    * declared payload schema; malformed values null out and are split to
    * a dead-letter branch by the caller via `isnull(payload)`. */
  def decode(envelope: DataFrame): DataFrame =
    envelope
      .withColumn("payload", from_json(col("value"), payloadSchema))
      .select(col("topic"), col("partition"), col("offset"),
        col("key"), col("value"),
        col("payload.event_id").as("event_id"),
        timestamp_micros(col("payload.ts_us")).as("ts"),
        col("payload.user_id").as("user_id"),
        col("payload.event_type").as("event_type"),
        col("payload.value").as("event_value"))
}
