package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder north star): image/audio/video as
  * opaque binary columns + typed metadata, with decode / feature-extract
  * running batch-wise inside partitions.
  *
  * The container has no codec libraries, so `decodeStub` is a
  * deterministic fake standing in for the real decoder (???-equivalent,
  * clearly marked); everything around it — the typed schema, the
  * mapPartitions batch shape, partition-local iteration with no
  * driver collect — is the real 100 TB plumbing: swap `decodeStub` for a
  * JNI/FFmpeg call and nothing else changes.
  */
object MediaPipeline {

  case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, byte_mean: Double)

  /** STUB decoder — deterministic fake. A real build replaces only this
    * function with the codec call; the signature (bytes in, features
    * out) is the contract. */
  def decodeStub(mime: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = n % 640
    val height = (n * 7) % 480
    val frames = if (mime.startsWith("video")) 1 + n % 30 else 1
    (width, height, frames)
  }

  /** Assemble the media dataset from the documents fixture (text bytes
    * stand in for encoded media). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Partition-parallel decode + feature extraction. Executors stream
    * row batches through the decoder — no collect, state, or shuffle;
    * scales linearly with partitions. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = decodeStub(r.mime, r.media)
        val mean =
          if (r.media.isEmpty) 0.0
          else r.media.map(b => (b & 0xff).toDouble).sum / r.media.length
        MediaFeatures(r.doc_id, r.mime, r.media.length, w, h, f,
          math.floor(mean * 100 + 0.5) / 100)
      }
    }
  }

  /** End-to-end: table → features frame (used by MultimodalSpec). */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF().orderBy("doc_id")

  case class ResizedMedia(doc_id: Long, mime: String,
      width: Int, height: Int, media: Array[Byte])

  /** Resize stage (stub): rescale decoded dimensions to fit maxDim,
    * preserving aspect ratio; bytes pass through (a real build re-encodes
    * here). Same mapPartitions batch shape as extractFeatures — no
    * shuffle, no driver collect. */
  def resize(rows: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (w, h, _) = decodeStub(r.mime, r.media)
        val longest = math.max(math.max(w, h), 1)
        val scale = if (longest <= maxDim) 1.0 else maxDim.toDouble / longest
        ResizedMedia(r.doc_id, r.mime,
          math.max(1, math.floor(w * scale).toInt),
          math.max(1, math.floor(h * scale).toInt), r.media)
      }
    }
  }

  case class SampledFrame(doc_id: Long, frame_idx: Int)

  /** Frame-sampling stage (stub decode): one output row per sampled
    * frame index (every `stride`-th frame of each video). This is the
    * fan-out shape of a real frame-extraction pipeline — a generator on
    * the decode result, exploding inside the partition so frames of one
    * video never cross executors. */
  def sampleFrames(rows: Dataset[MediaRow], stride: Int): Dataset[SampledFrame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.filter(_.mime.startsWith("video")).flatMap { r =>
        val (_, _, frames) = decodeStub(r.mime, r.media)
        (0 until frames by stride).iterator.map(SampledFrame(r.doc_id, _))
      }
    }
  }
}
