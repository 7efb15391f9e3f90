package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: images/audio/video ride as opaque `binary`
 * columns with typed metadata, and decode / feature-extract / frame-sample
 * run as batched per-partition functions over the binary payloads (the
 * Scala analogue of arrow-batched pandas UDFs).
 *
 * The decode itself is a clearly-marked STUB (no image/audio codecs in
 * this container): it derives deterministic pseudo-features from the raw
 * bytes. Everything around it — binary schema, partitioning, batch
 * iteration, typed output — is the real production plumbing: swap
 * `decodeStub` for a JNI/codec call and nothing else changes.
 *
 * Scale posture: payloads never pass through a shuffle (features are
 * extracted before any wide op); mapPartitions keeps per-batch codec
 * state (here: none) amortized across rows, exactly like a pandas UDF
 * batch. Partition sizing for 100 TB of media = bytes-based
 * (`spark.sql.files.maxPartitionBytes`), not row-based.
 */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, sum_bytes: Long, n_frames: Int, frame_sig: Long)

  /**
   * Synthesize the media table from `documents`: payload = md5(text) bytes
   * (deterministic 16-byte fake "image"), metadata alongside.
   */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text").cast("binary"))).as("payload"),
      struct(lit("fake/rgb8").as("format"), lit(16).as("n_bytes")).as("meta"))

  /**
   * STUB decoder — replace with a real codec. Deterministic features from
   * bytes: width/height from the first two bytes, a byte-sum "brightness",
   * and 4 sampled "frames" (stride-4 bytes) packed into a signature.
   */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long, Int, Long) = {
    def u(i: Int): Int = payload(i) & 0xff
    val width = u(0) + 1
    val height = u(1) + 1
    val sum = payload.map(b => (b & 0xff).toLong).sum
    val stride = math.max(1, payload.length / 4) // 4 frames whatever the length
    val frames = Array(u(0), u(stride), u(2 * stride), u(3 * stride))
    val sig = frames.foldLeft(0L)((acc, b) => (acc << 8) | b)
    (width, height, sum, frames.length, sig)
  }

  /**
   * Resize STUB — binary -> binary stride-`factor` byte downsample (a real
   * implementation would decode, scale, re-encode; the plumbing — batched
   * per-partition transform, payloads never crossing a shuffle — is what
   * carries to 100 TB).
   */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          val out = row.payload.indices.collect {
            case i if i % factor == 0 => row.payload(i)
          }.toArray
          MediaRow(row.doc_id, out)
        }
      }.toDF()
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /**
   * Frame-sample STUB — the explode-shaped media transform (one input
   * payload -> nFrames frame rows), the plumbing shape of video frame
   * extraction. Frames are contiguous stride-sized byte slices; a real
   * implementation would demux/decode at timestamps. Payload bytes fan
   * out only AFTER slicing (each output row carries one frame, never the
   * whole payload), so downstream shuffles move frames, not videos.
   */
  def frameSample(media: DataFrame, nFrames: Int): Dataset[FrameRow] = {
    require(nFrames >= 1, "nFrames must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val stride = math.max(1, row.payload.length / nFrames)
          (0 until nFrames).iterator.map { f =>
            val start = math.min(row.payload.length, f * stride)
            val end = math.min(row.payload.length, start + stride)
            FrameRow(row.doc_id, f,
              java.util.Arrays.copyOfRange(row.payload, start, end))
          }
        }
      }
  }

  case class AudioWindow(doc_id: Long, win_idx: Int, energy: Long)

  /**
   * Windowed audio-energy STUB — the fixed-frame feature-extraction
   * shape of audio processing (RMS/energy per window over PCM): each
   * payload splits into winBytes-sized windows; per window, the energy
   * is the exact integer sum of squared unsigned byte values (a real
   * implementation would decode PCM samples and window with overlap —
   * the batched per-partition iteration and the window fan-out are the
   * production plumbing).
   */
  def audioEnergy(media: DataFrame, winBytes: Int): Dataset[AudioWindow] = {
    require(winBytes >= 1, "winBytes must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          row.payload.grouped(winBytes).zipWithIndex.map { case (w, i) =>
            AudioWindow(row.doc_id, i,
              w.map { b => val u = (b & 0xff).toLong; u * u }.sum)
          }
        }
      }
  }

  /**
   * Synthesize a longer "PCM" payload (32 bytes: two md5 blocks) so the
   * audio stub has multiple windows to fan out.
   */
  def pcmTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(concat(md5(col("text").cast("binary")),
        md5(concat(col("text"), lit("x")).cast("binary")))).as("payload"))

  /** Batched decode / feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        // per-partition codec init would live here (amortized, like a
        // pandas UDF batch); the stub needs none.
        batch.map { row =>
          val (w, ht, s, nf, sig) = decodeStub(row.payload)
          MediaFeatures(row.doc_id, w, ht, s, nf, sig)
        }
      }
  }

  /** End-to-end: documents -> media table -> decoded features. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(Tables.table(spark, dir, "documents"))).toDF()
}
