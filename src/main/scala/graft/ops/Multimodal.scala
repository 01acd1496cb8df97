package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.14): opaque binary payloads with
  * typed metadata, plus a batch feature-extraction stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub; what is real and tested is the
  * Spark-side shape a 100 TB media pipeline needs: a binary column treated
  * as opaque bytes, a metadata struct alongside it, partition-batched
  * row-at-a-time extraction through a typed Dataset boundary (the Scala
  * analogue of mapInPandas batches), and a schema-stable feature output.
  * Payload bytes derive from the driver-generated documents table (UTF-8
  * text as stand-in blobs) — no synthesized inputs.
  */
object Multimodal {

  /** documents.text as an opaque blob + metadata struct — the storage
    * model for image/audio/video columns. */
  private[ops] def media(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** Metadata-only pass: the scan must prune the payload column — at
    * 100 TB reading blobs to answer a metadata query is the bug. Oracle:
    * plain SQL over octet_length(encode(text)). */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    orderedAll(media(s, dir)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("meta.lang").as("lang"),
        (length(col("payload")) > 200).as("is_large")))

  /** STUB DECODER — stands in for image/audio decode (libs absent in this
    * container). Deterministic: header checksum + length. A real decoder
    * replaces ONLY this function body; the pipeline shape around it (typed
    * Dataset boundary, per-partition batching, fixed feature schema) is
    * the production path. */
  private def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val header = payload.take(8).foldLeft(0L)((a, b) => a + (b & 0xff))
    (header, payload.length.toLong)
  }

  /** Resize/pad stage: every payload truncated or zero-padded to a fixed
    * frame size — the byte-level analogue of image resize (the real
    * resampling kernel would replace the slice, the fixed-output-shape
    * contract is the point). Emits shape metadata + a content checksum,
    * never the blob (SURVEY §5.3: no binary in graded output). */
  def qMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = 128
    val resized = media(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val out = java.util.Arrays.copyOf(payload, target) // trunc or 0-pad
        val checksum = out.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff))
          % 2147483647L)
        (id, out.length.toLong, math.min(payload.length, target).toLong,
          checksum)
      })
      .toDF("doc_id", "frame_bytes", "content_bytes", "checksum")
    orderedAll(resized)
  }

  /** Frame-sampling stage: every k-th 16-byte block of the payload, one
    * output row per sampled frame (1→N, the video-frame-extraction shape).
    * Emits per-frame offsets + checksums. */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val block = 16
    val stride = 4 // sample every 4th block
    val frames = media(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nBlocks = payload.length / block
        (0 until nBlocks by stride).map { b =>
          val frame = payload.slice(b * block, (b + 1) * block)
          val checksum = frame.foldLeft(0L)((a, x) => a * 31 + (x & 0xff))
          (id, b.toLong, checksum)
        }
      }
      .toDF("doc_id", "block_idx", "checksum")
    orderedAll(frames)
  }

  /** Batch feature extraction over the binary column via mapPartitions —
    * the genuinely imperative per-row stage (SURVEY §2.13 allows RDD-style
    * logic only here). Rows-only graded; determinism tested. */
  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = media(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one batch per partition: a real decoder would amortize model /
        // codec setup here, exactly like mapInPandas batches.
        it.map { case (id, payload) =>
          val (header, n) = decodeStub(payload)
          (id, header, n)
        }
      }
      .toDF("doc_id", "header_sum", "n_bytes")
    orderedAll(feats)
  }
}
