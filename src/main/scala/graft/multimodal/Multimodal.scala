package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver north-star): media as opaque
  * `binary` payloads with typed metadata, decoded / feature-extracted in
  * batches via mapPartitions.
  *
  * The decode step is a STUB — this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake dimensions from the payload
  * bytes. The Spark-side plumbing is real: schema, per-partition batch
  * iteration (one decoder instance per partition, the same shape a
  * JNI/FFmpeg/PIL binding needs), and partition-count control so decoder
  * parallelism is explicit.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    channels: Int, format: String)

  /** Attach an opaque binary payload column (here: the utf-8 bytes of the
    * document text standing in for an image blob). */
  def attachPayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("payload"))

  /** Frame sampling for video-shaped payloads: derive a stub frame count
    * from the payload, keep every `everyK`-th frame index, and compute a
    * per-frame stub feature. A real pipeline swaps the frame-count and
    * feature stubs for codec calls; the plumbing — binary column →
    * per-frame explode → per-frame features, all before any shuffle —
    * is the real shape (the explode is a narrow map, so frame fan-out
    * never re-partitions the payloads). */
  def sampleFrames(payloads: DataFrame, everyK: Int,
      idCol: String = "doc_id"): DataFrame = {
    val nBytes = length(col("payload"))
    payloads
      .withColumn("n_frames", (nBytes % 7 + 1).cast("int"))
      .select(col(idCol), col("n_frames"), nBytes.as("n_bytes"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
      .withColumn("feature",
        (col("n_bytes") * (col("frame_idx") + 3) % 1000).cast("double") / 1000.0)
  }

  /** STUB decoder: deterministic pseudo-metadata from payload bytes.
    * A real implementation swaps the body for an actual codec call; the
    * signature, batching, and output schema stay identical. */
  def decodeStub(payloads: DataFrame, idCol: String = "doc_id"): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (load codec once)
        it.map { case (id, bytes) =>
          val n = bytes.length
          MediaMeta(id, n,
            width = 64 + n % 512,
            height = 64 + (n * 7) % 512,
            channels = 3,
            format = if (n % 2 == 0) "png" else "jpeg")
        }
      }
  }
}
