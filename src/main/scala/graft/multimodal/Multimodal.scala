package graft.multimodal

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver north-star): media as opaque
  * `binary` payloads with typed metadata, decoded / feature-extracted in
  * per-partition batches via `mapPartitions` (the Scala analog of
  * `mapInPandas` for a codec UDF: one decoder instance per partition,
  * batch iteration, typed output schema).
  *
  * The decode step is REAL byte-level parsing — no codec libraries exist
  * in this container, so the payloads are minimal spec-conformant PNG /
  * JPEG containers built by [[attachPayload]] around the document text
  * bytes (standing in for pixel data), and [[decode]] genuinely parses
  * them back: magic-number sniffing, PNG IHDR field extraction with a
  * verified CRC-32, JPEG marker-segment scanning to SOF0, and a
  * byte-histogram fingerprint computed over the pixel-data region. A
  * production pipeline swaps the container builder for real files and
  * the feature math for a perceptual hash; every structural piece — the
  * binary column, the header-offset bookkeeping, the per-partition
  * decoder loop, the narrow frame explode — is exercised on content
  * here. If the parser misread an offset or an endianness, the m-family
  * oracles (which recompute the same fields arithmetically in DuckDB)
  * would hash-mismatch.
  */
object Multimodal {

  /** Decoded media metadata. `n_bytes` counts the PIXEL-DATA region
    * (payload minus container header); `fingerprint` is a
    * byte-histogram fingerprint of that region: Σ (b+1)³ mod 1e9+7 over
    * its bytes — position-independent, so equal histograms ⇒ equal
    * fingerprints (the content-identity signal m-near-dup style ops
    * key on). */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    channels: Int, format: String, fingerprint: Long)

  /** One sampled frame: the pixel data split into `n_frames` contiguous
    * chunks; `feature` ∈ [0,1) and `fp` are both derived from the
    * chunk's byte sum (feature = visualization-scaled, fp = the
    * near-dup fingerprint space). */
  case class Frame(doc_id: Long, n_frames: Int, n_bytes: Int,
    frame_idx: Int, feature: Double, fp: Long)

  private val FpMod = 1000000007L

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be32At(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def be16At(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Minimal spec-conformant PNG: 8-byte signature, IHDR chunk
    * (length, type, width/height as big-endian int32, bit depth 8,
    * color type 2 = truecolor, real CRC-32 over type+data), then the
    * pixel payload appended raw (standing in for IDAT). */
  private[multimodal] def pngContainer(w: Int, h: Int,
      pixels: Array[Byte]): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    val crc = new CRC32()
    crc.update(typeAndData)
    sig ++ be32(13) ++ typeAndData ++ be32(crc.getValue.toInt) ++ pixels
  }

  /** Minimal JPEG: SOI, APP0/JFIF, SOF0 with height/width as big-endian
    * int16 and 3 components, then the pixel payload appended raw. */
  private[multimodal] def jpegContainer(w: Int, h: Int,
      pixels: Array[Byte]): Array[Byte] = {
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    soi ++ app0 ++ sof0 ++ pixels
  }

  /** Sniff + parse a container header.
    * Returns (format, width, height, channels, pixelDataOffset), or None
    * for bytes that are neither a valid PNG (bad magic, non-IHDR first
    * chunk, or CRC mismatch) nor a JPEG with a findable SOF marker. */
  private[multimodal] def parseHeader(
      bytes: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    if (bytes.length >= 33 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
      if (be32At(bytes, 8) != 13 ||
          new String(bytes, 12, 4, "US-ASCII") != "IHDR") None
      else {
        val crc = new CRC32()
        crc.update(bytes, 12, 17)
        if (crc.getValue.toInt != be32At(bytes, 29)) None
        else {
          val channels = bytes(25) match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 3
          }
          Some(("png", be32At(bytes, 16), be32At(bytes, 20), channels, 33))
        }
      }
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
      // Walk marker segments until a start-of-frame (SOF0–SOF3).
      // Real-world JPEGs pad with 0xFF fill bytes before a marker, and
      // TEM (0x01) / RST0–7 (0xD0–0xD7) are standalone markers with NO
      // length field — treating them as length-carrying would read a
      // garbage offset and scan past the frame header.
      var o = 2
      while (o + 2 <= bytes.length && (bytes(o) & 0xff) == 0xff) {
        var m = o + 1
        while (m < bytes.length && (bytes(m) & 0xff) == 0xff) m += 1 // fill bytes
        if (m >= bytes.length) return None
        val marker = bytes(m) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          o = m + 1 // standalone marker: no segment length
        } else if (marker == 0xd9) {
          return None // EOI before any SOF
        } else {
          if (m + 3 > bytes.length) return None
          val len = be16At(bytes, m + 1)
          if (marker >= 0xc0 && marker <= 0xc3) {
            if (m + 1 + len > bytes.length || len < 9) return None
            return Some(("jpeg", be16At(bytes, m + 6), be16At(bytes, m + 4),
              bytes(m + 8) & 0xff, m + 1 + len))
          }
          o = m + 1 + len
        }
      }
      None
    } else None
  }

  private[multimodal] def fingerprintOf(bytes: Array[Byte], from: Int): Long = {
    var acc = 0L
    var i = from
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff) + 1L
      acc = (acc + v * v * v) % FpMod
      i += 1
    }
    acc
  }

  /** Build the opaque binary payload column: the document text bytes
    * (standing in for pixel data) wrapped in a REAL container — PNG for
    * even pixel-byte counts, JPEG for odd — whose header fields encode
    * content-derived dimensions. The encode is harness-side (a real
    * pipeline reads media files as-is); [[decode]] must parse these
    * bytes back to recover anything. */
  def attachPayload(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // Null text must not kill the scan (same contract as decode's
          // corrupt-blob path): encode it as an empty pixel region.
          val px = Option(text).getOrElse("").getBytes("UTF-8")
          val n = px.length
          val w = 64 + n % 512
          val h = 64 + (n * 7) % 512
          (id, if (n % 2 == 0) pngContainer(w, h, px)
               else jpegContainer(w, h, px))
        }
      }
      .toDF(idCol, "payload")
  }

  /** Decode payloads to typed metadata by PARSING the container bytes:
    * magic sniff → header field extraction (PNG IHDR with CRC check /
    * JPEG marker scan to SOF) → byte-histogram fingerprint over the
    * pixel-data region. Unparseable payloads degrade to format "raw"
    * with zero dimensions and a whole-payload fingerprint rather than
    * failing the batch — one corrupt blob must not kill a 100 TB scan. */
  def decode(payloads: DataFrame, idCol: String = "doc_id"): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (load codec once)
        it.map { case (id, bytes) =>
          parseHeader(bytes) match {
            case Some((fmt, w, h, ch, off)) =>
              MediaMeta(id, bytes.length - off, w, h, ch, fmt,
                fingerprintOf(bytes, off))
            case None =>
              MediaMeta(id, bytes.length, 0, 0, 0, "raw",
                fingerprintOf(bytes, 0))
          }
        }
      }
  }

  /** Frame sampling for video-shaped payloads: parse the container,
    * split the pixel-data region into `n_frames` contiguous chunks
    * (n_frames content-derived; a real pipeline reads it from the
    * container), keep every `everyK`-th frame, and compute each kept
    * frame's feature/fingerprint from its ACTUAL bytes (chunk byte
    * sum). The whole pass is a narrow `mapPartitions` — frame fan-out
    * never re-partitions the payloads, and the heavy bytes are gone
    * after this projection (only doc_id + per-frame scalars flow on). */
  def sampleFrames(payloads: DataFrame, everyK: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(everyK > 0, s"frame sampling needs everyK > 0, got $everyK")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val off = parseHeader(bytes).map(_._5).getOrElse(0)
          val n = bytes.length - off
          val nFrames = n % 7 + 1
          val csz = (n + nFrames - 1) / nFrames
          (0 until nFrames by everyK).iterator.flatMap { i =>
            val start = i * csz
            if (start >= n) None
            else {
              val end = math.min(start + csz, n)
              var s = 0L
              var j = off + start
              while (j < off + end) { s += bytes(j) & 0xff; j += 1 }
              Some(Frame(id, nFrames, n, i, (s % 1000).toDouble / 1000.0,
                s % 100003))
            }
          }
        }
      }
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }
}
