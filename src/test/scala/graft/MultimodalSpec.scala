package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Byte-level contract of the multimodal decode path: the containers
  * attachPayload builds are format-conformant enough that a real parser
  * (ours) must do real work — magic sniff, field offsets, endianness,
  * CRC — to recover the metadata, and corrupting any of those degrades
  * to the "raw" fallback instead of crashing or mis-reporting. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def payloadFor(text: String): Array[Byte] = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    Multimodal.attachPayload(docs).select("payload").as[Array[Byte]].head()
  }

  private def fpOf(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L) { (acc, b) =>
      val v = (b & 0xff) + 1L
      (acc + v * v * v) % 1000000007L
    }

  test("png round-trip: magic, IHDR dimensions, CRC, pixel fingerprint") {
    val text = "abcdef" // 6 bytes, even -> png
    val p = payloadFor(text)
    assert((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
    val got = Multimodal.decode(Seq((1L, p)).toDF("doc_id", "payload")).head()
    assert(got.format == "png")
    assert(got.width == 64 + 6 && got.height == 64 + 42)
    assert(got.channels == 3 && got.n_bytes == 6)
    assert(got.fingerprint == fpOf(text.getBytes("UTF-8")))
  }

  test("jpeg round-trip: SOF scan past APP0, BE16 dimensions") {
    val text = "abcde" // 5 bytes, odd -> jpeg
    val p = payloadFor(text)
    assert((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
    val got = Multimodal.decode(Seq((2L, p)).toDF("doc_id", "payload")).head()
    assert(got.format == "jpeg")
    assert(got.width == 64 + 5 && got.height == 64 + 35)
    assert(got.channels == 3 && got.n_bytes == 5)
    assert(got.fingerprint == fpOf(text.getBytes("UTF-8")))
  }

  test("wide dimensions survive the BE32/BE16 paths") {
    // 500-byte text: w = 64 + 500 = 564, h = 64 + 3500%512 = 492.
    val text = "x" * 500
    val got = Multimodal.decode(
      Seq((3L, payloadFor(text))).toDF("doc_id", "payload")).head()
    assert(got.width == 564 && got.height == 492 && got.format == "png")
  }

  test("corrupt CRC and garbage bytes degrade to raw, not a crash") {
    val good = payloadFor("abcdef")
    val badCrc = good.clone()
    badCrc(30) = (badCrc(30) ^ 0x5a).toByte // inside the stored IHDR CRC
    val garbage = Array.tabulate[Byte](40)(i => (i * 37).toByte)
    val got = Multimodal.decode(
        Seq((1L, badCrc), (2L, garbage)).toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).format == "raw" && got(1L).width == 0)
    assert(got(1L).fingerprint == fpOf(badCrc)) // whole-payload fp
    assert(got(2L).format == "raw" && got(2L).n_bytes == 40)
  }

  test("sampleFrames chunks the pixel region by actual byte content") {
    val text = "abcdefgh" // 8 bytes -> n_frames = 8%7+1 = 2, csz = 4
    val frames = Multimodal.sampleFrames(
        Seq((7L, payloadFor(text))).toDF("doc_id", "payload"), 1)
      .orderBy("frame_idx")
      .select("frame_idx", "n_frames", "feature", "fp")
      .as[(Int, Int, Double, Long)].collect()
    assert(frames.length == 2 && frames.forall(_._2 == 2))
    val s0 = "abcd".getBytes("UTF-8").map(_ & 0xff).sum
    val s1 = "efgh".getBytes("UTF-8").map(_ & 0xff).sum
    assert(frames(0)._3 == (s0 % 1000).toDouble / 1000.0)
    assert(frames(1)._3 == (s1 % 1000).toDouble / 1000.0)
    assert(frames(0)._4 == s0 % 100003 && frames(1)._4 == s1 % 100003)
  }

  test("media near-dup finds same-length payloads differing in one frame") {
    // Same byte length -> identical chunking; only the final chunk's
    // bytes differ, so the frame-fingerprint sets overlap at J >= 0.5
    // (the jittered scale replica's clone families have this shape).
    // 53 base bytes + 2 suffix = 55 ≡ 6 (mod 7) -> 7 frames of 8 bytes;
    // 6 shared + 2 differing-last -> J = 6/8 = 0.75.
    val base = "the quick brown fox jumps over the lazy dog".padTo(53, 'x').mkString
    val docs = Seq(
      (1L, base + "X1"), (2L, base + "Y2"),   // near-dups of each other
      (3L, "a completely different text body with other words!")
    ).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.attachPayload(docs), 1)
    val fps = frames.select(col("doc_id"),
      col("fp").cast("string").as("shingle")).distinct()
    val pairs = graft.dedup.Dedup.ngramJaccardFromShingles(fps, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("sampleFrames drops empty trailing chunks and handles empty text") {
    // 5 bytes -> n_frames = 6, csz = 1 -> frames 0..4 only (5*1 >= 5).
    val five = Multimodal.sampleFrames(
      Seq((1L, payloadFor("abcde"))).toDF("doc_id", "payload"), 1)
    assert(five.select("frame_idx").as[Int].collect().sorted.toSeq == (0 to 4))
    val empty = Multimodal.sampleFrames(
      Seq((2L, payloadFor(""))).toDF("doc_id", "payload"), 1)
    assert(empty.count() == 0)
  }

  test("jpeg fill bytes and standalone markers are skipped, not misparsed") {
    // Real-world JPEGs pad with 0xFF fill bytes and may carry TEM/RSTn
    // standalone markers (no length field) before the frame header. A
    // parser that assumes every marker has a length would read garbage
    // offsets here; ours must still land on the SOF.
    val px = "hello".getBytes("UTF-8")
    val bb = scala.collection.mutable.ArrayBuffer[Byte]()
    def b(i: Int): Unit = bb += i.toByte
    b(0xff); b(0xd8)                          // SOI
    b(0xff); b(0xff); b(0x01)                 // fill byte, then TEM (standalone)
    b(0xff); b(0xd0)                          // RST0 (standalone)
    b(0xff); b(0xe0); b(0); b(4); b(0); b(0)  // APP0, len=4 (2 payload bytes)
    b(0xff); b(0xc0); b(0); b(11)             // SOF0, len=11
    b(8)                                      // precision
    b(0); b(100)                              // height = 100
    b(0); b(200)                              // width = 200
    b(3)                                      // ncomponents
    b(1); b(2); b(3)                          // filler to fill len=11
    px.foreach(bb += _)
    val got = Multimodal.decode(
      Seq((9L, bb.toArray)).toDF("doc_id", "payload")).head()
    assert(got.format == "jpeg" && got.width == 200 && got.height == 100)
    assert(got.channels == 3 && got.n_bytes == 5)
    assert(got.fingerprint == fpOf(px))
  }

  test("corpus is ASCII: the m1/m2/m3 byte-level oracles stay valid") {
    // The DuckDB oracles for m1/m2/m3 walk code points via
    // ord(substr(text, j, 1)); the Scala side walks UTF-8 bytes. Equal
    // only on pure-ASCII text — enforce that on EVERY corpus the gates
    // run against (all shipped /root/testdata/sf* dirs plus any built
    // scale replicas under target/scale), so a future non-ASCII document
    // fails HERE, not as a silent oracle divergence on the corpus a
    // replica gate actually reads (VectorQueries.scala,
    // m1MultimodalMetaSql note). Replica text gains only ASCII suffixes
    // (" rN" jitter tokens), but the invariant is checked on the files,
    // not derived from the generator.
    val corpusDirs =
      Option(new java.io.File("/root/testdata").listFiles()).toSeq.flatten ++
        Option(new java.io.File("target/scale").listFiles()).toSeq.flatten
    val checked = corpusDirs
      .filter(d => new java.io.File(d, "documents.parquet").exists())
      .map(_.getPath)
    assert(checked.nonEmpty, "no documents corpus found to check")
    checked.foreach { dir =>
      val nonAscii = spark.read
        .parquet(s"$dir/documents.parquet")
        .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
        .count()
      assert(nonAscii == 0,
        s"$dir: $nonAscii non-ASCII documents break the byte-level oracles")
    }
  }

  test("attachPayload survives a null text row (empty pixel region)") {
    val docs = Seq((1L, "ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val metas = Multimodal.decode(Multimodal.attachPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(2L).n_bytes == 0 && metas(2L).format == "png")
    assert(metas(1L).n_bytes == 2)
  }
}
