package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Deterministic cardinality sketches.
  *
  * KMV (k-minimum-values) estimates |distinct keys| from the k smallest
  * distinct hash values: with u_k = the k-th smallest hash normalized to
  * [0,1), est = (k−1)/u_k (Bar-Yossef et al. 2002). Unlike
  * HyperLogLog-family sketches it is exactly reproducible from the hash
  * function alone, so a SQL oracle can replay it — and unlike
  * `COUNT(DISTINCT)` it never shuffles the key set:
  *
  *   scan → per-partition bounded TreeSet (k smallest distinct)
  *        → ≤ k·P candidate rows → global top-k merge
  *
  * At 100 TB that is a full scan but only k·numPartitions rows of data
  * movement (k = 64 → a few KB per partition), versus the full-width
  * exchange an exact distinct pays.
  */
object Sketches {

  /** KMV as a typed [[org.apache.spark.sql.expressions.Aggregator]] —
    * the per-GROUP form of [[kmvEstimate]], registered with
    * `functions.udaf` so it drops into any `groupBy(...).agg(...)`.
    * Buffer = the group's k smallest DISTINCT hashes (sorted, bounded);
    * reduce inserts, merge is a sorted-merge-take-k. Both are
    * order-invariant, so the estimate is deterministic under any
    * partitioning (QualitySpec pins this) and a SQL oracle replays it
    * per group. The Aggregator contract is what makes this the 100 TB
    * shape: Spark runs `reduce` as map-side partial aggregation, so at
    * most k longs per group cross the shuffle — per-group
    * distinct-count estimation without a per-group key exchange. */
  class KmvDistinct(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Double] {
    override def zero: Seq[Long] = Vector.empty
    private def insert(b: Seq[Long], h: Long): Seq[Long] =
      if (b.contains(h)) b
      else {
        val nb = (b :+ h).sorted
        if (nb.size > k) nb.take(k) else nb
      }
    override def reduce(b: Seq[Long], h: Long): Seq[Long] = insert(b, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(b: Seq[Long]): Double = // raw; callers round per the float policy
      if (b.size < k) b.size.toDouble
      else (k - 1).toDouble / (b.last / math.pow(2, 60))
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** 60-bit md5-derived hash of the key's string form — the same
    * engine-neutral family dedup.Dedup uses, so DuckDB replays it as
    * CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** One-row frame (k, est): the KMV distinct-count estimate for keyCol.
    * When fewer than k distinct hashes exist the count is exact (= kk). */
  def kmvEstimate(df: DataFrame, key: Column, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val perPartition = df.select(hash60(key).as("h")).as[Long]
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach { v =>
          set.add(v)
          if (set.size > k) set.remove(set.last)
        }
        set.iterator.asScala.map(_.longValue)
      }
      .toDF("h")
    // The global k smallest distinct hashes are each among their own
    // partition's k smallest, so this merge is exact; ≤ k·P rows reach it.
    perPartition.distinct().orderBy("h").limit(k)
      .agg(count(lit(1)).as("kk"), max(col("h")).as("hk"))
      .select(lit(k.toLong).as("k"),
        round(when(col("kk") < k, col("kk").cast("double"))
          .otherwise((col("kk") - 1).cast("double") /
            (col("hk") / lit(math.pow(2, 60)))), 6).as("est"))
  }

  /** Count-Min sketch cells for a key column: `depth` independent
    * 2-universal hashes h_i(x) = (h1 + i·h2) mod width (the same
    * md5-derived family as dedup.Dedup.minhashMd5, so any engine with
    * md5 replays it), each key occurrence incrementing one cell per row.
    *
    * Scale shape: the aggregation key is (row, col) — at most
    * depth·width cells EVER cross the wire regardless of key
    * cardinality (map-side partial aggregation collapses each partition
    * to ≤ depth·width rows before the shuffle). The sketch never holds
    * the key set — that is the whole point versus an exact groupBy at
    * 100 TB. Estimates are biased high only (Cormode & Muthukrishnan
    * 2005): est(x) = min_i cells[i][h_i(x)] ≥ true count, within
    * ε·N with probability 1−δ for width = e/ε, depth = ln(1/δ). */
  def countMinCells(df: DataFrame, key: Column, depth: Int, width: Int,
      group: Seq[String] = Nil): DataFrame = {
    require(depth <= 112, s"depth=$depth overflows h1 + i*h2 (max 112)")
    val based = df
      .withColumn("__md5", md5(key.cast("string")))
      .withColumn("__h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(col("__md5"), 17, 14), 16, 10).cast("long"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"),
        ((col("__h1") + lit(i.toLong) * col("__h2")) % width).as("col")))
    based.select(group.map(col) :+ explode(array(rows: _*)).as("cell"): _*)
      .select(group.map(col) :+ col("cell.row").as("row") :+ col("cell.col").as("col"): _*)
      .groupBy((group ++ Seq("row", "col")).map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** HyperLogLog registers for a key column, deterministic and
    * engine-neutral (Flajolet et al. 2007). The stochastic averaging
    * split rides the md5 hex string directly, so any engine with md5 +
    * string ops replays the registers bit-for-bit — no
    * platform-specific hashing, unlike `approx_count_distinct`:
    *
    *   bucket = first p/4 hex chars (p bits) → 2^p registers;
    *   rho    = leading-zero count of the NEXT 60 bits (15 hex chars)
    *            + 1, computed from the hex text (4·zero-chars + a
    *            nibble CASE) identically in Spark and SQL;
    *   M_j    = max rho per bucket.
    *
    * Scale shape: one groupBy on the p-bit bucket with map-side partial
    * max — at most 2^p rows ever cross the wire, the canonical
    * mergeable-sketch layout (registers union by max across any
    * partitioning of the input). */
  def hllRegisters(df: DataFrame, key: Column, p: Int,
      group: Seq[String] = Nil): DataFrame = {
    require(p % 4 == 0 && p >= 8 && p <= 12,
      s"p=$p: hex-prefix bucketing needs p in {8, 12}")
    val hexed = df.withColumn("__md5", md5(key.cast("string")))
      .withColumn("__b", conv(substring(col("__md5"), 1, p / 4), 16, 10).cast("long"))
      .withColumn("__h15", substring(col("__md5"), p / 4 + 1, 15))
    val z = length(regexp_extract(col("__h15"), "^(0*)", 1))
    val nib = conv(substring(col("__h15"), z + 1, lit(1)), 16, 10).cast("int")
    val clz4 = when(nib >= 8, 0).when(nib >= 4, 1).when(nib >= 2, 2).otherwise(3)
    val rho = when(z === 15, 61).otherwise(z * 4 + clz4 + 1)
    hexed.groupBy(group.map(col) :+ col("__b").as("bucket"): _*).agg(max(rho).as("m_j"))
  }

  /** One-row HLL cardinality estimate (m = 2^p registers).
    *
    * Cross-engine float policy: Σ 2^−M_j is accumulated EXACTLY as the
    * integer Σ 2^(60−M_j) in DECIMAL(38,0) (dyadic rationals scaled by
    * 2^60; ≤ 2^12 · 2^59 bounds well under 10^38), so the only floating
    * arithmetic is one identical-on-both-engines division at the end —
    * a plain double SUM(2^−M_j) would be association-order-dependent.
    * Small-range (linear-counting) correction per the paper: raw ≤ 2.5m
    * with empty registers → m·ln(m/zeros). */
  def hllEstimate(df: DataFrame, key: Column, p: Int): DataFrame = {
    val m = 1 << p
    val regs = hllRegisters(df, key, p)
    // 2^(60−M_j) is a power of two ≤ 2^59: exact in double, exact cast.
    val agg = regs.agg(
      count(lit(1)).as("nb"),
      sum(pow(lit(2.0), lit(60) - col("m_j")).cast("decimal(38,0)")).as("s_ne"))
    val zeros = (lit(m.toLong) - col("nb")).as("zeros")
    val sTot = (col("zeros").cast("decimal(38,0)") * lit(BigDecimal(2).pow(60)).cast("decimal(38,0)") +
      col("s_ne")).cast("decimal(38,0)")
    // alpha written as the same literal arithmetic the oracle uses, so
    // both engines constant-fold the identical IEEE doubles.
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val raw = alpha * lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, 60)) /
      col("s").cast("double")
    val est = when(col("zeros") > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
      .otherwise(raw)
    agg.select(lit(m.toLong).as("m"), zeros, col("s_ne"))
      .withColumn("s", sTot)
      .select(col("m"), col("zeros"), round(est, 6).as("est"))
  }

  /** Per-group HLL estimates: one (group, bucket) keyed aggregation —
    * each group's sketch is its own 2^p registers, so at most
    * groups·2^p rows cross the wire regardless of key cardinality.
    * Same float policy as [[hllEstimate]]. */
  def hllEstimateBy(df: DataFrame, key: Column, p: Int,
      group: Seq[String]): DataFrame = {
    require(group.nonEmpty, "use hllEstimate for the ungrouped sketch")
    val m = 1 << p
    val regs = hllRegisters(df, key, p, group)
    val agg = regs.groupBy(group.map(col): _*).agg(
      count(lit(1)).as("nb"),
      sum(pow(lit(2.0), lit(60) - col("m_j")).cast("decimal(38,0)")).as("s_ne"))
    val zeros = (lit(m.toLong) - col("nb")).as("zeros")
    val sTot = (col("zeros").cast("decimal(38,0)") *
      lit(BigDecimal(2).pow(60)).cast("decimal(38,0)") +
      col("s_ne")).cast("decimal(38,0)")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val raw = alpha * lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, 60)) /
      col("s").cast("double")
    val est = when(col("zeros") > 0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
      .otherwise(raw)
    agg.select(group.map(col) :+ lit(m.toLong).as("m") :+ zeros :+ col("s_ne"): _*)
      .withColumn("s", sTot)
      .select(group.map(col) :+ col("m") :+ col("zeros") :+ round(est, 6).as("est"): _*)
  }

  /** Pure-Scala twin of [[countMinCells]]' per-occurrence update, for
    * streaming state (a depth×width long array). Identical md5-derived
    * 2-universal hashes, so state cells equal the engine's exactly. */
  def cmsUpdateCells(cells: Array[Long], key: String, depth: Int, width: Int): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 30), 16)
    var i = 0
    while (i < depth) {
      cells(i * width + ((h1 + i.toLong * h2) % width).toInt) += 1
      i += 1
    }
  }

  /** Point estimate from a streaming cell array: min over rows of the
    * probed cell — pure integer math, bit-equal to the engine path. */
  def cmsEstimateFromCells(cells: Array[Long], key: String, depth: Int,
      width: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 30), 16)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = cells(i * width + ((h1 + i.toLong * h2) % width).toInt)
      if (v < best) best = v
      i += 1
    }
    best
  }

  /** Pure-Scala twin of [[hllRegisters]]' per-key update, for streaming
    * state (a 2^p-byte array in the state store). Bit-for-bit the same
    * registers as the engine expression: md5 hex of the key's string
    * form, bucket = first p/4 hex chars, rho from the next 15. */
  def hllUpdateRegs(regs: Array[Byte], key: String, p: Int): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val bucket = Integer.parseInt(hex.substring(0, p / 4), 16)
    val h15 = hex.substring(p / 4, p / 4 + 15)
    var z = 0
    while (z < 15 && h15.charAt(z) == '0') z += 1
    val rho =
      if (z == 15) 61
      else {
        val nib = Integer.parseInt(h15.substring(z, z + 1), 16)
        val clz4 = if (nib >= 8) 0 else if (nib >= 4) 1 else if (nib >= 2) 2 else 3
        z * 4 + clz4 + 1
      }
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  /** Pure-Scala twin of [[hllEstimate]]'s formula over a register array —
    * the identical IEEE chain (exact BigInt register sum, one double
    * division, same literal alpha), so a streaming state estimate equals
    * the engine query's to the bit. */
  def hllEstimateFromRegs(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    var zeros = 0
    var s = BigInt(0)
    regs.foreach { r =>
      if (r == 0) zeros += 1
      else s += BigInt(1) << (60 - r)
    }
    s += BigInt(zeros) * (BigInt(1) << 60)
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val raw = alpha * (m.toDouble * m.toDouble) * math.pow(2.0, 60) / s.toDouble
    if (zeros > 0 && raw <= 2.5 * m) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  /** Count-Min point estimates for `probes` (a small keyed frame with a
    * `key` column): est = min over sketch rows of the probed cell. The
    * cells frame is tiny (≤ depth·width) and broadcasts. */
  def countMinEstimate(cells: DataFrame, probes: DataFrame, depth: Int,
      width: Int, group: Seq[String] = Nil): DataFrame = {
    val based = probes
      .withColumn("__md5", md5(col("key").cast("string")))
      .withColumn("__h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(col("__md5"), 17, 14), 16, 10).cast("long"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"),
        ((col("__h1") + lit(i.toLong) * col("__h2")) % width).as("col")))
    based.select((group :+ "key").map(col) :+ explode(array(rows: _*)).as("cell"): _*)
      .select((group :+ "key").map(col)
        :+ col("cell.row").as("row") :+ col("cell.col").as("col"): _*)
      .join(broadcast(cells), group ++ Seq("row", "col"))
      .groupBy((group :+ "key").map(col): _*)
      .agg(min(col("n")).as("cms_est"))
  }
}
