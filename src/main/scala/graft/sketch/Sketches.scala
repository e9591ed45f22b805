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
  def countMinCells(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth <= 112, s"depth=$depth overflows h1 + i*h2 (max 112)")
    val based = df
      .withColumn("__md5", md5(key.cast("string")))
      .withColumn("__h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(col("__md5"), 17, 14), 16, 10).cast("long"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"),
        ((col("__h1") + lit(i.toLong) * col("__h2")) % width).as("col")))
    based.select(explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.col").as("col"))
      .agg(count(lit(1)).as("n"))
  }

  /** Count-Min point estimates for `probes` (a small keyed frame with a
    * `key` column): est = min over sketch rows of the probed cell. The
    * cells frame is tiny (≤ depth·width) and broadcasts. */
  def countMinEstimate(cells: DataFrame, probes: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val based = probes
      .withColumn("__md5", md5(col("key").cast("string")))
      .withColumn("__h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(col("__md5"), 17, 14), 16, 10).cast("long"))
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"),
        ((col("__h1") + lit(i.toLong) * col("__h2")) % width).as("col")))
    based.select(col("key"), explode(array(rows: _*)).as("cell"))
      .join(broadcast(cells),
        col("cell.row") === cells("row") && col("cell.col") === cells("col"))
      .groupBy("key")
      .agg(min(col("n")).as("cms_est"))
  }
}
