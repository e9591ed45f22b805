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
}
