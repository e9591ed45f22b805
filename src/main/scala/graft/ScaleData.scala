package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replica generator: materializes an N× copy of a driver sf
  * directory so the catalog can be exercised above the shipped sf0.1
  * (the sandbox ships sf0.001/0.01/0.1 only; the scale gate in
  * SCALE_r05.md needs ~sf1).
  *
  * Each replica i gets every surrogate key offset by i×stride with ONE
  * stride per keyspace, applied consistently on both sides of every FK
  * (orderkey on orders+lineitem, custkey on customer+orders, partkey /
  * suppkey on part / supplier / lineitem, user_id+event_id on events,
  * doc_id / vec_id on documents / embeddings) — so join fan-in per key
  * is unchanged and only the number of keys grows, which is exactly how
  * TPC-H itself scales. `nation`/`region` stay fixed (as in TPC-H) and
  * nationkeys are NOT offset, so dimension joins stay broadcast-sized.
  * Payload columns (text, embeddings, prices, timestamps) are copied
  * verbatim: the corpus becomes 90 % exact duplicates across replicas,
  * which is a deliberately adversarial stress for the dedup/LSH family
  * (bucket sizes ×N ⇒ candidate pairs ×N²).
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <outDir> [factor=10]
  */
object ScaleData {
  // Strides sit above any key the driver generates at sf0.1 (max
  // observed: o_orderkey 6e5, event_id 1e5) with room for sf10 sources.
  private val strides: Map[String, Long] = Map(
    "c_custkey" -> 10000000L,
    "o_custkey" -> 10000000L,
    "o_orderkey" -> 100000000L,
    "l_orderkey" -> 100000000L,
    "p_partkey" -> 10000000L,
    "l_partkey" -> 10000000L,
    "s_suppkey" -> 1000000L,
    "l_suppkey" -> 1000000L,
    "event_id" -> 100000000L,
    "user_id" -> 10000000L,
    "doc_id" -> 10000000L,
    "vec_id" -> 10000000L)

  private val fixed = Set("region", "nation")

  def replicate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled: DataFrame =
        if (fixed(t)) df
        else {
          // Cross join with a replica-id range and shift the key columns;
          // one wide scan per table, no driver-side loop over replicas.
          val reps = spark.range(factor).select(col("id").as("__rep"))
          val crossed = df.crossJoin(broadcast(reps))
          val shifted = df.columns.foldLeft(crossed) { (acc, c) =>
            strides.get(c) match {
              case Some(s) => acc.withColumn(c, col(c) + col("__rep") * lit(s))
              case None => acc
            }
          }
          shifted.drop("__rep")
        }
      // Match the driver layout ("$dir/$name.parquet"; a directory with
      // that name works too). File granularity is the scan-parallelism
      // ceiling for parquet (a ~16 MB file is one row group, and a row
      // group is indivisible), so write enough parts that a 32-thread
      // local run can scan the big tables 32-wide — mirroring how a real
      // 100 TB dataset arrives as thousands of block-sized files.
      val parts = if (fixed(t)) 1 else (factor * 8).min(64)
      scaled.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t -> ${if (fixed(t)) "copied" else s"x$factor"}")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, src, out, factor)
    spark.stop()
  }
}
