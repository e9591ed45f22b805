package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.BenchOne <name> [sfDir] [reps].
  * Prints per-rep seconds and the physical plan (for shuffle review). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) q(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
