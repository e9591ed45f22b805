package graft

import org.apache.spark.sql.functions._

/** At-scale paths that have no cross-engine oracle: sketch-based
  * approximations (bounded error vs the exact operators) and
  * partition-pruned reads (plan + file-count proof). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val (approx, exact) = li
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx tracks the exact percentile") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val (approx, exact) = ev
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("a"),
        expr("percentile(value, 0.5)").as("e"))
      .as[(Double, Double)].head()
    // with accuracy 10000 over a few thousand rows the sketch is exact
    // up to rank-1 neighbors; allow a 1% value band
    assert(math.abs(approx - exact) <= math.max(0.01 * math.abs(exact), 1e-9),
      s"approx=$approx exact=$exact")
  }

  test("partitioned write prunes partitions at read time") {
    val dir = java.nio.file.Files.createTempDirectory("graftpart").toString
    spark.read.parquet(s"$sf/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"expected partition filters:\n$p")
    // the pruned scan must read only the one partition's files
    val clickRows = pruned.count()
    val allRows = spark.read.parquet(dir).count()
    assert(clickRows > 0 && clickRows < allRows)
    val totalFiles = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("event_type="))
    assert(totalFiles == 5, s"expected 5 partition dirs, got $totalFiles")
  }
}
