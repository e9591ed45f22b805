package graft

import graft.io.BarsIO
import org.apache.spark.sql.functions._

/** Source/sink interop: ORC, JSON-lines, and partitioned-parquet
  * round-trips preserve the long table exactly; partitioned layout
  * prunes at the scan. */
class IoSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // per-suite temp root, removed in afterAll so repeated runs don't
  // accumulate garbage in the system temp dir
  private val tmpRoot = java.nio.file.Files.createTempDirectory("graftio")

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(tmpRoot, prefix).toString

  override def afterAll(): Unit = {
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpRoot).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally super.afterAll()
  }

  private def longDf = Seq(
    ("2024-01-02", "AAA", 10.0, 12.0, 9.0, 11.0, 100L),
    ("2024-01-03", "AAA", 11.0, 13.0, 10.0, 12.0, 200L),
    ("2024-01-02", "BBB", 20.0, 22.0, 19.0, 21.0, 300L))
    .toDF("date", "symbol", "open", "high", "low", "close", "volume")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("symbol", "date")
      .as[(String, String, Double, Double, Double, Double, Long)].collect().toSeq

  test("orc round-trip preserves the long table") {
    val dir = tempDir("graftorc")
    BarsIO.writeOrc(longDf, dir)
    assert(rows(BarsIO.readOrc(spark, dir).select(longDf.columns.map(col): _*))
      == rows(longDf))
  }

  test("jsonl round-trip with explicit schema preserves values and types") {
    val dir = tempDir("graftjsonl")
    BarsIO.writeJsonl(longDf, dir)
    val back = BarsIO.readJsonl(spark, dir, Some(longDf.schema))
      .select(longDf.columns.map(col): _*)
    // JSON sources are always-nullable; compare names and types only
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      longDf.schema.map(f => (f.name, f.dataType)))
    assert(rows(back) == rows(longDf))
  }

  test("partitioned parquet prunes to the selected symbol at the scan") {
    val dir = tempDir("graftpart")
    BarsIO.writePartitioned(longDf, dir)
    val one = spark.read.parquet(dir).filter(col("symbol") === "AAA")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("symbol"),
      s"expected partition pruning:\n$plan")
    assert(one.count() == 2)
  }
}
