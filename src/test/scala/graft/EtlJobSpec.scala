package graft

import graft.etl.EtlJob
import org.apache.spark.sql.functions._

/** End-to-end ETL: two fixture chart-JSON payloads with holes and
  * disjoint calendars → parse, ffill, align, wide CSV round-trip. */
class EtlJobSpec extends SparkSpec {
  import spark.implicits._

  // AAA trades Jan 1-3 with a missing close on Jan 2 (ffill target);
  // BBB trades Jan 2-4 (disjoint edges -> null-padded alignment).
  private val jsonA =
    """{"chart":{"result":[{"timestamp":[1704067200,1704153600,1704240000],
      |"indicators":{"quote":[{"open":[10.0,11.0,12.0],"high":[10.5,11.5,12.5],
      |"low":[9.5,10.5,11.5],"close":[10.2,null,12.2],"volume":[100,200,300]}]}}]}}"""
      .stripMargin.replace("\n", "")
  private val jsonB =
    """{"chart":{"result":[{"timestamp":[1704153600,1704240000,1704326400],
      |"indicators":{"quote":[{"open":[20.0,21.0,22.0],"high":[20.5,21.5,22.5],
      |"low":[19.5,20.5,21.5],"close":[20.2,21.2,22.2],"volume":[400,500,600]}]}}]}}"""
      .stripMargin.replace("\n", "")

  test("parse -> ffill -> align -> report, with null padding at the edges") {
    val payloads = Seq(("AAA", jsonA), ("BBB", jsonB)).toDF("symbol", "json")
    val (aligned, report) = EtlJob.run(payloads)
    assert(report.symbols == 2)
    assert(report.calendarDays == 4)         // union of Jan 1-3 and Jan 2-4
    assert(report.alignedRows == 8)          // 4 days x 2 symbols
    assert(report.missingClose == 2)         // AAA@Jan4, BBB@Jan1
    assert(report.anomalies == 0)
    // ffill: AAA Jan 2 close was null -> carried 10.2
    val a2 = aligned.filter(col("symbol") === "AAA" &&
      col("date") === lit(java.sql.Date.valueOf("2024-01-02"))).head()
    assert(a2.getAs[Double]("close") == 10.2)
  }

  test("sinks: parquet + wide CSV round-trip through the compat reader") {
    val payloads = Seq(("AAA", jsonA), ("BBB", jsonB)).toDF("symbol", "json")
    val dir = java.nio.file.Files.createTempDirectory("graftetl").toString
    val report = EtlJob.runWithSinks(payloads, s"$dir/bars.parquet", s"$dir/wide_csv")
    assert(report.alignedRows == 8)
    val back = spark.read.parquet(s"$dir/bars.parquet")
    assert(back.count() == 8)
    val csvFile = new java.io.File(s"$dir/wide_csv").listFiles()
      .filter(_.getName.endsWith(".csv")).head.getPath
    val wide = graft.io.BarsIO.readWideCsv(spark, csvFile)
    assert(wide.count() == 4)
    assert(wide.columns.count(_.endsWith("_Close")) == 2)
    // the reference's "None" literal appears for missing cells and reads
    // back as null
    val longAgain = graft.io.BarsIO.readLong(spark, csvFile)
    assert(longAgain.filter(col("close").isNull).count() == 2)
  }
}
