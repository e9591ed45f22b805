package graft.io

import graft.align.Alignment
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers/writers for the reference's master-dataset CSV format
  * (SURVEY.md §2.1 S5/S6): header `Date,{SYM}_{Field}…`, nulls serialized
  * as the literal string "None" (or empty). Canonical storage for the
  * engine is parquet in long format; this is the compatibility layer. */
object BarsIO {

  /** S6: read the wide CSV, mapping "None"/"" to null, all prices double,
    * volumes long; returns the wide frame (Date as string, lexicographic =
    * chronological per the reference's date convention). */
  def readWideCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", "None")   // the reference's literal null text
      .option("emptyValue", "")
      .csv(path)
    val typed = raw.columns.map {
      case "Date" => col("Date")
      case c if c.endsWith("_Volume") =>
        when(col(c) === "" || col(c) === "None", lit(null)).otherwise(col(c))
          .cast("long").as(c)
      case c =>
        when(col(c) === "" || col(c) === "None", lit(null)).otherwise(col(c))
          .cast("double").as(c)
    }
    raw.select(typed.toIndexedSeq: _*)
  }

  /** S6 + melt: wide CSV → canonical long bar table. */
  def readLong(spark: SparkSession, path: String): DataFrame =
    Alignment.wideToLong(readWideCsv(spark, path))

  /** S5: write the wide frame back in the reference's CSV shape (single
    * file, "None" for nulls). Engine-canonical sink stays parquet. */
  def writeWideCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "None")
      .csv(path)
}
