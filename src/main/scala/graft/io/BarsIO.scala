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

  /** Canonical long-table sink: parquet partitioned by series key, so a
    * per-symbol read at any scale is a partition-pruned scan (ScaleSpec
    * proves PartitionFilters reach the scan), and each symbol's files can
    * be compacted/lifecycled independently. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String = "symbol"): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** ORC interop (warehouses that standardize on ORC): same long table,
    * same pushdown/pruning behavior as parquet under Spark's native ORC
    * reader. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines interop (event feeds / data-exchange dumps): one JSON
    * object per row. Schema-on-read stays explicit at the call site —
    * pass the long-table schema to avoid an inference scan at scale. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}
