package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chart-API JSON ingest (reference etl/data_fetcher.py:124-240 — SURVEY.md
  * §2.1 S3): navigate chart.result[0].{timestamp, indicators.quote[0]},
  * zip the parallel arrays into rows, pad short quote arrays with nulls to
  * len(timestamp), convert Unix seconds → dates.
  *
  * The HTTP fetch itself (S1/S2/S4) is a driver-side connector concern;
  * this module is the engine part: a distributed parse of raw JSON
  * payload strings (one per symbol), so a thousand symbols fan out as
  * tasks. arrays_zip gives the null-padding semantics for free.
  */
object ChartJson {

  val quoteSchema: StructType = StructType(Seq(
    StructField("open", ArrayType(DoubleType)),
    StructField("high", ArrayType(DoubleType)),
    StructField("low", ArrayType(DoubleType)),
    StructField("close", ArrayType(DoubleType)),
    StructField("volume", ArrayType(LongType))))

  val resultSchema: StructType = StructType(Seq(
    StructField("timestamp", ArrayType(LongType)),
    StructField("indicators", StructType(Seq(
      StructField("quote", ArrayType(quoteSchema)))))))

  val chartSchema: StructType = StructType(Seq(
    StructField("chart", StructType(Seq(
      StructField("result", ArrayType(resultSchema)))))))

  /** Parse a frame of (symbol, json) payloads into long-format bars. */
  def parse(payloads: DataFrame, symbolCol: String = "symbol",
      jsonCol: String = "json"): DataFrame = {
    val parsed = payloads
      .withColumn("r", from_json(col(jsonCol), chartSchema)("chart")("result")(0))
      .withColumn("q", col("r")("indicators")("quote")(0))
      // arrays_zip pads the shorter arrays with null up to the longest —
      // exactly the reference's pad_to(len(timestamp)) behavior.
      .withColumn("bar", explode(arrays_zip(
        col("r")("timestamp").as("ts"),
        col("q")("open").as("open"), col("q")("high").as("high"),
        col("q")("low").as("low"), col("q")("close").as("close"),
        col("q")("volume").as("volume"))))
    parsed.select(
      col(symbolCol).as("symbol"),
      to_date(from_unixtime(col("bar.ts"))).as("date"),
      col("bar.open").as("open"), col("bar.high").as("high"),
      col("bar.low").as("low"), col("bar.close").as("close"),
      col("bar.volume").cast("long").as("volume"))
      .filter(col("date").isNotNull)
  }

  /** Convenience: parse one raw JSON string for a single symbol. */
  def parseOne(spark: SparkSession, symbol: String, json: String): DataFrame = {
    import spark.implicits._
    parse(Seq((symbol, json)).toDF("symbol", "json"))
  }
}
