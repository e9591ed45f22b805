package graft.etl

import graft.align.Alignment
import graft.clean.Cleaning
import graft.ingest.ChartJson
import graft.io.BarsIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ETL pipeline end-to-end (SURVEY.md §3.1), Spark-shaped:
  * chart-JSON payloads → parse → quality report → forward-fill close →
  * drop invalid → master-calendar alignment → wide assembly → sinks.
  *
  * The HTTP fetch stays a driver-side connector (it hands this job a
  * (symbol, json) frame); everything from parse on runs distributed.
  * One shuffle for the calendar alignment join, one for the pivot —
  * both keyed, both AQE-coalesced.
  */
object EtlJob {

  case class Report(symbols: Long, calendarDays: Long, alignedRows: Long,
    missingClose: Long, anomalies: Long)

  /** Returns (long bar table aligned to the master calendar, report). */
  def run(payloads: DataFrame): (DataFrame, Report) = {
    val bars = ChartJson.parse(payloads)

    val anomalies = Cleaning.inconsistencies(bars).count()
    val filled = Cleaning.dropInvalid(
      Cleaning.forwardFill(bars, "close", Seq("symbol"), Seq(col("date"))))
    // feeds four report counts and is handed to the caller; blocks are
    // GC-reclaimed once the caller drops it (see Graft.materialize).
    val aligned = graft.Graft.materialize(Alignment.alignToCalendar(filled))

    val report = Report(
      symbols = aligned.select("symbol").distinct().count(),
      calendarDays = aligned.select("date").distinct().count(),
      alignedRows = aligned.count(),
      missingClose = aligned.filter(col("close").isNull).count(),
      anomalies = anomalies)
    (aligned, report)
  }

  /** Full job with sinks: canonical parquet + reference-compatible wide CSV. */
  def runWithSinks(payloads: DataFrame, parquetOut: String, csvOut: String): Report = {
    val (aligned, report) = run(payloads)
    aligned.write.mode("overwrite").parquet(parquetOut)
    val symbols = aligned.select("symbol").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val wide = Alignment.pivotWide(aligned, symbols)
    BarsIO.writeWideCsv(wide.withColumnRenamed("date", "Date"), csvOut)
    report
  }
}
