package graft

import graft.analytics.Volatility
import graft.io.PdfReport
import org.apache.spark.sql.functions._

/** S9 sink: the emitted PDF must be structurally valid (header, object
  * offsets in the xref exactly match the byte positions, page count)
  * and carry the report content uncompressed. */
class PdfReportSpec extends SparkSpec {
  import spark.implicits._

  private def bars = Seq(
    ("A", 1, 100.0), ("A", 2, 101.0), ("A", 3, 100.5),
    ("B", 1, 100.0), ("B", 2, 110.0), ("B", 3, 95.0),
    ("C", 1, 100.0), ("C", 2, 103.0), ("C", 3, 99.0)
  ).toDF("symbol", "date", "close")

  private def report: Array[Byte] = {
    val vols = Volatility.annualized(bars, col("close"), Seq("symbol"), Seq(col("date")))
    val cls = Volatility.classify(vols, Seq(col("symbol")))
      .select(col("symbol"), round(col("vol"), 6).as("volatility"),
        col("risk_class"), col("rank"))
    PdfReport.render("Reporte Bursatil", "Engine report — risk pipeline",
      Seq(PdfReport.Section("Clasificacion de Riesgo", cls),
        PdfReport.Section("Resumen", Volatility.summary(cls), maxRows = 2)))
  }

  test("pdf skeleton: header, EOF, xref offsets point at their objects") {
    val bytes = report
    val text = new String(bytes, "ISO-8859-1")
    assert(text.startsWith("%PDF-1.4\n"))
    assert(text.endsWith("%%EOF\n"))
    val xrefPos = text.substring(text.lastIndexOf("startxref\n") + 10).trim
      .split("\n")(0).toInt
    assert(text.startsWith("xref", xrefPos), "startxref must locate the xref table")
    val entries = text.substring(xrefPos).split("\n")
      .drop(3) // "xref", "0 N", and the object-0 free entry
      .takeWhile(_.endsWith(" n ")).map(_.take(10).toInt)
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(text.startsWith(s"${i + 1} 0 obj", off),
        s"xref entry ${i + 1} points at byte $off which is not its object")
    }
  }

  test("pdf content: declared page count matches pages; sections present; truncation stated") {
    val text = new String(report, "ISO-8859-1")
    val count = "/Count (\\d+)".r.findFirstMatchIn(text).get.group(1).toInt
    assert("/Type /Page ".r.findAllIn(text).length === count)
    assert(text.contains("(Reporte Bursatil)"))
    assert(text.contains("1. Clasificacion de Riesgo"))
    // 3 risk classes grouped -> up to 3 rows; cap of 2 must be announced
    val summaryRows = Volatility.summary(
      Volatility.classify(
        Volatility.annualized(bars, col("close"), Seq("symbol"), Seq(col("date"))),
        Seq(col("symbol")))).count()
    if (summaryRows > 2) assert(text.contains("\\(first 2 rows\\)"))
  }

  test("pdf escaping: parens and backslash in cells cannot break the text operator") {
    val df = Seq(("a(b)c\\d", 1)).toDF("weird", "n")
    val text = new String(
      PdfReport.render("T", "s", Seq(PdfReport.Section("S", df))), "ISO-8859-1")
    assert(text.contains("a\\(b\\)c\\\\d"))
  }
}
