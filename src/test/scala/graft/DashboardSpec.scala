package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.Files

/** The composed end-to-end artifact: one run over the reference's own
  * published CSV must produce every dashboard payload plus the PDF,
  * with the BASELINE.md anchors inside them. */
class DashboardSpec extends SparkSpec {

  test("dashboard run composes all payloads + the PDF with reference anchors inside") {
    val tmp = Files.createTempDirectory("graftdash")
    try {
      val files = Dashboard.run(spark,
        "/root/reference/data/dataset_maestro.csv", tmp.toString)
      assert(files.toSet == Set("symbols.json", "risk.json", "heatmap.json",
        "similarity.json", "report.pdf"))

      val JArray(syms) = (JsonMethods.parse(Files.readString(
        tmp.resolve("symbols.json"))) \ "symbols"): @unchecked
      assert(syms.length == 20)

      val risk = JsonMethods.parse(Files.readString(tmp.resolve("risk.json")))
      val JArray(cls) = (risk \ "classifications"): @unchecked
      assert(cls.length == 20)
      val vooVol = cls.collectFirst {
        case c if (c \ "symbol") == JString("VOO") =>
          (c \ "volatility").asInstanceOf[JDouble].num
      }.get
      assert(math.abs(vooVol - 0.199686) < 1e-9, s"VOO vol anchor: $vooVol")

      val heat = JsonMethods.parse(Files.readString(tmp.resolve("heatmap.json")))
      val m = (heat \ "matrix").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JArray].arr.map(_.asInstanceOf[JDouble].num))
      assert(m.length == 20 && m.forall(_.length == 20))
      (0 until 20).foreach { i =>
        assert(m(i)(i) == 1.0)
        (0 until 20).foreach(j => assert(m(i)(j) == m(j)(i)))
      }

      val sim = JsonMethods.parse(Files.readString(tmp.resolve("similarity.json")))
      assert((sim \ "symbol_a") == JString("VOO") && (sim \ "symbol_b") == JString("SPY"))
      assert((sim \ "metrics" \ "n_points") == JInt(1757))
      val dtw = (sim \ "metrics" \ "dtw").asInstanceOf[JDouble].num
      assert(math.abs(dtw - 0.579369) < 1e-9, s"VOO/SPY dtw anchor: $dtw")

      val pdf = Files.readAllBytes(tmp.resolve("report.pdf"))
      val head = new String(pdf.take(8), "ISO-8859-1")
      val tail = new String(pdf.takeRight(16), "ISO-8859-1")
      assert(head.startsWith("%PDF-1.4"), s"pdf header: $head")
      assert(tail.contains("%%EOF"), s"pdf trailer: $tail")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
