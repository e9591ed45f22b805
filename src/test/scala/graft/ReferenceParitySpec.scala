package graft

import graft.analytics.{Patterns, Volatility}
import graft.io.BarsIO
import org.apache.spark.sql.functions._

/** End-to-end parity against the reference's own published dataset
  * (data/dataset_maestro.csv, 1758 rows × 20 symbols) and the output
  * anchors in its docs (BASELINE.md): VOO vol ≈ 19.97 %, PBR ≈ 49.43 %,
  * VOO streak histogram {1:4463, 2:2248, 3:1210, …, 10:11} at window=20.
  * Exact expected values were produced by executing the reference
  * implementation over the same CSV. */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private val csvPath = "/root/reference/data/dataset_maestro.csv"
  private lazy val bars = BarsIO.readLong(spark, csvPath).cache()

  private val keys = Seq("symbol")
  private val order = Seq(col("date"))

  test("wide CSV melts to 1758 dates x 20 symbols with None -> null") {
    assert(bars.select("date").distinct().count() == 1758)
    assert(bars.select("symbol").distinct().count() == 20)
    // the published CSV is fully forward-filled — zero missing cells
    assert(bars.filter(col("close").isNull).count() == 0)
    // "None" literal parsing round-trips on a synthetic wide CSV
    val p = java.nio.file.Files.createTempDirectory("graftcsv")
    java.nio.file.Files.writeString(p.resolve("t.csv"),
      "Date,A_Open,A_High,A_Low,A_Close,A_Volume\n2024-01-02,None,2.0,0.5,None,100\n")
    val synth = graft.io.BarsIO.readLong(spark, p.resolve("t.csv").toString)
    val r = synth.head()
    assert(r.isNullAt(r.fieldIndex("open")) && r.isNullAt(r.fieldIndex("close")))
    assert(r.getAs[Double]("high") == 2.0 && r.getAs[Long]("volume") == 100L)
  }

  test("annualized volatility matches reference: VOO ~19.97%, PBR ~49.43%") {
    val vols = Volatility.annualized(
      bars.filter(col("close").isNotNull), col("close"), keys, order)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx(vols("VOO"), 0.19968609692184333, 1e-9))
    assert(approx(vols("PBR"), 0.4942880035039508, 1e-9))
  }

  test("compare_two_assets matches reference on VOO/SPY and VOO/PBR") {
    // expected values produced by executing the reference implementation
    // (similarity.py compare_two_assets) over the same CSV
    val r1 = graft.analytics.CompareAssets.compare(bars, "VOO", "SPY")
    assert(approx(r1.euclidean, 0.03861280294213744, 1e-9))
    assert(approx(r1.pearson, 0.9973147045054994, 1e-9))
    assert(approx(r1.dtw, 0.5793689314042973, 1e-9))
    assert(approx(r1.cosine, 0.9973193927771115, 1e-9))
    assert(r1.n_points == 1757L)
    val r2 = graft.analytics.CompareAssets.compare(bars, "VOO", "PBR")
    assert(approx(r2.euclidean, 1.1628645955346504, 1e-9))
    assert(approx(r2.pearson, 0.45673812138825653, 1e-9))
    assert(approx(r2.dtw, 25.367541335489225, 1e-9))
    assert(approx(r2.cosine, 0.45660111006059934, 1e-9))
    // collectLimit = 0 forces the typed-aggregator DTW path on the same
    // 1757-point pair: the executor-side kernel must reproduce the
    // reference anchor bit-for-bit
    val r1agg = graft.analytics.CompareAssets.compare(bars, "VOO", "SPY",
      collectLimit = 0L)
    assert(r1agg.dtw == r1.dtw,
      s"aggregator path ${r1agg.dtw} != collected path ${r1.dtw}")
    // degenerate: one point -> all-zero result
    val tiny = Seq(("2024-01-01", "A", 1.0), ("2024-01-01", "B", 2.0))
      .toDF("date", "symbol", "close")
    assert(graft.analytics.CompareAssets.compare(tiny, "A", "B") ==
      graft.analytics.CompareAssets.Zero)
  }

  test("VOO streak histogram matches the reference anchor (window=20)") {
    // The dashboard zero-substitutes null closes before the scan
    // (app.py:426-428 — SURVEY.md §7.4.2); reproduce that here.
    val voo = bars.filter(col("symbol") === "VOO")
      .withColumn("close", coalesce(col("close"), lit(0.0)))
    val hist = Patterns.streakHistogram(voo, col("close"), keys, order, 20)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(hist == Map(1 -> 4463L, 2 -> 2248L, 3 -> 1210L, 4 -> 623L,
      5 -> 315L, 6 -> 150L, 7 -> 138L, 8 -> 56L, 9 -> 14L, 10 -> 11L))
    val stats = Patterns.streakStats(voo, col("close"), keys, order, 20).head()
    assert(stats.getAs[Int]("max_streak") == 10)
    assert(stats.getAs[Long]("total_ups") == 970L)
    assert(stats.getAs[Long]("total_windows") == 1739L)
  }
}
