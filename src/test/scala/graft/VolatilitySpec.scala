package graft

import graft.analytics.Volatility
import org.apache.spark.sql.functions._

/** Reference fixture: algorithms/volatility.py:300-342 (FIXTURES.md §2.3) —
  * seeded GBM at three daily vols; classification must be monotone. */
class VolatilitySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic GBM P_{t+1} = P_t * exp(N(0, sigma)), seeded. */
  private def gbm(sym: String, sigma: Double, start: Double, n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    var p = start
    (0 until n).map { i =>
      val row = (i, sym, p)
      p = p * math.exp(rnd.nextGaussian() * sigma)
      row
    }
  }

  private val keys = Seq("symbol")
  private val order = Seq(col("i"))

  private def fixture = (
    gbm("LOW", 0.005, 100.0, 200, 42L) ++
    gbm("MID", 0.015, 50.0, 200, 43L) ++
    gbm("HIGH", 0.035, 30.0, 200, 44L)
  ).toDF("i", "symbol", "close")

  test("classification is monotone in generating sigma") {
    val vols = Volatility.annualized(fixture, $"close", keys, order)
    val cls = Volatility.classify(vols, Seq($"symbol"))
      .orderBy("rank")
      .select("symbol", "vol", "risk_class", "rank")
      .collect()
    assert(cls.map(_.getString(0)).toSeq == Seq("LOW", "MID", "HIGH"))
    assert(cls.head.getString(2) == "Conservador")
    assert(cls.last.getString(2) == "Agresivo")
    assert(cls.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    val summary = Volatility.summary(Volatility.classify(vols, Seq($"symbol")))
      .as[(String, Long)].collect().toMap
    assert(summary.values.sum == 3)
  }

  test("series with <2 valid returns yields vol 0.0, not a missing row") {
    val df = (Seq((0, "ONE", 10.0)) ++ gbm("OK", 0.01, 100.0, 50, 7L))
      .toDF("i", "symbol", "close")
    val vols = Volatility.annualized(df, $"close", keys, order)
      .as[(String, Double)].collect().toMap
    assert(vols("ONE") == 0.0)
    assert(vols("OK") > 0.0)
  }

  test("percentile thresholds use linear interpolation (P33/P66)") {
    // vols 1..10 -> p33 = 1 + 9*0.33 = 3.97, p66 = 1 + 9*0.66 = 6.94
    val vols = (1 to 10).map(v => (s"s$v", v.toDouble)).toDF("symbol", "vol")
    val th = Volatility.thresholds(vols).head()
    assert(approx(th.getDouble(0), 3.97))
    assert(approx(th.getDouble(1), 6.94))
  }
}
