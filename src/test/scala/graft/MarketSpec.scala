package graft

import graft.ta.Indicators
import org.apache.spark.sql.functions._

/** Bar-level indicators (true range / ATR / stochastic / OBV / VWAP) and
  * the corpus-curation helpers behind MarketQueries/CorpusQueries. */
class MarketSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, day#, open, high, low, close, vol)
  private def bars = Seq(
    (1L, 1L, 10.0, 12.0, 9.0, 11.0, 5L),
    (1L, 2L, 11.0, 15.0, 11.0, 14.0, 3L), // up day
    (1L, 3L, 14.0, 14.5, 10.0, 10.5, 4L), // down day
    (1L, 4L, 10.5, 11.0, 10.0, 10.5, 2L)  // flat close
  ).toDF("user_id", "day", "high0_unused", "high", "low", "close", "vol")
    .drop("high0_unused")

  private val keys = Seq("user_id")
  private def order = Seq(col("day"))

  test("trueRange: high−low on the first bar, max of the three spans after") {
    val tr = bars
      .withColumn("tr", Indicators.trueRange(col("high"), col("low"), col("close"), keys, order))
      .orderBy("day").select("tr").as[Double].collect()
    assert(tr(0) == 12.0 - 9.0)
    // bar2: max(15−11, |15−11|, |11−11|) = 4
    assert(tr(1) == 4.0)
    // bar3: max(14.5−10, |14.5−14|, |10−14|) = 4.5
    assert(tr(2) == 4.5)
  }

  test("atr: null warm-up then mean of the last n true ranges") {
    val atr = bars
      .withColumn("atr", Indicators.atr(col("high"), col("low"), col("close"), 2, keys, order))
      .orderBy("day").select("atr").as[Option[Double]].collect()
    assert(atr(0).isEmpty)
    assert(approx(atr(1).get, (3.0 + 4.0) / 2))
    assert(approx(atr(2).get, (4.0 + 4.5) / 2))
  }

  test("stochasticK: 0 at the n-bar low, 100 at the n-bar high, null when flat") {
    val k = bars
      .withColumn("k", Indicators.stochasticK(col("high"), col("low"), col("close"), 2, keys, order))
      .orderBy("day").select("k").as[Option[Double]].collect()
    assert(k(0).isEmpty) // warm-up
    // bar2: hh=15 ll=9, close 14 → 100·5/6
    assert(approx(k(1).get, 100.0 * (14.0 - 9.0) / 6.0))
    val flat = Seq((1L, 1L, 5.0, 5.0, 5.0), (1L, 2L, 5.0, 5.0, 5.0))
      .toDF("user_id", "day", "high", "low", "close")
      .withColumn("k", Indicators.stochasticK(col("high"), col("low"), col("close"), 2, keys, order))
      .select("k").as[Option[Double]].collect()
    assert(flat.forall(_.isEmpty))
  }

  test("obv: starts at 0, adds volume on up closes, subtracts on down") {
    val obv = bars
      .withColumn("obv", Indicators.obv(col("close"), col("vol"), keys, order))
      .orderBy("day").select("obv").as[Long].collect()
    assert(obv.sameElements(Array(0L, 3L, -1L, -1L)))
  }

  test("vwap: equals price when constant, volume-weights otherwise") {
    val df = Seq((1L, 1L, 10.0, 2.0), (1L, 2L, 20.0, 6.0))
      .toDF("user_id", "t", "price", "qty")
    val v = df.withColumn("vwap",
        Indicators.vwap(col("price"), col("qty"), keys, Seq(col("t"))))
      .orderBy("t").select("vwap").as[Double].collect()
    assert(approx(v(0), 10.0))
    assert(approx(v(1), (10 * 2 + 20 * 6) / 8.0))
  }

  test("market queries run end-to-end on sf0.001 with sane shapes") {
    val dir = "/root/testdata/sf0.001"
    val atr = graft.operators.MarketQueries.i8Atr(spark, dir)
    assert(atr.columns.sameElements(Array("user_id", "day", "atr")))
    assert(atr.count() > 0)
    val sto = graft.operators.MarketQueries.i9Stochastic(spark, dir)
      .filter(col("pct_k").isNotNull)
    val bounds = sto.agg(min("pct_k"), max("pct_k")).as[(Double, Double)].head()
    assert(bounds._1 >= 0.0 && bounds._2 <= 100.0)
    val dec = graft.operators.MarketQueries.x5MomentumDecile(spark, dir)
      .agg(min("decile"), max("decile")).as[(Long, Long)].head()
    assert(dec._1 >= 1L && dec._2 <= 10L)
  }

  test("balanced sample: every stratum is exactly the smallest stratum's size") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.CorpusQueries.t15BalancedSample(spark, dir)
    val sizes = out.groupBy("lang").count().select("count").as[Long].collect()
    assert(sizes.nonEmpty && sizes.distinct.length == 1)
  }

  test("lm score: documents of repeated common bigrams score higher than rare ones") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.CorpusQueries.t17LmScore(spark, dir)
    val scores = out.select("lm_score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(s => s < 0.0 && s.isFinite))
  }
}
