package graft

import graft.ta.Indicators
import org.apache.spark.sql.functions._

/** Kernel + DataFrame behavior of the EMA-recurrence family and the
  * frame-window indicators (ta.Indicators). */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private val prices = Seq(100.0, 102.0, 101.0, 105.0, 103.0, 107.0, 110.0, 108.0)

  // events shape: (event_id, user_id, ts, value) — ts out of insertion order
  // on purpose so the kernels' (ts, event_id) sort is exercised.
  private def eventsDf = prices.zipWithIndex
    .map { case (p, i) => (i.toLong, 7L, (100 - i).toLong * 1000L, p) }
    .toDF("event_id", "user_id", "ts", "value")

  test("emaKernel: seeds at x0 and follows the recurrence") {
    val a = 0.5
    val got = Indicators.emaKernel(Array(10.0, 20.0, 30.0), a)
    assert(got(0) == 10.0)
    assert(approx(got(1), 0.5 * 20 + 0.5 * 10))
    assert(approx(got(2), 0.5 * 30 + 0.5 * got(1)))
  }

  test("emaKernel: alpha=1 reproduces the input; constant input is a fixpoint") {
    val xs = prices.toArray
    assert(Indicators.emaKernel(xs, 1.0).sameElements(xs))
    assert(Indicators.emaKernel(Array.fill(5)(42.0), 0.3).forall(_ == 42.0))
  }

  test("macdKernel: constant series gives all-zero macd/signal/hist") {
    Indicators.macdKernel(Array.fill(10)(5.0), 2.0 / 13, 2.0 / 27, 0.2)
      .foreach { case (m, s, h) => assert(m == 0.0 && s == 0.0 && h == 0.0) }
  }

  test("holtKernel: seeds (x0, 0) and follows the two-state recurrence") {
    val (a, b) = (0.3, 0.1)
    val got = Indicators.holtKernel(Array(10.0, 20.0, 16.0), a, b)
    assert(got(0) == ((10.0, 0.0)))
    val l1 = a * 20 + (1 - a) * (10.0 + 0.0)
    val b1 = b * (l1 - 10.0) + (1 - b) * 0.0
    assert(approx(got(1)._1, l1) && approx(got(1)._2, b1))
    val l2 = a * 16 + (1 - a) * (l1 + b1)
    assert(approx(got(2)._1, l2))
    assert(approx(got(2)._2, b * (l2 - l1) + (1 - b) * b1))
  }

  test("holtKernel: constant series keeps level = x and trend = 0") {
    Indicators.holtKernel(Array.fill(10)(42.0), 0.3, 0.1)
      .foreach { case (l, t) => assert(l == 42.0 && t == 0.0) }
  }

  test("holtKernel: on a perfectly linear series the trend converges to the slope") {
    val xs = Array.tabulate(300)(t => 5.0 + 2.0 * t)
    val out = Indicators.holtKernel(xs, 0.3, 0.1)
    val (lastL, lastB) = out.last
    assert(math.abs(lastB - 2.0) < 1e-3, s"trend $lastB should approach slope 2")
    // one-step forecast = level + trend ≈ the next point of the line
    assert(math.abs((lastL + lastB) - (5.0 + 2.0 * 300)) < 1e-2)
  }

  test("holt DataFrame op matches the kernel in series (ts) order") {
    val got = Indicators.holt(eventsDf, 0.3, 0.1).orderBy(desc("event_id"))
      .select("level", "trend").as[(Double, Double)].collect()
    val exp = Indicators.holtKernel(prices.reverse.toArray, 0.3, 0.1)
    got.zip(exp).foreach { case ((gl, gt), (el, et)) =>
      assert(approx(gl, el) && approx(gt, et))
    }
  }

  test("ema DataFrame op matches the kernel in series (ts) order") {
    // eventsDf's ts DESCENDS with event_id, so series order reverses ids.
    val got = Indicators.ema(eventsDf, 20).orderBy(desc("event_id"))
      .select("ema").as[Double].collect()
    val exp = Indicators.emaKernel(prices.reverse.toArray, 2.0 / 21)
    got.zip(exp).foreach { case (g, e) => assert(approx(g, e)) }
  }

  test("emaScan: partitioned two-pass scan matches the serial kernel") {
    val rnd = new scala.util.Random(17)
    val xs = Array.fill(5000)(50.0 + rnd.nextDouble() * 100.0)
    val df = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, i.toLong, x) }
      .toSeq.toDF("event_id", "ts", "value")
      .repartition(8) // scramble before the op re-range-partitions
    val got = Indicators.emaScan(df, 20).orderBy("event_id")
      .select("ema").as[Double].collect()
    val exp = Indicators.emaKernel(xs, 2.0 / 21)
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)), s"$g != $e")
    }
  }

  test("macd DataFrame op: fast EMA above slow EMA after a rise") {
    val rising = (1 to 40).map(i => (i.toLong, 1L, i.toLong, 100.0 + i))
      .toDF("event_id", "user_id", "ts", "value")
    val last = Indicators.macd(rising).orderBy(desc("event_id"))
      .select("macd").as[Double].head()
    assert(last > 0.0)
  }

  test("rsiCutler: nulls through the warm-up, 100 on a monotone rise, 0 on a fall") {
    def series(xs: Seq[Double]) = xs.zipWithIndex
      .map { case (p, i) => (i.toLong, 1L, i.toLong, p) }
      .toDF("event_id", "user_id", "ts", "value")
    val up = series((1 to 20).map(_.toDouble * 10))
      .select(Indicators.rsiCutler(col("value"), 14, Seq("user_id"), Seq(col("ts")))
        .as("rsi"))
      .as[Option[Double]].collect()
    assert(up.take(14).forall(_.isEmpty))
    assert(up.drop(14).forall(_.contains(100.0)))
    val down = series((1 to 20).map(i => 1000.0 - i * 10))
      .select(Indicators.rsiCutler(col("value"), 14, Seq("user_id"), Seq(col("ts")))
        .as("rsi"))
      .as[Option[Double]].collect()
    assert(down.drop(14).forall(_.contains(0.0)))
  }

  test("drawdown is ≤ 0 and hits the known trough") {
    val dd = eventsDf
      .withColumn("dd", Indicators.drawdown(col("value"), Seq("user_id"),
        Seq(col("event_id"))))
      .select("dd").as[Double].collect()
    assert(dd.forall(_ <= 1e-15))
    // peak 105 at i=3, trough 103 at i=4 → 103/105 − 1
    assert(approx(dd(4), 103.0 / 105.0 - 1))
  }

  test("cumReturn starts at 0 and matches value/first − 1") {
    val cr = eventsDf
      .withColumn("cr", Indicators.cumReturn(col("value"), Seq("user_id"),
        Seq(col("event_id"))))
      .orderBy("event_id").select("cr").as[Double].collect()
    assert(cr(0) == 0.0)
    assert(approx(cr.last, 108.0 / 100.0 - 1))
  }

  test("bollinger: upper ≥ mid ≥ lower and warm-up nulls") {
    val (mid, up, lo) = Indicators.bollinger(col("value"), 4, 2.0,
      Seq("user_id"), Seq(col("event_id")))
    val rows = eventsDf.select(mid.as("m"), up.as("u"), lo.as("l"))
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    assert(rows.take(3).forall(_._1.isEmpty))
    rows.drop(3).foreach { case (Some(m), Some(u), Some(l)) =>
      assert(u >= m && m >= l)
    }
  }

  test("rolling autocorr of a perfectly linear series is 1") {
    val lin = (1 to 12).map(i => (i.toLong, 1L, i.toLong, i.toDouble))
      .toDF("event_id", "user_id", "ts", "value")
    val ac = Indicators.withRollingAutocorr(lin, "value", 5,
        Seq("user_id"), Seq(col("ts")), "ac")
      .orderBy("event_id").select("ac").as[Option[Double]].collect()
    assert(ac.take(5).forall(_.isEmpty))
    ac.drop(5).foreach(v => assert(approx(v.get, 1.0, 1e-9)))
  }
}
