package graft

import graft.ta.Technical
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Reference fixture: algorithms/technical.py:254-276 (FIXTURES.md §2.4). */
class TechnicalSpec extends SparkSpec {
  import spark.implicits._

  private val prices = Seq(100.0, 102.0, 101.0, 105.0, 103.0, 107.0, 110.0, 108.0)
  private def df = prices.zipWithIndex
    .map { case (p, i) => (i, "X", p) }.toDF("i", "symbol", "close")
  private val keys = Seq("symbol")
  private val order = Seq(col("i"))

  test("mean and sample stddev match the reference fixture") {
    val Row(mean: Double, std: Double) =
      Technical.meanStd(df, "close", keys).select("mean", "std").head()
    assert(approx(mean, 104.5))
    assert(approx(std, math.sqrt(90.0 / 7.0)))
  }

  test("log returns (strict) match ln(p_i/p_{i-1})") {
    val got = df.withColumn("r", Technical.logReturnStrict($"close", keys, order))
      .orderBy("i").select("r").as[Option[Double]].collect()
    assert(got.head.isEmpty) // no predecessor
    val exp = prices.sliding(2).map { case Seq(a, b) => math.log(b / a) }.toSeq
    got.tail.map(_.get).zip(exp).foreach { case (g, e) => assert(approx(g, e)) }
  }

  test("log returns zero-variant emits 0.0 on non-positive pairs") {
    val bad = Seq((0, "X", 10.0), (1, "X", 0.0), (2, "X", 5.0), (3, "X", 10.0))
      .toDF("i", "symbol", "close")
    val got = bad.withColumn("r", Technical.logReturnZero($"close", keys, order))
      .orderBy("i").select("r").as[Option[Double]].collect()
    assert(got(0).isEmpty)          // no predecessor
    assert(got(1).contains(0.0))    // 0/10 pair invalid -> 0.0
    assert(got(2).contains(0.0))    // 5/0 pair invalid -> 0.0
    assert(approx(got(3).get, math.log(2.0)))
  }

  test("simple returns match (p_i - p_prev)/p_prev with 0.0 on zero denom") {
    val got = df.withColumn("r", Technical.simpleReturn($"close", keys, order))
      .orderBy("i").select("r").as[Option[Double]].collect()
    assert(got.head.isEmpty)
    val exp = prices.sliding(2).map { case Seq(a, b) => (b - a) / a }.toSeq
    got.tail.map(_.get).zip(exp).foreach { case (g, e) => assert(approx(g, e)) }
    val z = Seq((0, "X", 0.0), (1, "X", 5.0)).toDF("i", "symbol", "close")
      .withColumn("r", Technical.simpleReturn($"close", keys, order))
      .orderBy("i").select("r").as[Option[Double]].collect()
    assert(z(1).contains(0.0))
  }

  test("SMA(3) yields n-w+1 values aligned with null warm-up (W3+W9)") {
    val got = df.withColumn("s", Technical.sma($"close", 3, keys, order))
      .orderBy("i").select("s").as[Option[Double]].collect()
    assert(got.take(2).forall(_.isEmpty))
    val exp = prices.sliding(3).map(w => w.sum / 3).toSeq
    assert(got.drop(2).length == exp.length) // n-w+1 = 6
    got.drop(2).map(_.get).zip(exp).foreach { case (g, e) => assert(approx(g, e)) }
    val sma5 = df.withColumn("s", Technical.sma($"close", 5, keys, order))
      .orderBy("i").select("s").as[Option[Double]].collect()
    assert(sma5.count(_.isDefined) == prices.length - 5 + 1)
  }
}
