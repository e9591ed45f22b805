package graft

import org.apache.spark.sql.functions._

/** Pins Spark's exact-percentile interpolation chain so the DuckDB
  * oracles can replicate it bit-identically.
  *
  * The sf1-jitter gate caught `c12_winsorize` flipping `clipped` on 6
  * rows: DuckDB's `quantile_cont` evaluates (1−f)·a + f·b, which is NOT
  * exactly `a` when the two neighbors tie (0.95 × 3.0399999999999996 +
  * 0.05 × 3.0399999999999996 = 3.04), while Spark's `percentile`
  * evaluates a + (b−a)·f, which IS. A raw data value equal to one
  * engine's bound then compares differently. The oracle fix is explicit
  * a + (b−a)·f interpolation in SQL; THIS spec is the contract that the
  * Spark side actually computes that chain (position p·(n−1), frac from
  * floor, fold a + (b−a)·f) — if a Spark upgrade ever changes the
  * formula, this fails before any oracle does. */
class PercentileParitySpec extends SparkSpec {
  import spark.implicits._

  private def sparkPercentile(vals: Seq[Double], p: Double): Double =
    vals.toDF("v").agg(expr(s"percentile(v, $p)")).as[Double].head()

  /** Spark's exact chain (Percentile.getPercentile): position p·(n−1);
    * the value itself when the position lands inside one value's count
    * range (ties short-circuit — this is what DuckDB's (1−f)a+fb
    * re-rounds); otherwise (higher−pos)·a + (pos−lower)·b, multiplies
    * on the RAW pos, not a precomputed frac. */
  private def chain(vals: Seq[Double], p: Double): Double = {
    val sorted = vals.sorted
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val a = sorted(lo)
    if (pos == lo) a
    else {
      val b = sorted(lo + 1)
      if (a == b) a else (lo + 1 - pos) * a + (pos - lo) * b
    }
  }

  test("percentile = (hi-pos)*a + (pos-lo)*b with tie short-circuit, bit-exact") {
    // the jitter-gate repro: tied neighbors at an fp-noisy value —
    // a + (b-a)*f must return exactly a, never the re-rounded 3.04
    // 62 values -> pos = 0.05*61 = 3.05, between sorted indexes 3 and 4,
    // which hold the tied fp-noisy value
    val tied = Seq(1.07, 2.8699999999999997, 2.88, 3.0399999999999996,
      3.0399999999999996, 4.18) ++
      (5 to 60).map(_ * 2.37)
    val gotTied = sparkPercentile(tied, 0.05)
    assert(gotTied == chain(tied, 0.05),
      s"tied: spark=$gotTied chain=${chain(tied, 0.05)}")
    assert(gotTied == 3.0399999999999996) // NOT 3.04

    // non-tied neighbors across awkward fractions and sizes
    for (seed <- 1 to 5; n <- Seq(17, 62, 101)) {
      val rnd = new scala.util.Random(seed)
      val vals = Seq.fill(n)(math.floor(rnd.nextDouble() * 10000) / 100 + 0.01)
      for (p <- Seq(0.05, 0.25, 0.33, 0.5, 0.66, 0.75, 0.95)) {
        val got = sparkPercentile(vals, p)
        val exp = chain(vals, p)
        assert(got == exp, s"seed=$seed n=$n p=$p: spark=$got chain=$exp diff=${got - exp}")
      }
    }
  }
}
