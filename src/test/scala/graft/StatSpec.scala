package graft

import graft.operators.StatQueries
import org.apache.spark.sql.functions._

/** Invariants for the statistical-monitoring family (f7, e6, w13, x8).
  * Value-level checks live in the DuckDB oracle. */
class StatSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("f7 A/B lift: arms partition the users, rates match counts, z sign follows lift") {
    val r = StatQueries.f7AbLift(spark, dir)
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b", "lift", "z_score")
      .as[(Long, Long, Long, Long, Double, Double, Double, Option[Double])].head()
    val (na, nb, ca, cb, ra, rb, lift, z) = r
    val total = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(na + nb == total, s"arms must partition users: $na+$nb vs $total")
    assert(ca <= na && cb <= nb)
    assert(approx(ra, math.floor(ca.toDouble / na * 1e6 + 0.5) / 1e6, 1e-9))
    assert(approx(rb, math.floor(cb.toDouble / nb * 1e6 + 0.5) / 1e6, 1e-9))
    z.foreach(zv => assert(zv == 0.0 || zv.sign == lift.sign || lift == 0.0,
      s"z $zv disagrees with lift $lift"))
  }

  test("e6 PSI: fixed 10-row spine, shares sum to 1, drift statistic is finite") {
    val rows = StatQueries.e6PsiDrift(spark, dir)
      .select("bucket", "ref_share", "cur_share", "psi_contrib")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L to 9L), "spine must always emit 10 buckets")
    // smoothed shares sum to 1 up to the display grid
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    val psi = rows.map(_._4).sum
    assert(psi >= -1e-9 && psi.isFinite, s"PSI $psi") // each contrib (p-q)ln(p/q) >= 0
  }

  test("w13 c4Digits: hi4*1e9 + lo4 equals exact c^4 over the full |c| <= 7e5 domain") {
    // includes the old decomposition's overflow region (|c| > ~309,900,
    // where (c2 div 1000) * c2 exceeded Long.MaxValue) and both signs
    val cs = Seq(0L, 1L, 999L, 1000L, 56021L, 309900L, 309901L, 310000L,
      500000L, 699999L, 700000L, -56021L, -310000L, -700000L)
    val got = StatQueries.c4Digits(
        cs.toDF("c").withColumn("c2", col("c") * col("c")))
      .select("c", "hi4", "lo4").as[(Long, Long, Long)].collect()
    got.foreach { case (c, hi, lo) =>
      val exact = BigInt(c).pow(4)
      assert(BigInt(hi) * BigInt(1000000000L) + BigInt(lo) == exact,
        s"c=$c: hi=$hi lo=$lo vs $exact")
      assert(lo >= 0 && lo < 1000000000L, s"c=$c lo out of digit range: $lo")
    }
  }

  test("w13 rolling moments: warm-up nulls, then finite values on every row") {
    val rows = StatQueries.w13RollingMoments(spark, dir)
      .select("user_id", "skew", "kurtosis")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(rows.nonEmpty)
    val defined = rows.filter(_._2.isDefined)
    assert(defined.nonEmpty, "no post-warm-up rows")
    defined.foreach { case (_, s, k) =>
      assert(s.get.isFinite && k.get.isFinite)
      // sample excess kurtosis over 21 points is bounded below by ~ -3
      assert(k.get >= -3.0 - 1e-6, s"kurtosis ${k.get} below admissible floor")
    }
    // a window over 21 equal values is degenerate -> null, never NaN
    assert(rows.forall(r => r._2.isDefined == r._3.isDefined))
  }

  test("x8 SAX motifs: words are 4 symbols over {a,b,c,d}, counts >= 2, capped at 50") {
    val rows = StatQueries.x8SaxMotifs(spark, dir)
      .select("word", "n_occ").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { case (w, n) =>
      assert(w.length == 4 && w.forall("abcd".contains(_)), s"bad word $w")
      assert(n >= 2)
    }
  }
}
