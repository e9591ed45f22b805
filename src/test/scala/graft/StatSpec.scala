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

  test("w14 CUSUM: a zero close resets the sums instead of latching Infinity") {
    // sf0.1 user 367 closes at 0.00 — raw IEEE division would drive
    // sp to +Infinity and hold the alarm true for the rest of the
    // series (caught by the sf1 replica oracle gate). Contract: the
    // day AFTER a zero close has an undefined return and resets both
    // sums to 0 (the oracle's NULL-division semantic).
    val tmp = java.nio.file.Files.createTempDirectory("w14zero")
    try {
      // one tick per day: closes 10, 0, 5, 5
      Seq((1L, 1L, 10.0), (2L, 2L, 0.0), (3L, 3L, 5.0), (4L, 4L, 5.0))
        .toDF("event_id", "dayIdx", "value")
        .withColumn("user_id", lit(1L))
        .withColumn("ts", // epoch-ns within the loader's accepted band
          (lit(1704067200L) + col("dayIdx") * 86400L) * 1000000000L)
        .drop("dayIdx")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = StatQueries.w14Cusum(spark, tmp.toString)
        .select("day", "cusum_pos", "cusum_neg", "alarm")
        .as[(java.sql.Date, Double, Double, Boolean)].collect()
        .sortBy(_._1.toString)
      assert(got.length == 3)
      // day2: ret = 0/10-1 = -1 -> sn = 0.9995, alarm
      assert(got(0)._2 == 0.0 && got(0)._3 == 0.9995 && got(0)._4)
      // day3: prev close 0 -> reset, no alarm, and NO Infinity anywhere
      assert(got(1)._2 == 0.0 && got(1)._3 == 0.0 && !got(1)._4)
      // day4: ret = 0 -> both sums floor at 0
      assert(got(2)._2 == 0.0 && got(2)._3 == 0.0 && !got(2)._4)
      assert(got.forall(r => !r._2.isInfinite && !r._3.isInfinite))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
