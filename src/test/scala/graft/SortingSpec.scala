package graft

import graft.sortbench.Sorting
import org.apache.spark.sql.functions._

/** FIXTURES.md §2.5: permutation/order invariants for the sort surface +
  * the reference's multi-key encoding and top-N semantics. */
class SortingSpec extends SparkSpec {
  import spark.implicits._

  test("all 12 registered algorithms produce identical sorted output") {
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(200)(rnd.nextDouble() * 1100 - 100).toDF("x")
    val expected = data.orderBy("x").as[Double].collect().toSeq
    Sorting.Algorithms.foreach { alg =>
      val got = Sorting.runSort(data, alg, col("x")).as[Double].collect().toSeq
      assert(got == expected, s"algorithm $alg diverged")
    }
    assert(expected == expected.sorted)
  }

  test("sort is a permutation that orders (property, 20 seeded cases)") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(rnd.nextInt(300) + 1)(rnd.nextDouble() * 2e6 - 1e6)
      val got = Sorting.runSort(xs.toDF("x"), "quicksort", col("x"))
        .as[Double].collect().toSeq
      assert(got.sorted == got, s"seed $seed not ordered")
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        xs.groupBy(identity).view.mapValues(_.size).toMap, s"seed $seed not a permutation")
    }
  }

  test("multi-key int encoding preserves (date asc, close asc) within a year") {
    val df = Seq(
      ("2024-01-02", 10.50), ("2024-01-02", 10.49), ("2024-03-31", 99.99),
      ("2024-02-01", 0.01), ("2024-01-02", 10.51))
      .toDF("d", "close")
      .withColumn("date", to_date(col("d")))
    val byKey = df.withColumn("k", Sorting.multiKeyDateClose(col("date"), col("close")))
      .orderBy("k").select("d", "close").as[(String, Double)].collect().toSeq
    val byCols = df.orderBy(col("date"), col("close"))
      .select("d", "close").as[(String, Double)].collect().toSeq
    assert(byKey == byCols)
    // the reference's exact encoding: (y-2000)*366 + (m-1)*31 + d, *1e5 + cents
    val k = df.filter(col("d") === "2024-01-02")
      .withColumn("k", Sorting.multiKeyDateClose(col("date"), col("close")))
      .orderBy("close").select("k").as[Long].head()
    assert(k == ((24 * 366 + 0 * 31 + 2).toLong * 100000L + 1049L))
  }

  test("encoding reproduces the reference's year-boundary quirk (bit parity)") {
    // (m-1)*31+d reaches 372 > 366: Dec 31 encodes ABOVE Jan 2 of the
    // next year in the reference (main.py:163-167) — we replicate, not fix.
    val df = Seq(("2023-12-31", 1.0), ("2024-01-02", 1.0)).toDF("d", "close")
      .withColumn("date", to_date(col("d")))
      .withColumn("k", Sorting.multiKeyDateClose(col("date"), col("close")))
    val ks = df.orderBy("d").select("k").as[Long].collect()
    assert(ks(0) > ks(1))
  }

  test("topN keeps the N largest, returned ascending (reference top-15)") {
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("volume", "name")
    val got = Sorting.topNBy(df, 15, col("volume")).as[(Long, String)].collect()
    assert(got.map(_._1).toSeq == (86L to 100L))
  }

  test("benchmark harness verifies cross-algorithm consistency") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(100)(rnd.nextInt(1000)).toDF("x")
    val report = Sorting.benchmark(data, col("x"))
      .select("algorithm", "verified").as[(String, Boolean)].collect()
    assert(report.length == 12)
    assert(report.forall(_._2), "some algorithm failed the N-version oracle")
  }
}
