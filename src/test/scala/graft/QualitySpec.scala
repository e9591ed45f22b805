package graft

import graft.sketch.Sketches
import graft.text.QualitySignals
import org.apache.spark.sql.functions._

/** Corpus-hygiene signals (text.QualitySignals) + KMV sketch (sketch.Sketches). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("KMV Aggregator: partition-invariant, exact below k, matches the global sketch") {
    import org.apache.spark.sql.functions.{col, udaf}
    val kmv = udaf(new graft.sketch.Sketches.KmvDistinct(16))
    val df = (1L to 500L).map(i => ("g" + (i % 3), i)).toDF("g", "v")
      .select(col("g"), graft.sketch.Sketches.hash60(col("v")).as("h"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(kmv(col("h")).as("est")).orderBy("g")
        .as[(String, Double)].collect().toSeq
    val base = run(df)
    // deterministic under any partitioning: reduce/merge are order-invariant
    assert(run(df.repartition(13)) == base)
    assert(run(df.repartition(1)) == base)
    assert(run(df.orderBy(col("h").desc)) == base)
    // a group with fewer than k distinct hashes is counted exactly
    val tiny = Seq(("a", 1L), ("a", 2L), ("a", 1L), ("b", 9L)).toDF("g", "v")
      .select(col("g"), graft.sketch.Sketches.hash60(col("v")).as("h"))
    assert(run(tiny) == Seq(("a", 2.0), ("b", 1.0)))
  }

  test("repetition: distinct text scores low, repeated text scores high") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "ok"),
      (4L, ""),
    ).toDF("doc_id", "text")
    val got = QualitySignals.repetition(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_words", "dup_word_ratio", "top_bigram_ratio", "repetitive")
      .as[(Long, Double, Double, Boolean)].collect()

    val (n1, dwr1, tbr1, rep1) = got(0)
    assert(n1 == 9 && approx(dwr1, 1.0 - 8.0 / 9, 1e-6) && !rep1)
    assert(approx(tbr1, 1.0 / 8, 1e-6)) // 8 bigrams, all distinct

    val (n2, dwr2, tbr2, rep2) = got(1)
    assert(n2 == 8 && approx(dwr2, 1.0 - 1.0 / 8, 1e-6))
    assert(approx(tbr2, 1.0, 1e-6) && rep2) // single bigram repeated

    val (n3, dwr3, tbr3, rep3) = got(2)
    assert(n3 == 1 && dwr3 == 0.0 && tbr3 == 0.0 && !rep3)

    val (n4, dwr4, _, rep4) = got(3)
    assert(n4 == 0 && dwr4 == 0.0 && !rep4)
  }

  test("redactPii counts and strips emails + phones") {
    val docs = Seq(
      (1L, "reach me at jo.doe+spam@mail.example.org or +44-207-9460000 thanks"),
      (2L, "no pii here"),
    ).toDF("doc_id", "text")
    val got = QualitySignals.redactPii(docs, "text")
      .orderBy("doc_id")
      .select("n_emails", "n_phones", "redacted")
      .as[(Long, Long, String)].collect()
    assert(got(0) == ((1L, 1L, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(got(1) == ((0L, 0L, "no pii here")))
  }

  test("kmv: exact when distinct < k, within 30% when distinct >> k") {
    val small = (1 to 10).map(i => i % 5).toDF("x")
    val (kS, estS) = Sketches.kmvEstimate(small, col("x"), 64)
      .as[(Long, Double)].head()
    assert(kS == 64 && estS == 5.0)

    val big = (1 to 20000).map(_ % 4000).toDF("x").repartition(8)
    val (_, estB) = Sketches.kmvEstimate(big, col("x"), 64)
      .as[(Long, Double)].head()
    assert(math.abs(estB - 4000) / 4000.0 < 0.3, s"est $estB too far from 4000")
  }

  test("kmv estimate is invariant to partitioning and duplication") {
    val a = (1 to 5000).map(_ % 1000).toDF("x")
    val e1 = Sketches.kmvEstimate(a.repartition(2), col("x"), 32).as[(Long, Double)].head()._2
    val e2 = Sketches.kmvEstimate(a.repartition(13), col("x"), 32).as[(Long, Double)].head()._2
    val e3 = Sketches.kmvEstimate(a.union(a), col("x"), 32).as[(Long, Double)].head()._2
    assert(e1 == e2 && e2 == e3)
  }

  test("count-min: estimates are >= exact, exact at generous width, partition-invariant") {
    // zipf-ish key mix: key k appears k times (1..60)
    val data = (1 to 60).flatMap(k => Seq.fill(k)(s"key$k")).toDF("x")
    val exact = data.groupBy("x").count().as[(String, Long)].collect().toMap
    def estimates(df: org.apache.spark.sql.DataFrame, depth: Int, width: Int) = {
      val cells = Sketches.countMinCells(df, col("x"), depth, width)
      Sketches.countMinEstimate(cells,
          df.select(col("x").as("key")).distinct(), depth, width)
        .as[(String, Long)].collect().toMap
    }
    val est = estimates(data, 4, 1024)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never underestimate: $k est ${est(k)} < $n")
    }
    // with width >> distinct keys and 4 rows, collisions are essentially
    // impossible on 60 keys: every estimate is exact
    assert(est == exact)
    // cell build is a sum over occurrences -> partition-invariant
    val est13 = estimates(data.repartition(13), 4, 1024)
    assert(est13 == est)
    // a tiny sketch must still satisfy the >= guarantee under collisions
    val tiny = estimates(data, 2, 8)
    exact.foreach { case (k, n) => assert(tiny(k) >= n) }
  }

  test("hll: registers are duplication/partition-invariant; estimate tracks cardinality") {
    val a = (1 to 20000).map(_ % 5000).toDF("x")
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllEstimate(df, col("x"), 8)
        .select("est").as[Double].head()
    val e1 = est(a.repartition(2))
    val e2 = est(a.repartition(13))
    val e3 = est(a.union(a)) // max-merge: duplicates can't move a register
    assert(e1 == e2 && e2 == e3)
    // 256 registers -> ~1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
    assert(math.abs(e1 - 5000) / 5000.0 < 0.2, s"est $e1 too far from 5000")
  }

  test("hll: small cardinalities take the linear-counting branch and stay tight") {
    val small = (1 to 1000).map(_ % 40).toDF("x")
    val row = Sketches.hllEstimate(small, col("x"), 8)
      .select("m", "zeros", "est").as[(Long, Long, Double)].head()
    val (m, zeros, e) = row
    assert(m == 256 && zeros > 0)
    // linear counting with 40 distinct over 256 buckets is near-exact
    assert(math.abs(e - 40) / 40.0 < 0.15, s"est $e too far from 40")
  }
}
